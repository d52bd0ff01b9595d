"""Per-operator metrics tree (the CometMetricNode / DataFusion metrics analog).

Reference contract: a metric tree mirroring the plan is built driver-side
(CometMetricNode.scala:20) and the native engine pushes values into it
(metrics/utils.rs:30). Here operators are fused into one XLA program, so
row-count metrics are collected as extra device outputs of the same compiled
step (zero extra passes — XLA dedups the reductions), and wall-clock splits
come from host-side trace spans.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from datafusion_comet_tpu.ir import plan as P

__all__ = ["MetricsNode", "MetricsCollector", "build_metrics_tree"]


@dataclasses.dataclass
class MetricsNode:
    """One plan operator's metrics: static identity + filled-in values."""

    op: str
    detail: str
    children: List["MetricsNode"]
    output_rows: Optional[int] = None
    elapsed_ms: Optional[float] = None
    output_bytes: Optional[int] = None  # static HBM footprint of the output
    capacity: Optional[int] = None      # static row capacity of the output

    ROOFLINE_GBPS = {"tpu": 819.0, "cpu": 50.0}

    @property
    def bytes_touched(self) -> Optional[int]:
        """Bytes-touched estimate for THIS operator: read every child's
        output + write own output (the roofline numerator; scans read what
        they emit)."""
        if self.output_bytes is None:
            return None
        total = self.output_bytes
        for c in self.children:
            if c.output_bytes is not None:
                total += c.output_bytes
        return total

    def roofline(self, roof_gbps: Optional[float] = None):
        """(gb_per_s, pct_of_roofline) from the marginal elapsed time and
        the bytes-touched estimate; None without profile_ops timings."""
        if roof_gbps is None:
            import jax

            roof_gbps = self.ROOFLINE_GBPS.get(jax.default_backend(), 819.0)
        bt = self.bytes_touched
        if bt is None or not self.elapsed_ms:
            return None
        gbps = bt / (self.elapsed_ms * 1e-3) / 1e9
        return round(gbps, 2), round(100.0 * gbps / roof_gbps, 2)

    def render(self, indent: int = 0) -> str:
        rows = f" rows={self.output_rows}" if self.output_rows is not None else ""
        t = f" time={self.elapsed_ms:.1f}ms" if self.elapsed_ms is not None else ""
        by = f" bytes={_human_bytes(self.output_bytes)}" if self.output_bytes is not None else ""
        cap = f" cap={self.capacity}" if self.capacity is not None else ""
        rl = self.roofline()
        rls = f" {rl[0]}GB/s({rl[1]}%roof)" if rl else ""
        lines = ["  " * indent + f"{self.op}[{self.detail}]{rows}{cap}{by}{t}{rls}"]
        for c in self.children:
            lines.append(c.render(indent + 1))
        return "\n".join(lines)

    def to_dict(self) -> dict:
        d = {"op": self.op, "detail": self.detail}
        for k in ("output_rows", "elapsed_ms", "output_bytes", "capacity"):
            v = getattr(self, k)
            if v is not None:
                d[k] = round(v, 3) if isinstance(v, float) else v
        rl = self.roofline()
        if rl:
            d["gb_per_s"], d["pct_roofline"] = rl
        if self.children:
            d["children"] = [c.to_dict() for c in self.children]
        return d

    def top_sinks(self, k: int = 3) -> List["MetricsNode"]:
        """The k slowest operators by marginal elapsed time (the bandwidth
        sinks a tuning pass should attack first)."""
        flat: List[MetricsNode] = []

        def walk(n: "MetricsNode"):
            flat.append(n)
            for c in n.children:
                walk(c)

        walk(self)
        return sorted([n for n in flat if n.elapsed_ms],
                      key=lambda n: -n.elapsed_ms)[:k]


def _human_bytes(n: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if n < 1024 or unit == "GiB":
            return f"{n:.1f}{unit}" if unit != "B" else f"{n}B"
        n /= 1024
    return f"{n}B"


def batch_static_bytes(batch) -> int:
    """Static (trace-time) HBM footprint of a batch: every array's
    shape×itemsize is known even on tracers — no device work."""
    import numpy as _np

    def arr_bytes(a) -> int:
        if a is None:
            return 0
        return int(_np.prod(a.shape)) * _np.dtype(a.dtype).itemsize

    def cv_bytes(cv) -> int:
        n = arr_bytes(cv.data) + arr_bytes(cv.validity) + arr_bytes(cv.lengths)
        return n + sum(cv_bytes(c) for c in cv.children)

    return arr_bytes(batch.row_mask) + sum(cv_bytes(c) for c in batch.columns)


def _detail(plan: P.PlanNode) -> str:
    if isinstance(plan, P.Scan):
        return plan.table
    if isinstance(plan, P.Filter):
        return repr(plan.predicate)[:60]
    if isinstance(plan, P.HashAggregate):
        return f"mode={plan.mode} groups<={plan.max_groups}"
    if isinstance(plan, (P.HashJoin, P.SortMergeJoin)):
        return plan.join_type
    if isinstance(plan, P.ShuffleExchange):
        return plan.partitioning
    return ""


def build_metrics_tree(plan: P.PlanNode) -> MetricsNode:
    return MetricsNode(
        op=type(plan).__name__,
        detail=_detail(plan),
        children=[build_metrics_tree(c) for c in plan.children()],
    )


class MetricsCollector:
    """Collects per-operator output row counts during traced execution.

    Used by the engine in metrics mode: each operator appends
    ``record(plan_node, batch)``; the counts come back as device arrays in
    the same jitted step and are filled into the MetricsNode tree after the
    run (the push model of metrics/utils.rs:30, minus the JNI)."""

    def __init__(self):
        self.names: List[int] = []  # id(plan) per recorded operator
        self.counts: List[jax.Array] = []
        self.static: Dict[int, tuple] = {}  # id(plan) -> (capacity, bytes)

    def record(self, plan: P.PlanNode, batch) -> None:
        self.names.append(id(plan))
        self.counts.append(batch.num_rows().astype(jnp.int64))
        self.static[id(plan)] = (batch.capacity, batch_static_bytes(batch))

    def fill(self, tree: MetricsNode, plan: P.PlanNode, resolved: Dict[int, int]) -> None:
        if id(plan) in resolved:
            tree.output_rows = resolved[id(plan)]
        if id(plan) in self.static:
            tree.capacity, tree.output_bytes = self.static[id(plan)]
        for sub, child in zip(tree.children, plan.children()):
            self.fill(sub, child, resolved)
