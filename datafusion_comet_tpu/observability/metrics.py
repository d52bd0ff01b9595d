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

    def render(self, indent: int = 0) -> str:
        rows = f" rows={self.output_rows}" if self.output_rows is not None else ""
        t = f" time={self.elapsed_ms:.1f}ms" if self.elapsed_ms is not None else ""
        lines = ["  " * indent + f"{self.op}[{self.detail}]{rows}{t}"]
        for c in self.children:
            lines.append(c.render(indent + 1))
        return "\n".join(lines)


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

    def record(self, plan: P.PlanNode, batch) -> None:
        self.names.append(id(plan))
        self.counts.append(batch.num_rows().astype(jnp.int64))

    def fill(self, tree: MetricsNode, plan: P.PlanNode, resolved: Dict[int, int]) -> None:
        if id(plan) in resolved:
            tree.output_rows = resolved[id(plan)]
        for sub, child in zip(tree.children, plan.children()):
            self.fill(sub, child, resolved)
