"""HBM budget accounting + tiling planner.

The analog of the reference's memory pools (native/core/src/execution/
memory_pools — Greedy/FairSpill reservations bounded by
spark.comet.exec.memoryPool.fraction). On TPU the unit of accounting is the
static batch: bytes are fully determined by (schema, capacity), so the
planner can compute a query's resident footprint BEFORE compiling and choose
a tile count that fits the HBM budget — reservation-by-construction instead
of runtime accounting, with host spill (io/spill.py) as the overflow path.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.conf import CONF, MEMORY_FRACTION
from datafusion_comet_tpu.ir import plan as P

__all__ = ["batch_bytes", "plan_peak_bytes", "device_budget_bytes", "plan_tiles"]


def batch_bytes(schema: T.Schema, capacity: int) -> int:
    """Exact device bytes of one batch at a given capacity."""
    total = capacity  # row mask (bool)
    for f in schema.fields:
        if f.dtype.is_binary:
            total += capacity * f.dtype.byte_width  # data matrix
            total += capacity * 4  # lengths
        else:
            total += capacity * f.dtype.np_dtype().itemsize
        total += capacity  # validity
    return total


def plan_peak_bytes(plan: P.PlanNode, capacity: int) -> int:
    """Upper bound on resident bytes while executing ``plan`` over inputs of
    ``capacity`` rows: sum of every operator's output batch (XLA may free
    earlier, so this is conservative)."""
    total = 0
    for node in _walk(plan):
        cap = capacity
        if isinstance(node, P.HashAggregate):
            cap = min(node.max_groups or (1 << 16), capacity)
        if isinstance(node, P.Expand):
            cap = capacity * len(node.projections)
        if isinstance(node, (P.HashJoin, P.SortMergeJoin)):
            cap = capacity * 4  # default fan-out
        schema = node.schema
        if schema is None:
            continue
        total += batch_bytes(schema, cap)
    return total


def _walk(plan):
    yield plan
    for c in plan.children():
        yield from _walk(c)


def device_budget_bytes(device: Optional[jax.Device] = None) -> int:
    """Usable HBM per device (memory fraction applied)."""
    dev = device or jax.devices()[0]
    stats = {}
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        pass
    limit = stats.get("bytes_limit")
    if not limit:
        limit = 16 * 1024**3 if dev.platform == "tpu" else 4 * 1024**3
    return int(limit * CONF.get(MEMORY_FRACTION))


def plan_tiles(plan: P.PlanNode, total_rows: int, device=None) -> int:
    """Number of input tiles needed so one tile's pipeline fits the budget."""
    budget = device_budget_bytes(device)
    tiles = 1
    while tiles < 4096:
        cap = -(-total_rows // tiles)
        if plan_peak_bytes(plan, max(cap, 1)) <= budget:
            return tiles
        tiles *= 2
    return tiles
