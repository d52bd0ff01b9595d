"""Tiled (streaming) execution: aggregate pipelines over out-of-HBM inputs.

The analog of the reference's pipelined batch pull (8192-row batches through
DataFusion streams, jni_api.rs:892 busy-poll loop) for inputs larger than
HBM: the scan side is split into fixed-capacity tiles; the
filter→project→Partial-aggregate pipeline is compiled ONCE and re-run per
tile; partial states accumulate on device and are folded by a PartialMerge
step whenever the accumulator fills (the two-phase contract of
operator.proto:480 reused sequentially instead of across a mesh); a Final
step finishes. Double buffering comes from jax's async dispatch: tile N+1's
host→device transfer overlaps tile N's compute.

Supported plan shape: HashAggregate(SINGLE) over any row-preserving pipeline
(filter/project/expand/sample) over one Scan — the scan-heavy memory-bound
shape. Joins/sorts over oversized inputs use the distributed path or host
spill (round 2).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import Batch, from_numpy
from datafusion_comet_tpu.exec.engine import run_plan
from datafusion_comet_tpu.exec.evaluator import EvalContext
from datafusion_comet_tpu.exec.operators import aggregate as AGG
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P

__all__ = ["execute_tiled_aggregate", "numpy_tiles"]


def numpy_tiles(data: Dict[str, np.ndarray], schema: T.Schema, tile_rows: int):
    """Split host columns into fixed-capacity device tiles (generator)."""
    n = len(next(iter(data.values())))
    from datafusion_comet_tpu.exec.batch import pad_capacity

    cap = pad_capacity(min(tile_rows, max(n, 1)))
    # compute decimal magnitude bounds over the FULL column so every tile
    # carries the same bound: per-tile bounds would retrace the partial
    # program and could flip state storage between tiles
    import dataclasses

    from datafusion_comet_tpu.exec.batch import quantize_bound

    global_bound = {}
    for f in schema.fields:
        if f.dtype.is_decimal and f.name in data:
            mx = 0
            for x in data[f.name]:
                if x is not None:
                    mx = max(mx, abs(int(x)))
            global_bound[f.name] = quantize_bound(mx)
    for lo in range(0, max(n, 1), tile_rows):
        hi = min(lo + tile_rows, n)
        chunk = {k: v[lo:hi] for k, v in data.items()}
        # per-chunk staging must not dictionary-encode: each chunk would get
        # its OWN dict and codes from different chunks are incomparable
        b = from_numpy(chunk, schema, capacity=cap, dictionary=False)
        if global_bound:
            cols = tuple(
                dataclasses.replace(c, mag_bound=global_bound[f.name])
                if f.name in global_bound and not c.is_wide_storage
                else c
                for f, c in zip(schema.fields, b.columns)
            )
            b = Batch(cols, b.row_mask, b.schema)
        yield b


def _split_agg(plan: P.PlanNode):
    """Find the top HashAggregate(SINGLE); return (above fn nodes, agg,
    pipeline below)."""
    if not isinstance(plan, P.HashAggregate) or plan.mode != P.AggMode.SINGLE:
        raise NotImplementedError(
            "tiled execution currently requires a HashAggregate(SINGLE) root"
        )
    return plan


def execute_tiled_aggregate(
    plan: P.PlanNode,
    tiles: Iterator[Batch],
    table: str,
    merge_every: int = 8,
) -> Batch:
    """Run ``plan`` (HashAggregate root over one Scan of ``table``) over a
    stream of input tiles. Returns the final aggregated batch."""
    bound = P.bind_plan(plan) if plan.schema is None else plan
    agg = _split_agg(bound)

    # partial stage over one tile (jitted once; same shapes each tile)
    partial = P.HashAggregate(
        agg.child, agg.group_exprs, agg.agg_exprs, P.AggMode.PARTIAL, agg.max_groups
    )
    partial.schema = _partial_schema(agg)

    @jax.jit
    def run_partial(tile: Batch) -> Batch:
        return run_plan(partial, {table: tile}, EvalContext())

    merge_groups = tuple(
        E.bind(E.col(g.name), partial.schema) for g in agg.group_exprs
    )

    @jax.jit
    def run_merge(acc: Batch) -> Batch:
        node = P.HashAggregate(
            _pseudo_scan("__acc", acc.schema),
            merge_groups,
            agg.agg_exprs,
            P.AggMode.PARTIAL_MERGE,
            agg.max_groups,
        )
        node.schema = partial.schema
        return run_plan(node, {"__acc": acc}, EvalContext())

    @jax.jit
    def run_final(acc: Batch) -> Batch:
        node = P.HashAggregate(
            _pseudo_scan("__acc", acc.schema),
            merge_groups,
            agg.agg_exprs,
            P.AggMode.FINAL,
            agg.max_groups,
        )
        node.schema = agg.schema
        return run_plan(node, {"__acc": acc}, EvalContext())

    acc: Optional[Batch] = None
    pending = 0
    for tile in tiles:
        part = run_partial(tile)
        acc = part if acc is None else _concat(acc, part)
        pending += 1
        if pending >= merge_every:
            acc = run_merge(acc)
            pending = 1
    if acc is None:
        raise ValueError("no input tiles")
    return run_final(acc)


def _pseudo_scan(name: str, schema: T.Schema) -> P.Scan:
    sc = P.Scan(name, schema)
    sc.schema = schema
    return sc


def _partial_schema(agg: P.HashAggregate) -> T.Schema:
    fields = [T.Field(g.name, g.dtype) for g in agg.group_exprs]
    for a in agg.agg_exprs:
        fields += AGG.state_fields(a)
    return T.Schema(fields)


def _concat(a: Batch, b: Batch) -> Batch:
    from datafusion_comet_tpu.exec.batch import ColumnVector

    cols = []
    for ca, cb, f in zip(a.columns, b.columns, a.schema.fields):
        if f.dtype.is_decimal and (ca.is_wide_storage or cb.is_wide_storage):
            # unify mixed decimal storage (e.g. a grown accumulator vs a
            # fresh narrow tile state) to two-limb before concatenating
            from datafusion_comet_tpu.exec import decimal_wide as DW

            ca, cb = DW.widen_cv(ca), DW.widen_cv(cb)
        da, db = ca.data, cb.data
        if f.dtype.is_binary and da.shape[1] != db.shape[1]:
            w = max(da.shape[1], db.shape[1])
            da = jnp.pad(da, ((0, 0), (0, w - da.shape[1])))
            db = jnp.pad(db, ((0, 0), (0, w - db.shape[1])))
        bound = None
        if ca.mag_bound is not None and cb.mag_bound is not None:
            bound = max(ca.mag_bound, cb.mag_bound)
        cols.append(
            ColumnVector(
                jnp.concatenate([da, db], axis=0),
                jnp.concatenate([ca.validity, cb.validity]),
                None if ca.lengths is None else jnp.concatenate([ca.lengths, cb.lengths]),
                f.dtype,
                mag_bound=bound,
            )
        )
    return Batch(tuple(cols), jnp.concatenate([a.row_mask, b.row_mask]), a.schema)
