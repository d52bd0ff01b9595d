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

__all__ = ["execute_tiled_aggregate", "TiledAggregator", "numpy_tiles",
           "prefetch_tiles"]

from datafusion_comet_tpu.conf import register_entry

STREAMING_PREFETCH_DEPTH = register_entry(
    "comet.exec.streaming.prefetchDepth", 2, "exec",
    "Producer/consumer channel depth for tiled streaming: host staging "
    "(numpy slicing, string packing, H2D issue) of tile N+1..N+depth runs "
    "in a worker thread while the device computes tile N — the analog of "
    "the reference's 2-deep channel overlapping native compute with "
    "consumption (jni_api.rs:822-859, 'decreasing to 1 would serialize "
    "production and consumption'). 0 = fully synchronous staging.",
)


def prefetch_tiles(tiles: Iterator[Batch], depth: Optional[int] = None):
    """Wrap a tile iterator in a bounded producer thread (the 2-deep
    producer/consumer channel of the reference, jni_api.rs:822-859): the
    producer stages tiles (host slicing + device_put dispatch) up to
    ``depth`` ahead while the consumer's device step runs. jax dispatch is
    async, so together the H2D transfer of tile N+1 overlaps the compute
    of tile N."""
    from datafusion_comet_tpu.conf import CONF

    if depth is None:
        depth = CONF.get(STREAMING_PREFETCH_DEPTH)
    if depth <= 0:
        yield from tiles
        return
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def produce():
        try:
            for t in tiles:
                q.put(t)
            q.put(_END)
        except BaseException as e:  # surface generator errors to consumer
            q.put(e)

    th = threading.Thread(target=produce, daemon=True)
    th.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
    th.join()


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


class TiledAggregator:
    """Compiled-once tiled aggregate: the partial/merge/final programs jit
    at construction and are reused across every ``run`` call — the
    benchmark/serving path re-executes the whole tiled pipeline per
    repetition without retracing (the budget-rewrite presteps in
    engine.Session._budget_plan hold one of these per rewrite site)."""

    def __init__(self, plan: P.PlanNode, table: str, merge_every: int = 8):
        bound = P.bind_plan(plan) if plan.schema is None else plan
        agg = _split_agg(bound)
        self.table = table
        self.merge_every = merge_every
        self.out_schema = agg.schema

        partial = P.HashAggregate(
            agg.child, agg.group_exprs, agg.agg_exprs, P.AggMode.PARTIAL,
            agg.max_groups
        )
        partial.schema = _partial_schema(agg)
        merge_groups = tuple(
            E.bind(E.col(g.name), partial.schema) for g in agg.group_exprs
        )

        @jax.jit
        def run_partial(tile: Batch) -> Batch:
            return run_plan(partial, {table: tile}, EvalContext())

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

        self._partial, self._merge, self._final = run_partial, run_merge, run_final

    def run(self, tiles: Iterator[Batch]) -> Batch:
        acc: Optional[Batch] = None
        pending = 0
        for tile in prefetch_tiles(tiles):
            part = self._partial(tile)
            acc = part if acc is None else _concat(acc, part)
            pending += 1
            if pending >= self.merge_every:
                acc = self._merge(acc)
                pending = 1
        if acc is None:
            raise ValueError("no input tiles")
        return self._final(acc)


def execute_tiled_aggregate(
    plan: P.PlanNode,
    tiles: Iterator[Batch],
    table: str,
    merge_every: int = 8,
) -> Batch:
    """Run ``plan`` (HashAggregate root over one Scan of ``table``) over a
    stream of input tiles. Returns the final aggregated batch."""
    return TiledAggregator(plan, table, merge_every).run(tiles)


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


# -------------------------------------------------------------------------------------
# Distributed tiled aggregate: exchange ↔ compute overlap (SURVEY §2d item 4)
# -------------------------------------------------------------------------------------


def execute_tiled_aggregate_distributed(
    plan: P.PlanNode,
    tiles: Iterator[Batch],
    table: str,
    mesh=None,
) -> Batch:
    """Tiled aggregate over a device mesh with exchange↔compute overlap.

    Per tile, ONE jitted SPMD step runs: local Partial over the tile shard →
    hash all-to-all of the partial states on the group keys (each group
    lands on its owner device) → PartialMerge into the device-resident
    accumulator (donated; never leaves HBM). Steps are dispatched
    asynchronously, so tile N+1's host staging + dispatch overlap tile N's
    exchange + merge on device — the double-buffered pipeline of the
    reference's 2-deep producer/consumer channel (jni_api.rs:822-859),
    expressed as XLA async dispatch instead of a thread pair.
    """
    import jax
    from jax import shard_map
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as PSpec

    from datafusion_comet_tpu.parallel.executor import run_plan_spmd
    from datafusion_comet_tpu.parallel.mesh import PARTITION_AXIS, make_mesh

    mesh = mesh or make_mesh()
    np_ = mesh.devices.size
    bound = P.bind_plan(plan) if plan.schema is None else plan
    agg = _split_agg(bound)
    partial = P.HashAggregate(
        agg.child, agg.group_exprs, agg.agg_exprs, P.AggMode.PARTIAL, agg.max_groups
    )
    partial.schema = _partial_schema(agg)
    merge_groups = tuple(
        E.bind(E.col(g.name), partial.schema) for g in agg.group_exprs
    )
    keys = merge_groups

    ex = P.ShuffleExchange(partial, "hash", keys, np_)
    ex.schema = partial.schema
    u = P.Union((_pseudo_scan("__acc", partial.schema), ex))
    u.schema = partial.schema
    merge_node = P.HashAggregate(u, merge_groups, agg.agg_exprs,
                                 P.AggMode.PARTIAL_MERGE, agg.max_groups)
    merge_node.schema = partial.schema

    final_gather = P.ShuffleExchange(_pseudo_scan("__acc", partial.schema),
                                     "single", (), np_)
    final_gather.schema = partial.schema
    final_node = P.HashAggregate(final_gather, merge_groups, agg.agg_exprs,
                                 P.AggMode.FINAL, agg.max_groups)
    final_node.schema = agg.schema

    sh = NamedSharding(mesh, PSpec(PARTITION_AXIS))

    def shard(b: Batch) -> Batch:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), b)

    @jax.jit
    def step(tile: Batch, acc: Batch):
        fn = shard_map(
            lambda tables: run_plan_spmd(
                merge_node, tables, np_, PARTITION_AXIS)[0],
            mesh=mesh,
            in_specs=(PSpec(PARTITION_AXIS),),
            out_specs=PSpec(PARTITION_AXIS),
            check_vma=False,
        )
        return fn({table: tile, "__acc": acc})

    @jax.jit
    def finish(acc: Batch):
        fn = shard_map(
            lambda tables: run_plan_spmd(
                final_node, tables, np_, PARTITION_AXIS)[0],
            mesh=mesh,
            in_specs=(PSpec(PARTITION_AXIS),),
            out_specs=PSpec(PARTITION_AXIS),
            check_vma=False,
        )
        return fn({"__acc": acc})

    acc: Optional[Batch] = None
    for tile in tiles:
        tile = shard(_pad_rows_to(tile, np_))
        if acc is None:
            # empty accumulator: max_groups dead rows per device
            from datafusion_comet_tpu.exec.batch import pad_capacity

            gcap = pad_capacity(max(agg.max_groups or 1024, 8)) * np_
            acc = shard(_dead_batch(partial.schema, gcap))
        acc = step(tile, acc)
    if acc is None:
        raise ValueError("no input tiles")
    out = finish(acc)
    # partition 0 holds the gathered final rows; others are dead
    return out


def _pad_rows_to(b: Batch, np_: int) -> Batch:
    """Round the tile capacity up so it splits evenly across devices."""
    cap = b.row_mask.shape[0]
    if cap % np_ == 0:
        return b
    import dataclasses as _dc

    pad = np_ - cap % np_

    def padc(cv):
        d = jnp.pad(cv.data, [(0, pad)] + [(0, 0)] * (cv.data.ndim - 1))
        v = jnp.pad(cv.validity, (0, pad))
        ln = None if cv.lengths is None else jnp.pad(cv.lengths, (0, pad))
        return _dc.replace(cv, data=d, validity=v, lengths=ln)

    return Batch(tuple(padc(c) for c in b.columns),
                 jnp.pad(b.row_mask, (0, pad)), b.schema)


def _dead_batch(schema: T.Schema, capacity: int) -> Batch:
    from datafusion_comet_tpu.exec.batch import ColumnVector

    cols = []
    for f in schema.fields:
        if f.dtype.is_binary:
            cols.append(ColumnVector(
                jnp.zeros((capacity, f.dtype.byte_width), jnp.uint8),
                jnp.zeros(capacity, bool), jnp.zeros(capacity, jnp.int32), f.dtype))
        else:
            cols.append(ColumnVector(
                jnp.zeros(capacity, f.dtype.np_dtype()),
                jnp.zeros(capacity, bool), None, f.dtype))
    return Batch(tuple(cols), jnp.zeros(capacity, bool), schema)
