"""Query engine: bound plan tree → one fused, jitted XLA computation.

The analog of the reference's native planner + execution loop
(planner.rs:1202 create_plan; jni_api.rs:762 executePlan), collapsed: because
every operator is a pure function over static-shape Batches, the *entire*
plan compiles into a single XLA computation — XLA fuses
scan→filter→project→partial-agg chains the way Comet relies on DataFusion's
pipelined operators, but without any interpreter in the hot loop.

Host↔device boundary discipline (reference: the Arrow FFI edges,
NativeUtil.scala:94): data enters once per table (Scan materialization /
device_put) and leaves once at collect(); everything between stays in HBM.

Runtime re-planning: joins report a match-fanout overflow flag; execute()
checks the flags on the host and retries with a doubled ``max_build_matches``
— the static-shape analog of DataFusion's dynamic batch growth.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import Batch, from_numpy, to_numpy
from datafusion_comet_tpu.exec.evaluator import EvalContext
from datafusion_comet_tpu.exec.operators import aggregate as AGG
from datafusion_comet_tpu.exec.operators import basic as B
from datafusion_comet_tpu.exec.operators import join as J
from datafusion_comet_tpu.exec.operators import window as W
from datafusion_comet_tpu.exec import registry as REG
from datafusion_comet_tpu.exec.registry import UnsupportedPlanError
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P

__all__ = ["Session", "run_plan", "JoinOverflowError", "QueryExecutionError",
           "UnsupportedPlanError"]


class JoinOverflowError(RuntimeError):
    pass


class QueryExecutionError(RuntimeError):
    """ANSI-mode runtime error surfaced after device execution (the analog of
    the reference's SparkError → CometQueryExecutionException pipeline,
    docs sql_error_propagation.md: native errors → structured exception)."""


def run_plan(
    plan: P.PlanNode,
    tables: Dict[str, Batch],
    ctx: Optional[EvalContext] = None,
    overflow_flags: Optional[List[jax.Array]] = None,
    join_fanout: int = 4,
    metrics=None,
) -> Batch:
    """Pure, traceable execution of a bound plan over resident tables."""
    ctx = ctx or EvalContext()
    flags = overflow_flags if overflow_flags is not None else []
    if ctx.overflow_flags is None:
        ctx.overflow_flags = flags
    out = _exec(plan, tables, ctx, flags, join_fanout, metrics)
    return out


def _exec(plan, tables, ctx, flags, fanout, metrics=None) -> Batch:
    out = _exec_inner(plan, tables, ctx, flags, fanout, metrics)
    if metrics is not None:
        metrics.record(plan, out)
    from datafusion_comet_tpu.conf import CONF, DEBUG_VALIDATE_BATCHES

    if CONF.get(DEBUG_VALIDATE_BATCHES):
        from datafusion_comet_tpu.exec.debug import check_batch

        check_batch(out, type(plan).__name__)
    return out


def _exec_inner(plan, tables, ctx, flags, fanout, metrics=None) -> Batch:
    return REG.OPERATORS.resolve(type(plan))(plan, tables, ctx, flags, fanout, metrics)


# ---- registered operator executors (reference: operator_registry.rs:32 —
# every operator resolves through the registry; extensions add theirs with
# OPERATORS.register without touching this module) --------------------------------


@REG.OPERATORS.register(P.Scan)
def _exec_scan(plan, tables, ctx, flags, fanout, metrics) -> Batch:
    b = tables[plan.table]
    if plan.projection is not None:
        idx = [b.schema.index_of(n) for n in plan.projection]
        b = b.select(idx, plan.schema)
    return b


@REG.OPERATORS.register(P.Filter)
def _exec_filter(plan, tables, ctx, flags, fanout, metrics) -> Batch:
    out = B.filter_op(_exec(plan.child, tables, ctx, flags, fanout, metrics), plan.predicate, ctx)
    # drastic-selectivity shrink: when stats say the filter keeps a tiny
    # fraction, compact to a small capacity so every downstream operator
    # (join concat sorts, aggregates) runs at the estimate, not the input
    # capacity (q18's qty>300 keeps ~60 rows of a 2M-capacity aggregate).
    # Only >=8x reductions pay for the compaction sort; the overflow flag
    # rides the usual retry loop when the estimate is wrong.
    est = getattr(plan, "out_rows_hint", None)
    if est:
        from datafusion_comet_tpu.exec.batch import pad_capacity

        target = pad_capacity(max(4 * est, 1024) * max(ctx.agg_scale, 1))
        if target * 8 <= out.capacity:
            out, covf = B.compact_batch(out, target)
            flags.append(covf)
    return out


@REG.OPERATORS.register(P.Projection)
def _exec_projection(plan, tables, ctx, flags, fanout, metrics) -> Batch:
    return B.project_op(_exec(plan.child, tables, ctx, flags, fanout, metrics), plan.exprs, plan.schema, ctx)


@REG.OPERATORS.register(P.HashAggregate)
def _exec_hash_aggregate(plan, tables, ctx, flags, fanout, metrics) -> Batch:
    child = _exec(plan.child, tables, ctx, flags, fanout, metrics)
    return AGG.hash_aggregate(
        child, plan.group_exprs, plan.agg_exprs, plan.mode,
        plan.max_groups or (1 << 16), plan.schema, ctx,
        key_ranges=getattr(plan, "group_key_ranges", None),
    )


@REG.OPERATORS.register(P.Sort)
def _exec_sort(plan, tables, ctx, flags, fanout, metrics) -> Batch:
    return B.sort_op(_exec(plan.child, tables, ctx, flags, fanout, metrics), plan.orders, plan.fetch, plan.skip, ctx)


@REG.OPERATORS.register(P.Limit)
def _exec_limit(plan, tables, ctx, flags, fanout, metrics) -> Batch:
    return B.limit_op(_exec(plan.child, tables, ctx, flags, fanout, metrics), plan.limit, plan.offset)


@REG.OPERATORS.register(P.Expand)
def _exec_expand(plan, tables, ctx, flags, fanout, metrics) -> Batch:
    return B.expand_op(_exec(plan.child, tables, ctx, flags, fanout, metrics), plan.projections, plan.schema, ctx)


@REG.OPERATORS.register(P.Explode)
def _exec_explode(plan, tables, ctx, flags, fanout, metrics) -> Batch:
    return B.explode_op(
        _exec(plan.child, tables, ctx, flags, fanout, metrics),
        plan.expr, plan.schema, plan.outer, plan.pos, ctx,
    )


@REG.OPERATORS.register(P.Sample)
def _exec_sample(plan, tables, ctx, flags, fanout, metrics) -> Batch:
    return B.sample_op(
        _exec(plan.child, tables, ctx, flags, fanout, metrics),
        plan.lower_bound,
        plan.upper_bound,
        plan.with_replacement,
        plan.seed,
        ctx.partition_id,
    )


@REG.OPERATORS.register(P.HashJoin)
@REG.OPERATORS.register(P.SortMergeJoin)
def _exec_hash_join(plan, tables, ctx, flags, fanout, metrics) -> Batch:
    left = _exec(plan.left, tables, ctx, flags, fanout, metrics)
    right = _exec(plan.right, tables, ctx, flags, fanout, metrics)
    build_side = plan.build_side if isinstance(plan, P.HashJoin) else _smj_build_side(plan)
    # stats-derived per-join K (grown by the retry loop's agg_scale); joins
    # without a hint use the session-level fanout
    hint = getattr(plan, "fanout_hint", None)
    k = min(hint * max(ctx.agg_scale, 1), 256) if hint else fanout
    # compacted pair-list capacity from the stats row estimate (2x margin,
    # grown by the retry loop) — the join then never materializes the
    # (probe x K) block
    from datafusion_comet_tpu.exec.batch import pad_capacity as _padc

    est = getattr(plan, "out_rows_hint", None)
    compact_rows = None
    semi_like = plan.join_type in (
        P.JoinType.LEFT_SEMI, P.JoinType.LEFT_ANTI,
        P.JoinType.LEFT_ANTI_NULL_AWARE, P.JoinType.EXISTENCE)
    if est and not semi_like:
        lim = max(left.capacity, right.capacity) * 64
        # the retry scale multiplies OUTSIDE the floor: with a tiny (wrong)
        # estimate, max(2*est*scale, 4096) stalls at the floor and the
        # overflow retry never converges (the q17 stage-1 infinite-retry
        # bug); (floor * scale) grows every attempt unconditionally
        compact_rows = int(_padc(int(min(
            max(2 * est, 4096) * max(ctx.agg_scale, 1), lim))))
    out, ovf = J.hash_join(
        left,
        right,
        plan.left_keys,
        plan.right_keys,
        plan.join_type,
        build_side,
        plan.schema,
        plan.condition,
        max_build_matches=k,
        unique_build=bool(getattr(plan, "unique_build_hint", False))
        and ctx.unique_join_ok,
        presorted_build=bool(getattr(plan, "presorted_build", False)),
        key_pack=(getattr(plan, "key_pack", None) if ctx.unique_join_ok else None),
        compact_rows=compact_rows,
        ctx=ctx,
        dense_range=getattr(plan, "rf_dense_range", None),
        build_key_range=getattr(plan, "build_key_range", None),
        cond_col_ranges=getattr(plan, "cond_col_ranges", None),
    )
    flags.append(ovf)
    from datafusion_comet_tpu.exec.batch import pad_capacity

    if plan.join_type in (P.JoinType.LEFT_SEMI, P.JoinType.LEFT_ANTI,
                          P.JoinType.LEFT_ANTI_NULL_AWARE):
        # semi/anti output keeps the probe capacity with a thinned mask;
        # with a stats row estimate, compact so downstream sorts/aggregates
        # run at the post-filter size (same >=8x rule as the Filter shrink)
        if est:
            # 2x margin when the estimate derives from an exact
            # host-evaluated runtime-filter key set; 4x for sketch-based
            # stats (overflow retry covers the rest either way)
            margin = 2 if getattr(plan, "rf_dense_range", None) else 4
            starget = pad_capacity(
                max(margin * est, 1024) * max(ctx.agg_scale, 1))
            if starget * 8 <= out.capacity:
                out, covf = B.compact_batch(out, starget)
                flags.append(covf)
        return out
    # Compact the (probe × K) pair block: without this, chained joins
    # multiply their K factors (a 5-join chain would carry 4^5 = 1024×
    # mostly-dead capacity). Target grows with the re-plan loop.
    grow = max(2, k // 2) * (1 if hint else max(ctx.agg_scale, 1))
    target = pad_capacity(max(left.capacity, right.capacity) * grow)
    if target < out.capacity:
        out, covf = B.compact_batch(out, target)
        flags.append(covf)
    return out


@REG.OPERATORS.register(P.BroadcastNestedLoopJoin)
def _exec_bnlj(plan, tables, ctx, flags, fanout, metrics) -> Batch:
    left = _exec(plan.left, tables, ctx, flags, fanout, metrics)
    right = _exec(plan.right, tables, ctx, flags, fanout, metrics)
    return J.nested_loop_join(left, right, plan.join_type, plan.schema, plan.condition, ctx)


@REG.OPERATORS.register(P.Window)
def _exec_window(plan, tables, ctx, flags, fanout, metrics) -> Batch:
    return W.window_op(_exec(plan.child, tables, ctx, flags, fanout, metrics), plan.window_exprs, plan.schema, ctx)


@REG.OPERATORS.register(P.ShuffleExchange, gated=False)
def _exec_exchange(plan, tables, ctx, flags, fanout, metrics) -> Batch:
    # single-partition engine: exchange is identity (multi-device path in
    # parallel/shuffle.py re-lowers this node to an all-to-all)
    return _exec(plan.child, tables, ctx, flags, fanout, metrics)


@REG.OPERATORS.register(P.Union)
def _exec_union(plan, tables, ctx, flags, fanout, metrics) -> Batch:
    kids = [_exec(c, tables, ctx, flags, fanout, metrics) for c in plan.inputs]
    return _union(kids, plan.schema)


def _smj_build_side(plan: P.SortMergeJoin) -> str:
    """SMJ result-equivalent execution via sorted-probe hash join. For outer
    joins the probe must be the outer side (see join.py)."""
    if plan.join_type in (P.JoinType.LEFT, P.JoinType.LEFT_SEMI, P.JoinType.LEFT_ANTI,
                          P.JoinType.LEFT_ANTI_NULL_AWARE, P.JoinType.EXISTENCE):
        return "right"
    if plan.join_type == P.JoinType.RIGHT:
        return "left"
    return "right"


def _union(kids: List[Batch], schema: T.Schema) -> Batch:
    from datafusion_comet_tpu.exec.batch import ColumnVector

    def cat_cv(cvs, dtype) -> ColumnVector:
        cvs = cvs[0].unify_encoding(*cvs[1:])  # codes only if ONE shared dict
        if cvs[0].is_dict:
            return ColumnVector(
                jnp.concatenate([c.data for c in cvs]),
                jnp.concatenate([c.validity for c in cvs]),
                None, dtype, dictionary=cvs[0].dictionary,
            )
        if dtype.is_decimal and any(c.is_wide_storage for c in cvs) and not all(
                c.is_wide_storage for c in cvs):
            # mixed narrow/two-limb storage across union branches: widen all
            from datafusion_comet_tpu.exec import decimal_wide as DW

            cvs = [DW.widen_cv(c) for c in cvs]
        datas = [c.data for c in cvs]
        if dtype.is_binary:  # unify string widths
            w = max(d.shape[-1] for d in datas)
            datas = [
                jnp.pad(d, [(0, 0)] * (d.ndim - 1) + [(0, w - d.shape[-1])])
                if d.shape[-1] < w else d
                for d in datas
            ]
        kids_out = tuple(
            cat_cv([c.children[i] for c in cvs], cvs[0].children[i].dtype)
            for i in range(len(cvs[0].children))
        )
        return ColumnVector(
            jnp.concatenate(datas, axis=0),
            jnp.concatenate([c.validity for c in cvs]),
            None if cvs[0].lengths is None else jnp.concatenate([c.lengths for c in cvs]),
            dtype,
            kids_out,
        )

    cols = [
        cat_cv([k.columns[ci] for k in kids], f.dtype)
        for ci, f in enumerate(schema.fields)
    ]
    mask = jnp.concatenate([k.row_mask for k in kids])
    return Batch(tuple(cols), mask, schema)


# -------------------------------------------------------------------------------------
# Session
# -------------------------------------------------------------------------------------


class Session:
    """Driver-side session: table registry + plan compiler/executor.

    The analog of the reference's JVM planning layer + native SessionContext
    (jni_api.rs:560-666), minus Spark: plans are built with the ir/ builders.
    """

    def __init__(self, join_fanout: int = 4, max_join_retries: int = 4):
        self.tables: Dict[str, Batch] = {}
        self.stats: Dict[str, object] = {}  # per-table NDV sketches (exec/stats.py)
        self.join_fanout = join_fanout
        self.max_join_retries = max_join_retries
        self._subqueries: Dict[int, Tuple[P.PlanNode, int]] = {}
        self._subquery_values: Dict[int, Tuple[object, bool]] = {}
        import threading as _threading

        self._tls_materialize = _threading.local()
        self._subquery_lock = _threading.Lock()
        self._next_subquery_id = 0
        # atomic monotone id source: parallel compile threads (tpcbench
        # --compile-workers) prepare() plans on ONE session concurrently —
        # a plain int counter raced and could collide temp-table names
        import itertools as _it

        self._stage_ids = _it.count()
        self._cache: Dict[Tuple[int, int], Callable] = {}
        self._spill_streams: Dict[str, Tuple[object, T.Schema]] = {}
        self._host_pool = None
        self._host_reservations: Dict[str, object] = {}
        self._subquery_dedup: Dict[Tuple[str, int], int] = {}
        # lazy hive-partitioned parquet tables, resolved (with static +
        # dynamic partition pruning) per query at _plan_stages time
        self._deferred: Dict[str, Dict[str, object]] = {}

    @property
    def host_pool(self):
        """Host-side buffering pool (spill re-staging, shuffle capture, UDF
        batches), built from comet.memory.pool.type — the
        create_memory_pool(config) analog (memory_pools/mod.rs:33)."""
        if self._host_pool is None:
            from datafusion_comet_tpu.conf import CONF, MEMORY_POOL_TYPE
            from datafusion_comet_tpu.exec.pools import create_memory_pool

            self._host_pool = create_memory_pool(
                CONF.get(MEMORY_POOL_TYPE), 1 << 33)
        return self._host_pool

    def _host_reserve(self, name: str):
        from datafusion_comet_tpu.exec.pools import TaskSharedPool

        pool = self.host_pool
        if isinstance(pool, TaskSharedPool):
            return pool.register(0, name)
        return pool.register(name)

    # -- registration ------------------------------------------------------------
    def register_batch(self, name: str, batch: Batch) -> None:
        self.tables[name] = batch

    def register_numpy(self, name: str, data, schema: T.Schema, **kw) -> None:
        from datafusion_comet_tpu.exec.stats import collect_stats

        self.stats[name] = collect_stats(data, schema)
        self.tables[name] = from_numpy(data, schema, **kw)

    def register_spill(self, name: str, path: str, schema: T.Schema,
                       stream: bool = False) -> None:
        """Register previously spilled blocks (io/spill.py) as a queryable
        table — the ShuffleScanExec analog (reference: shuffle blocks read
        back through a block iterator into the next query's scan,
        native/core ShuffleScanExec + ipc.rs). ``stream=False`` re-stages
        every block into one resident batch; ``stream=True`` defers
        re-staging and feeds blocks tile-by-tile through the same tiled
        path the HBM budget rewrite uses (one block must fit the budget)."""
        from datafusion_comet_tpu.io.spill import SpillReader

        reader = SpillReader(path, schema)
        # host-buffering accounting: the resident path co-stages every
        # block's raw bytes; reserve them from the session pool (the
        # create_memory_pool-configured family, exec/pools.py) so competing
        # consumers spill instead of silently over-committing host RAM
        import os as _os

        raw_bytes = _os.path.getsize(path)
        old = self._host_reservations.pop(name, None)
        if old is not None:
            old.free()
        res = self._host_reserve(f"spill:{name}")
        res.try_grow(int(raw_bytes))
        self._host_reservations[name] = res
        if stream:
            self._spill_streams[name] = (reader, schema)
            # resident placeholder holds only the schema; budget rewrite
            # swaps in the block iterator for streamable aggregates
            first = reader.read_batch(0)
            self.tables[name] = first
            return
        kids = [reader.read_batch(i) for i in range(reader.num_blocks())]
        self.tables[name] = kids[0] if len(kids) == 1 else _union(kids, schema)
        from datafusion_comet_tpu.exec.stats import TableStats

        rows = int(sum(int(np.asarray(b.row_mask).sum()) for b in kids))
        self.stats[name] = TableStats(rows=max(rows, 1), ndv={})

    def spill_aggregate(self, plan: P.PlanNode, name: str) -> Batch:
        """Run a streamable aggregate over a stream-registered spill table
        block-by-block (blocks never co-resident in HBM)."""
        from datafusion_comet_tpu.exec.streaming import execute_tiled_aggregate

        reader, schema = self._spill_streams[name]

        def tiles():
            for i in range(reader.num_blocks()):
                yield reader.read_batch(i)

        return execute_tiled_aggregate(plan, tiles(), name)

    def register_parquet(self, name: str, path: str, schema: Optional[T.Schema] = None,
                         lazy: bool = False) -> None:
        """``lazy=True`` defers staging to query time so hive partition
        directories can be pruned per query — statically from filters on
        partition columns and dynamically from joins against filtered
        dimensions (the CometScanExec partitionFilters /
        dynamicallySelectedPartitions analog, CometScanExec.scala:105-130;
        see exec/dpp.py). The eager default stages the whole table now."""
        from datafusion_comet_tpu.io.parquet import deferred_parquet_info, read_parquet

        if lazy:
            schema_, part_cols = deferred_parquet_info(path, schema)
            self._deferred[name] = {
                "path": path, "schema": schema_, "part_cols": part_cols,
                "cache": {},
            }
            self.tables.pop(name, None)
            return
        self.tables[name] = read_parquet(path, schema=schema)

    def register_csv(self, name: str, path: str, schema: Optional[T.Schema] = None, **opts) -> None:
        from datafusion_comet_tpu.io.csv import read_csv

        self.tables[name] = read_csv(path, schema=schema, **opts)

    def table_schema(self, name: str) -> T.Schema:
        if name not in self.tables and name in self._deferred:
            return self._deferred[name]["schema"]
        return self.tables[name].schema

    def _resolve_deferred(self, plan: P.PlanNode) -> None:
        """Stage every deferred parquet table the plan references, pruning
        hive partitions via exec/dpp.py. Staged batches are cached per
        allowed-value signature, so repeated queries with the same pruning
        reuse the device batch."""
        if not self._deferred:
            return
        from datafusion_comet_tpu.conf import CONF, DPP_ENABLED
        from datafusion_comet_tpu.exec.dpp import compute_allowed_partitions
        from datafusion_comet_tpu.io.parquet import read_parquet

        def walk(p):
            yield p
            for c in p.children():
                yield from walk(c)

        sites: Dict[str, List[P.PlanNode]] = {}
        for node in walk(plan):
            if isinstance(node, P.Scan) and node.table in self._deferred:
                sites.setdefault(node.table, []).append(node)
        dynamic = bool(CONF.get(DPP_ENABLED))
        # compute every table's pruning BEFORE assigning any: a DPP
        # dim-side pre-execution recurses into _resolve_deferred with the
        # subplan and must not leave a subplan-scoped (over-pruned) batch
        # behind for a table the outer plan also reads
        wanted: Dict[str, Dict[str, frozenset]] = {}
        for name, scans in sites.items():
            d = self._deferred[name]
            # union across scan sites: a partition must be staged if ANY
            # site can need it (they share one resident batch)
            per_site = [
                compute_allowed_partitions(plan, s, d["part_cols"], self, dynamic=dynamic)
                for s in scans
            ]
            merged: Dict[str, frozenset] = {}
            for col in d["part_cols"]:
                sets = [a.get(col) for a in per_site]
                if any(v is None for v in sets):
                    continue  # some site needs every partition
                merged[col] = frozenset().union(*sets)
            wanted[name] = merged
        for name, merged in wanted.items():
            d = self._deferred[name]
            key = tuple(sorted((c, tuple(sorted(v))) for c, v in merged.items()))
            if key not in d["cache"]:
                d["cache"][key] = read_parquet(
                    d["path"], schema=d["schema"],
                    partition_values={c: set(v) for c, v in merged.items()} or None,
                )
            self.tables[name] = d["cache"][key]

    # -- scalar subqueries ---------------------------------------------------------
    def scalar_subquery(self, plan: P.PlanNode, column: int = 0) -> E.ScalarSubquery:
        """Register an uncorrelated scalar subquery: executed lazily before
        the outer plan, its single value injected at evaluation (reference:
        CometScalarSubquery / expressions/subquery.rs:38)."""
        bound = P.bind_plan(plan) if _needs_bind(plan) else plan
        # subquery reuse (the ReuseSubquery rule analog): structurally equal
        # subqueries share one id, so they execute (and compile) once
        from datafusion_comet_tpu.ir.serde import plan_to_json

        key = (plan_to_json(bound), column)
        cached = self._subquery_dedup.get(key)
        if cached is not None:
            return E.ScalarSubquery(cached, bound.schema.fields[column].dtype)
        sid = self._next_subquery_id
        self._next_subquery_id += 1
        self._subqueries[sid] = (bound, column)
        self._subquery_dedup[key] = sid
        return E.ScalarSubquery(sid, bound.schema.fields[column].dtype)

    def _materialize_subqueries(self) -> Dict[int, Tuple[object, bool]]:
        # memoized + reentrancy-guarded: executing a subquery plan re-enters
        # compile(), which must not re-materialize the in-flight subquery.
        # The reentrancy flag is PER-THREAD and materialization serializes
        # under a lock: with parallel compile workers, an instance-level
        # flag let thread B short-circuit with thread A's HALF-BUILT value
        # dict — B's compiled fn then missed a subquery id and trace-time
        # asserted (tpcds q8/q20 compile-failed under --compile-workers 4).
        if getattr(self._tls_materialize, "active", False):
            return dict(self._subquery_values)
        with self._subquery_lock:
            self._tls_materialize.active = True
            try:
                for sid, (sub, column) in list(self._subqueries.items()):
                    if sid in self._subquery_values:
                        continue
                    out = to_numpy(self.execute(sub))
                    name = sub.schema.fields[column].name
                    vals = out[name]
                    valid = out[name + "__valid"]
                    if len(vals) == 0:
                        self._subquery_values[sid] = (None, False)
                    else:
                        self._subquery_values[sid] = (vals[0], bool(valid[0]))
            finally:
                self._tls_materialize.active = False
        return dict(self._subquery_values)

    # -- execution ---------------------------------------------------------------
    def compile(self, plan: P.PlanNode, join_fanout: Optional[int] = None,
                agg_scale: int = 1, unique_join_ok: bool = True):
        """Bind + jit a plan; returns (bound_plan, jitted fn(tables)->(batch, flags))."""
        if _needs_bind(plan):
            from datafusion_comet_tpu.ir.pruning import prune_columns

            bound = P.bind_plan(prune_columns(plan))
        else:
            bound = plan
        fanout = join_fanout or self.join_fanout
        sub_values = self._materialize_subqueries() if self._subqueries else None
        # the compiled program's inputs are ONLY the tables this plan scans:
        # the jit signature (and the persistent-cache key) is then stable
        # against unrelated registrations — structurally-identical stages
        # from different queries share one compiled program, and parallel
        # compile workers' temp-table churn on the shared session can't
        # retrace (or corrupt the trace of) another thread's program
        refs = sorted(set(_scan_tables(bound)))

        msg_box: List[str] = []

        import os as _os

        debug_ovf = bool(_os.environ.get("COMET_DEBUG_OVERFLOW"))

        def fn(tables):
            flags: List[jax.Array] = []
            errs: List[Tuple[jax.Array, str]] = []
            ctx = EvalContext(subquery_values=sub_values, errors=errs,
                              agg_scale=agg_scale, unique_join_ok=unique_join_ok)
            out = run_plan(bound, tables, ctx, flags, fanout)
            msg_box.clear()
            msg_box.extend(m for _, m in errs)
            err_flags = (
                jnp.stack([jnp.any(f) for f, _ in errs]) if errs else jnp.zeros(0, bool)
            )
            ovf = jnp.any(jnp.stack(flags)) if flags else jnp.zeros((), bool)
            if debug_ovf:
                vec = (jnp.stack([jnp.any(f) for f in flags])
                       if flags else jnp.zeros(0, bool))
                return out, ovf, err_flags, vec
            return out, ovf, err_flags

        jitted = jax.jit(fn)

        def wrapped(tables):
            tables = {k: tables[k] for k in refs}
            if debug_ovf:
                out, ovf, err_flags, vec = jitted(tables)
                import numpy as _np

                fired = _np.asarray(vec)
                if fired.any():
                    print(f"[overflow-debug] flags fired at indices "
                          f"{list(_np.nonzero(fired)[0])} of {len(fired)} "
                          "(append order: per-operator, depth-first)",
                          flush=True)
            else:
                out, ovf, err_flags = jitted(tables)
            if err_flags.shape[0]:
                fired = np.asarray(err_flags)
                if fired.any():
                    msgs = [m for m, f in zip(msg_box, fired) if f]
                    raise QueryExecutionError("; ".join(dict.fromkeys(msgs)))
            return out, ovf

        return bound, wrapped

    def _stage_udfs(self, plan: P.PlanNode) -> P.PlanNode:
        """Bottom-up: materialize below every node holding PythonUdf exprs,
        run the UDF on the host, splice its result in as a temp-table column
        (see module comment — the C2R/R2C transition analog)."""
        kids = [self._stage_udfs(c) for c in plan.children()]
        for old, new in zip(plan.children(), kids):
            if old is not new:
                plan = _replace_child(plan, old, new)
        if isinstance(plan, P.MapInBatch):
            return self._run_map_in_batch(plan)
        box: List[E.PythonUdf] = []
        for e in _node_own_exprs(plan):
            _expr_udfs(e, box)
        if not box:
            return plan
        if not isinstance(plan, (P.Projection, P.Filter)):
            raise NotImplementedError(
                f"PythonUdf inside {type(plan).__name__} on a backend without "
                "host callbacks — wrap the UDF in a Projection first"
            )
        from datafusion_comet_tpu.exec.host_udf import host_eval_udf

        child = plan.children()[0]
        batch = self.execute(child)
        mapping: Dict[int, str] = {}
        new_cols = list(batch.columns)
        new_fields = list(child.schema.fields)
        for u in box:
            name = f"__udf{next(self._stage_ids)}"
            cv = host_eval_udf(u, batch)
            new_cols.append(cv)
            new_fields.append(T.Field(name, u.out_dtype))
            mapping[id(u)] = name
        temp_schema = T.Schema(new_fields)
        temp_name = f"__stage{next(self._stage_ids)}"
        self.tables[temp_name] = Batch(tuple(new_cols), batch.row_mask, temp_schema)
        scan = P.Scan(temp_name, temp_schema)
        scan.schema = temp_schema
        if isinstance(plan, P.Projection):
            exprs = tuple(
                E.bind(_rewrite_expr(x, mapping), temp_schema) for x in plan.exprs
            )
            out = P.Projection(scan, exprs)
            out.schema = T.Schema([T.Field(x.name, x.dtype) for x in exprs])
        else:
            pred = E.bind(_rewrite_expr(plan.predicate, mapping), temp_schema)
            flt = P.Filter(scan, pred)
            flt.schema = temp_schema
            # project the helper columns back out to preserve the contract
            exprs = tuple(
                E.bind(E.col(f.name), temp_schema) for f in child.schema.fields
            )
            out = P.Projection(flt, exprs)
            out.schema = child.schema
        return out

    def _run_map_in_batch(self, plan: "P.MapInBatch") -> P.PlanNode:
        """Materialize the child, run the host batch function, splice the
        result back as a temp table (always a host transition)."""
        import pandas as pd

        batch = self.execute(plan.child)
        host = to_numpy(batch)
        df = pd.DataFrame({k: v for k, v in host.items() if not k.endswith("__valid")})
        for k in list(df.columns):  # apply validity as None
            valid = host[k + "__valid"]
            if not valid.all():
                df[k] = [v if ok else None for v, ok in zip(df[k], valid)]
        out_df = plan.fn(df)
        schema = T.Schema(list(plan.out_fields))
        data = {
            f.name: [None if pd.isna(v) else v for v in out_df[f.name]]
            if not f.dtype.is_nested
            else list(out_df[f.name])
            for f in schema.fields
        }
        temp_name = f"__stage{next(self._stage_ids)}"
        self.tables[temp_name] = from_numpy(data, schema)
        scan = P.Scan(temp_name, schema)
        scan.schema = schema
        return scan

    def _aqe_shrink(self, b: Batch, force: bool = False):
        """Stage-boundary adaptive compaction (the AQE analog): the staged
        runner is already at a host sync point, so read the temp table's
        LIVE row count and compact it to 2x that (padded) when the win is
        >=4x — every downstream stage's concat sorts and gathers then run
        at the runtime size, not the static estimate (q18's qty>300 filter
        keeps ~60 of 2M slots). Returns (batch, jitted_shrink_fn or None);
        the runner re-applies the same jitted compaction on later calls."""
        import functools

        live = int(np.asarray(b.num_rows()))
        from datafusion_comet_tpu.exec.batch import pad_capacity

        target = int(pad_capacity(max(2 * live, 1024)))
        if target * 4 > b.capacity:
            return b, None
        # compile-cost gate: the compaction program argsorts the FULL input
        # capacity and gathers every column — at 8M-row × many-column temp
        # tables the tunnel compiler takes tens of minutes per distinct
        # (schema, target) pair (r4: runtime semi-join filters made such
        # tables common and wedged parallel suite builds). Skip the shrink
        # when the program is huge AND the reduction is merely moderate;
        # keep it when the reduction is drastic (q18's 2000x — downstream
        # savings dwarf one compile).
        from datafusion_comet_tpu.conf import CONF, SHRINK_MAX_COMPILE_CELLS

        cells = b.capacity * max(len(b.columns), 1)
        reduction = b.capacity // max(target, 1)
        if (not force and cells > CONF.get(SHRINK_MAX_COMPILE_CELLS)
                and reduction < 64):
            # force=True (grace-join pair outputs / children): HBM is the
            # binding constraint there, and the canonical shrink programs
            # are cheap to compile — skipping left 16M-capacity pair
            # outputs whose union re-created the out-of-budget batch
            return b, None
        fn = functools.partial(_shrink_apply, target=target)
        # serialize the first-call COMPILE path: concurrent cache-miss
        # compiles through the tunnel backend have wedged parallel
        # tpcbench builds for 40+ min. The canonical shrink programs
        # (_shrink_perm per capacity, _take_rows per leaf shape/dtype) are
        # small and shared engine-wide, so the lock costs nothing warm.
        with _SHRINK_COMPILE_LOCK:
            out = fn(b)
        return out, fn

    def execute(self, plan: P.PlanNode) -> Batch:
        """Execute with automatic join-fanout re-planning and (for join-heavy
        plans) staged compilation: at most ``comet.exec.stage.
        maxJoinsPerProgram`` joins per compiled XLA program, join inputs
        materialized as device-resident temp tables between stages. Bounds
        program size (the monolithic q5/q18 programs never finished the
        tunnel TPU compile) and makes overflow retries per-stage."""
        from datafusion_comet_tpu.conf import CONF, STAGE_MAX_JOINS

        stage_list = self._plan_stages(plan)
        temp_names = [n for n, _ in stage_list if n]
        out: Optional[Batch] = None
        try:
            for name, sub in stage_list:
                reasons = REG.gate_reasons(sub)
                if reasons:
                    raise UnsupportedPlanError(reasons)
                sub, _presteps = self._budget_plan(sub, temp_names)
                try:
                    out = self._execute_retry(sub)
                except NotImplementedError as e:
                    # route the deep evaluator/operator guard through the
                    # same reason surface validate() reports (the reference
                    # tags the node withFallbackReason and falls back;
                    # with no host fallback the reason IS the failure)
                    raise UnsupportedPlanError([f"unsupported: {e}"]) from e
                if name:
                    out, _ = self._aqe_shrink(out)
                    self.tables[name] = out
            return out
        finally:
            for n in temp_names:  # free stage intermediates (HBM)
                self.tables.pop(n, None)

    def prepare(self, plan: P.PlanNode) -> Callable[[], Batch]:
        """Compile a plan (staged if join-heavy) into a reusable runner: the
        warm-up execution settles join fan-out / group capacities per stage,
        then every call re-executes with the SAME jitted programs (no
        retrace, no recompile) — the benchmarking/serving entry point."""
        stage_list = self._plan_stages(plan)
        temp_names = [n for n, _ in stage_list if n]
        steps: List[Tuple[Optional[str], Callable, Optional[Callable], List]] = []
        try:
            for name, sub in stage_list:
                sub, presteps = self._budget_plan(sub, temp_names)
                out, fn = self._execute_retry(sub, return_fn=True)
                shrink = None
                if name:
                    out, shrink = self._aqe_shrink(out)
                    self.tables[name] = out
                steps.append((name, fn, shrink, presteps))
        finally:
            for n in temp_names:
                self.tables.pop(n, None)

        def run() -> Batch:
            res: Optional[Batch] = None
            try:
                for name, fn, shrink, presteps in steps:
                    for p in presteps:  # re-run tiled/grace temp-table fills
                        p()
                    res, ovf = fn(self.tables)
                    if name:
                        if shrink is not None:
                            res = shrink(res)
                        self.tables[name] = res
            finally:
                for n in temp_names:
                    self.tables.pop(n, None)
            return res

        return run

    def _plan_stages(self, plan: P.PlanNode) -> List[Tuple[Optional[str], P.PlanNode]]:
        """Bind, stage host UDFs, and split into compile stages: a list of
        (temp_table_name, subplan) in execution order; the last entry has
        name None and is the query root. Each subplan holds at most
        ``comet.exec.stage.maxJoinsPerProgram`` joins (the staged analog of
        the reference's per-stage native plans between shuffle boundaries,
        CometExecRDD: one native plan instance per stage)."""
        from datafusion_comet_tpu.conf import CONF, STAGE_MAX_JOINS

        self._resolve_deferred(plan)  # stage lazy parquet w/ partition pruning
        if _needs_bind(plan):
            # column pruning BEFORE binding: without it every join carries
            # every input column through its sort/gather (and bloats the
            # compiled program) — the execute path must prune, not just the
            # legacy direct-compile path. Runtime-filter injection runs
            # AFTER pruning: prune_columns rebuilds join nodes, which would
            # drop the injector's hint attributes (rf_dense_range /
            # out_rows_hint).
            from datafusion_comet_tpu.exec.runtime_filter import (
                inject_runtime_filters)
            from datafusion_comet_tpu.ir.pruning import prune_columns

            bound0 = P.bind_plan(inject_runtime_filters(prune_columns(plan), self))
        else:
            bound0 = plan
        from datafusion_comet_tpu.exec.stats import derive_capacities

        derive_capacities(bound0, self.stats)
        bound0 = _apply_orderings(bound0)
        if _contains_map_in_batch(bound0):
            bound0 = self._stage_udfs(bound0)
        elif _plan_has_udf(bound0) and not _callbacks_supported():
            bound0 = self._stage_udfs(bound0)
        if _needs_bind(bound0):
            bound0 = P.bind_plan(bound0)
        max_joins = CONF.get(STAGE_MAX_JOINS)
        stages: List[Tuple[Optional[str], P.PlanNode]] = []
        root = bound0
        if max_joins and _count_joins(bound0) > max_joins:
            root = self._split_stages(bound0, max_joins, stages)
        stages.append((None, root))
        from datafusion_comet_tpu.conf import STAGE_MAX_HEAVY_OPS

        max_heavy = CONF.get(STAGE_MAX_HEAVY_OPS)
        if max_heavy:
            out: List[Tuple[Optional[str], P.PlanNode]] = []
            for name, sub in stages:
                pre: List[Tuple[Optional[str], P.PlanNode]] = []
                sub = self._split_heavy(sub, max_heavy, pre)
                out.extend(pre)
                out.append((name, sub))
            stages = out
        return stages

    def _split_heavy(
        self,
        plan: P.PlanNode,
        max_heavy: int,
        stages: List[Tuple[Optional[str], P.PlanNode]],
    ) -> P.PlanNode:
        """Second-axis stage splitting: beyond the join budget, cut below
        Window / grouping-HashAggregate / Sort nodes while the remaining
        program holds more than ``max_heavy`` heavy operators. Rollup +
        window + top-K tails (TPC-DS q18/q22/q67/q86) then compile as a
        big-but-bounded aggregate program plus tiny group-capacity tails
        instead of one tunnel-compiler pole; the AQE shrink at each stage
        boundary keeps the tail capacities at the LIVE group count."""
        kids = [self._split_heavy(c, max_heavy, stages) for c in plan.children()]
        for old, new in zip(plan.children(), kids):
            if old is not new:
                plan = _replace_child_pure(plan, old, new)
        if _count_heavy(plan) <= max_heavy:
            return plan
        if isinstance(plan, (P.Window, P.Sort, P.HashAggregate)):
            child = plan.children()[0]
            if not isinstance(child, P.Scan) and _count_heavy(child) >= 1:
                name = f"__stage{next(self._stage_ids)}"
                stages.append((name, child))
                scan = P.Scan(name, child.schema)
                scan.schema = child.schema
                plan = _replace_child_pure(plan, child, scan)
        return plan

    # -- HBM budget enforcement ------------------------------------------------------
    def _budget_plan(
        self, stage: P.PlanNode, temp_names: List[str]
    ) -> Tuple[P.PlanNode, List[Callable[[], None]]]:
        """Enforce the declared HBM budget (comet.memory.fraction): while a
        stage's conservative peak estimate exceeds the device budget, peel
        off an over-budget subtree —

        * a streamable aggregate (HashAggregate(SINGLE) over a
          row-preserving pipeline over ONE scan) runs tiled
          (exec/streaming.py TiledAggregator), or
        * an over-budget HashJoin runs hash-partitioned in K pieces
          (exec/grace.py GraceJoinRunner — the Grace join / partitioned
          spill analog of shuffle_writer.rs:52)

        — and splice the result back as a temp-table scan. Returns the
        rewritten stage plus re-runnable PRESTEPS (each re-populates its
        temp table using programs compiled on the first call here): the
        prepare() benchmark path re-runs them per repetition so timings
        include the tiled/partitioned work. Non-streamable over-budget
        stages proceed (the estimate sums every operator output; XLA frees
        earlier) with a warning. Reference analog: memory_pools/mod.rs
        reservations + spill — the budget is enforced by planning batch
        shapes, not by runtime accounting."""
        from datafusion_comet_tpu.exec.memory import (
            device_budget_bytes, plan_peak_bytes)

        presteps: List[Callable[[], None]] = []
        for _ in range(16):  # each iteration peels one over-budget subtree
            caps = [self.tables[t].capacity
                    for t in _scan_tables(stage) if t in self.tables]
            if not caps:
                break
            peak = plan_peak_bytes(stage, max(caps))
            budget = device_budget_bytes()
            if peak <= budget:
                break
            target = _find_stream_agg(stage, self.tables)
            if target is not None:
                agg, table = target
                stage = self._tiled_rewrite(stage, agg, table, temp_names,
                                            presteps)
                continue
            from datafusion_comet_tpu.exec.grace import (
                GRACE_MAX_PARTITIONS, GraceJoinRunner, find_grace_join,
                plan_grace_downstream)

            gj = find_grace_join(stage, self.tables, budget)
            if gj is not None:
                jcaps = [self.tables[t].capacity for t in _scan_tables(gj)
                         if t in self.tables]
                jpeak = plan_peak_bytes(gj, max(jcaps) if jcaps else max(caps))
                K = 2
                while K * (budget // 2) < jpeak and K < GRACE_MAX_PARTITIONS:
                    K *= 2
                # push the stage's aggregate (and a partition-local top-K)
                # into the per-pair programs where valid: no program then
                # ever runs at union scale (partition-wise aggregation)
                ds = plan_grace_downstream(stage, gj)
                runner = GraceJoinRunner(self, gj, K, temp_names,
                                         stage=stage, downstream=ds)
                temp_names.append(runner.tmp)
                runner()  # first (compiling) run registers the temp table
                presteps.append(runner)
                scan = P.Scan(runner.tmp, runner.out_schema)
                scan.schema = runner.out_schema
                if ds is None:
                    stage = (scan if gj is stage
                             else _replace_child_pure_deep(stage, gj, scan))
                elif ds[0] == "partial":
                    agg = ds[1]
                    stage = (scan if agg is stage
                             else _replace_child_pure_deep(stage, agg, scan))
                elif isinstance(stage, P.Sort):
                    # local under a top-K root: re-apply the sort globally
                    # (order + skip) over the union of per-pair top-Ks
                    stage = _replace_child_pure(
                        stage, stage.children()[0], scan)
                else:
                    # local with the agg at (or near) the stage root: the
                    # union of per-pair outputs IS the stage output
                    stage = scan
                continue
            import warnings

            warnings.warn(
                f"stage peak estimate {peak >> 20} MiB exceeds HBM budget "
                f"{budget >> 20} MiB and has no streamable aggregate or "
                "partitionable join; proceeding (estimate is conservative)")
            break
        return stage, presteps

    def _tiled_rewrite(self, stage, agg, table, temp_names, presteps):
        from datafusion_comet_tpu.exec.memory import plan_tiles
        from datafusion_comet_tpu.exec.streaming import TiledAggregator

        batch = self.tables[table]
        tiles_n = max(plan_tiles(agg, batch.capacity), 1)
        # capacities are powers of two: snap the tile count to a power of two
        # no larger than capacity/8 so slices divide exactly
        tiles_n = 1 << max(int(tiles_n - 1).bit_length(), 0)
        tiles_n = min(tiles_n, max(batch.capacity // 8, 1))
        tile_cap = max(batch.capacity // tiles_n, 8)
        tmp = f"__budget{next(self._stage_ids)}"
        temp_names.append(tmp)
        aggregator = TiledAggregator(agg, table)

        def prestep():
            b = self.tables[table]
            self.tables[tmp] = aggregator.run(_slice_tiles(b, tile_cap))

        prestep()
        presteps.append(prestep)
        result = self.tables[tmp]
        scan = P.Scan(tmp, result.schema)
        scan.schema = result.schema
        if agg is stage:
            return scan
        return _replace_child_pure_deep(stage, agg, scan)

    def _prepare_subtree(self, sub: P.PlanNode, temp_names: List[str]):
        """Budget-planned compile of a subplan (grace-join children recurse
        through here); returns (first executed batch, re-run fn)."""
        sub2, presteps = self._budget_plan(sub, temp_names)
        out, fn = self._execute_retry(sub2, return_fn=True)

        def rerun() -> Batch:
            for p in presteps:
                p()
            o, _ = fn(self.tables)
            return o

        return out, rerun

    def _execute_retry(self, plan: P.PlanNode, return_fn: bool = False):
        fanout = self.join_fanout
        scale = 1
        for attempt in range(self.max_join_retries):
            bound, fn = self.compile(plan, join_fanout=fanout, agg_scale=scale,
                                     unique_join_ok=(attempt == 0))
            out, overflowed = fn(self.tables)
            if not bool(overflowed):
                return (out, fn) if return_fn else out
            fanout *= 4
            scale *= 4  # aggregate group capacity grows with the same loop
        raise JoinOverflowError(
            f"join fan-out/group capacity exceeded after {self.max_join_retries} retries"
        )

    def _split_stages(
        self,
        plan: P.PlanNode,
        max_joins: int,
        stages: List[Tuple[Optional[str], P.PlanNode]],
    ) -> P.PlanNode:
        """Bottom-up pure rewrite: wherever a node's program would hold more
        than ``max_joins`` joins, its join-carrying children become their own
        stages (appended to ``stages``) replaced by temp-table scans. No
        execution happens here; the caller's plan tree is never mutated."""
        kids = [self._split_stages(c, max_joins, stages) for c in plan.children()]
        for old, new in zip(plan.children(), kids):
            if old is not new:
                plan = _replace_child_pure(plan, old, new)
        kids = list(plan.children())
        total = sum(_count_joins(k) for k in kids) + int(_is_join(plan))
        if total <= max_joins:
            return plan
        # split off join-heaviest children first until the program fits
        order = sorted(kids, key=_count_joins, reverse=True)
        for child in order:
            if total <= max_joins or _count_joins(child) == 0:
                break
            name = f"__stage{next(self._stage_ids)}"
            stages.append((name, child))
            scan = P.Scan(name, child.schema)
            scan.schema = child.schema
            plan = _replace_child_pure(plan, child, scan)
            total -= _count_joins(child)
        return plan

    def collect(self, plan: P.PlanNode) -> Dict[str, np.ndarray]:
        return to_numpy(self.execute(plan))

    def validate(self, plan: P.PlanNode) -> List[str]:
        """Extended-explain support check (reference: ExtendedExplainInfo +
        withFallbackReason, CometSparkSessionExtensions.scala:301 — the
        reference tags unconvertible nodes with reasons and falls back to
        Spark; this engine has no host fallback, so the reasons surface
        up-front). Returns [] when the plan is fully supported; otherwise a
        list of human-readable reasons. The plan is traced abstractly
        (jax.eval_shape) — no device execution, no compile."""
        try:
            bound = P.bind_plan(plan) if _needs_bind(plan) else plan
        except (NotImplementedError, KeyError, TypeError, AssertionError) as e:
            return [f"planning: {type(e).__name__}: {e}"]
        gate = REG.gate_reasons(bound)
        if gate:
            return gate
        sub_values = {
            sid: (None, False) for sid in self._subqueries
        }  # placeholders: validation must not execute subqueries

        def fn(tables):
            out = run_plan(bound, tables, EvalContext(subquery_values=sub_values), [], self.join_fanout)
            return out.row_mask

        try:
            jax.eval_shape(fn, self.tables)
        except NotImplementedError as e:
            return [f"unsupported: {e}"]
        except Exception as e:  # shape/type mismatches etc.
            return [f"invalid: {type(e).__name__}: {e}"]
        return []

    # -- observability -------------------------------------------------------------
    def explain(self, plan: P.PlanNode, with_metrics: bool = False,
                profile_ops: bool = False, as_tree: bool = False):
        """Render the plan tree; with_metrics executes it and annotates
        per-operator output row counts plus static output capacity/HBM bytes
        (reference: CometMetricNode + spark.comet.explain.native.enabled,
        jni_api.rs:811). profile_ops additionally compiles each subtree as
        its own program and reports MARGINAL per-operator wall-clock
        (subtree time minus children subtree times) — the fused-engine
        analog of the reference's per-operator elapsed counters
        (metrics/utils.rs:30); expensive (one compile per node), diagnostic
        use only. as_tree returns the MetricsNode instead of a string."""
        from datafusion_comet_tpu.observability.metrics import (
            MetricsCollector,
            build_metrics_tree,
        )
        from datafusion_comet_tpu.observability.trace import with_trace

        bound = P.bind_plan(plan) if _needs_bind(plan) else plan
        tree = build_metrics_tree(bound)
        if not with_metrics:
            return tree if as_tree else tree.render()
        names_box: List[int] = []
        static_box: Dict[int, tuple] = {}

        def fn(tables):
            mc = MetricsCollector()
            flags: List[jax.Array] = []
            out = run_plan(bound, tables, EvalContext(), flags, self.join_fanout, mc)
            names_box.clear()
            names_box.extend(mc.names)
            static_box.update(mc.static)
            return out, tuple(mc.counts)

        import time

        with with_trace("explain_execute"):
            t0 = time.time()
            out, counts = jax.jit(fn)(self.tables)
            jax.block_until_ready(out.row_mask)
            elapsed = (time.time() - t0) * 1e3
        resolved = {nid: int(c) for nid, c in zip(names_box, counts)}
        _fill_metrics(tree, bound, resolved, static_box)
        tree.elapsed_ms = elapsed
        if profile_ops:
            self._profile_subtrees(tree, bound)
        return tree if as_tree else tree.render()

    def _profile_subtrees(self, tree, plan: P.PlanNode) -> None:
        """Per-operator marginal wall-clock: time each subtree as its own
        jitted program (warm-up + best-of-2), then subtract children."""
        import time

        def subtree_time(node: P.PlanNode) -> Optional[float]:
            def fn(tables):
                return run_plan(node, tables, EvalContext(), [], self.join_fanout).row_mask

            try:
                step = jax.jit(fn)
                jax.block_until_ready(step(self.tables))  # compile + warm
                best = float("inf")
                for _ in range(2):
                    t0 = time.time()
                    jax.block_until_ready(step(self.tables))
                    best = min(best, time.time() - t0)
                return best * 1e3
            except Exception:
                return None

        def walk(t, node) -> Optional[float]:
            mine = subtree_time(node)
            kid_total = 0.0
            for sub, child in zip(t.children, node.children()):
                kt = walk(sub, child)
                kid_total += kt or 0.0
            if mine is not None:
                t.elapsed_ms = max(mine - kid_total, 0.0)
            return mine

        walk(tree, plan)


import functools
import threading

_SHRINK_COMPILE_LOCK = threading.Lock()


@functools.partial(jax.jit, static_argnums=(1,))
def _shrink_perm(mask: jax.Array, target: int):
    """Compaction permutation: live rows first (stable), sliced to
    ``target``. ONE 3-operand sort per (capacity, target) — shared by
    every schema and query, unlike the old whole-batch variadic-payload
    compaction sort whose ~30-operand 8M-row programs took the tunnel
    compiler tens of minutes PER (schema, target) pair."""
    cap = mask.shape[0]
    iota = jnp.arange(cap, dtype=jnp.int32)
    key = (~mask).astype(jnp.int32)
    _, perm, smask = jax.lax.sort((key, iota, mask), num_keys=1,
                                  is_stable=True)
    return perm[:target], smask[:target]


@jax.jit
def _take_rows(a: jax.Array, perm: jax.Array) -> jax.Array:
    """Row-gather one buffer through the compaction permutation: jit
    caches per (shape, dtype) — every i64 column of every query shares one
    compiled program."""
    return jnp.take(a, perm, axis=0)


def _shrink_apply(b: Batch, target: int) -> Batch:
    """Apply the canonical compaction programs leaf-by-leaf (the AQE
    shrink). Semantics identical to compact_batch(b, target)[0]: stable
    live-rows-first order, capacity ``target``."""
    perm, _smask = _shrink_perm(b.row_mask, target)
    return jax.tree_util.tree_map(lambda a: _take_rows(a, perm), b)


def _needs_bind(plan: P.PlanNode) -> bool:
    return plan.schema is None


def _is_join(plan: P.PlanNode) -> bool:
    return isinstance(plan, (P.HashJoin, P.SortMergeJoin, P.BroadcastNestedLoopJoin))


def _count_joins(plan: P.PlanNode) -> int:
    # runtime-filter dense-lookup semi joins (rf_injected) are sortless
    # scatter+gather probes, not program-size drivers: counting them toward
    # the stage budget forced extra stage materializations that cost more
    # than the filter saved (TPC-H q8 r4 regression, docs/known_issues.md)
    own = int(_is_join(plan)) and not getattr(plan, "rf_injected", False)
    return int(own) + sum(_count_joins(c) for c in plan.children())


def _count_heavy(plan: P.PlanNode) -> int:
    """Heavy = operators whose XLA lowering holds big multi-operand sorts
    or capacity-multiplying blocks — the tunnel-compile cost drivers."""
    if _is_join(plan) and not getattr(plan, "rf_injected", False):
        own = 1
    elif isinstance(plan, (P.Window, P.Expand, P.Sort)):
        own = 1
    elif isinstance(plan, P.HashAggregate) and plan.group_exprs:
        own = 1
    else:
        own = 0
    return own + sum(_count_heavy(c) for c in plan.children())


# -------------------------------------------------------------------------------------
# Host-UDF staging (the C2R/R2C transition analog)
# -------------------------------------------------------------------------------------
# Some backends (the axon TPU tunnel) cannot run jax.pure_callback inside a
# compiled program. The reference faces the same boundary with JVM UDFs and
# solves it with explicit columnar<->row transitions around the foreign code
# (reference: CometColumnarToRowExec / CometSparkToColumnarExec,
# jvm_udf/mod.rs). Mirror that: split the plan at nodes holding PythonUdf
# expressions, materialize the child (jitted, on device), evaluate the UDF on
# the host once per stage, append the result as a column of a temp table,
# and continue the upper plan jitted.

_CALLBACKS_SUPPORTED: Optional[bool] = None


def _callbacks_supported() -> bool:
    global _CALLBACKS_SUPPORTED
    if _CALLBACKS_SUPPORTED is None:
        try:
            out = jax.jit(
                lambda x: jax.pure_callback(
                    lambda a: np.asarray(a), jax.ShapeDtypeStruct((), jnp.int32), x
                )
            )(jnp.int32(3))
            _CALLBACKS_SUPPORTED = int(out) == 3
        except Exception:
            _CALLBACKS_SUPPORTED = False
    return _CALLBACKS_SUPPORTED


def _expr_udfs(e: E.Expr, out: List[E.PythonUdf]) -> None:
    if isinstance(e, E.PythonUdf):
        out.append(e)
        return  # nested UDFs inside UDF args are evaluated by the same stage
    for c in e.children():
        _expr_udfs(c, out)


def _node_own_exprs(plan: P.PlanNode) -> List[E.Expr]:
    if isinstance(plan, P.Projection):
        return list(plan.exprs)
    if isinstance(plan, P.Filter):
        return [plan.predicate]
    out: List[E.Expr] = []
    for f in dataclasses.fields(plan):
        v = getattr(plan, f.name, None)
        if isinstance(v, E.Expr):
            out.append(v)
        elif isinstance(v, tuple):
            out += [x for x in v if isinstance(x, E.Expr)]
    return out


def _contains_map_in_batch(plan: P.PlanNode) -> bool:
    if isinstance(plan, P.MapInBatch):
        return True
    return any(_contains_map_in_batch(c) for c in plan.children())


def _plan_has_udf(plan: P.PlanNode) -> bool:
    if isinstance(plan, P.MapInBatch):
        return True
    box: List[E.PythonUdf] = []
    for e in _node_own_exprs(plan):
        _expr_udfs(e, box)
    if box:
        return True
    return any(_plan_has_udf(c) for c in plan.children())


def _replace_child_pure(plan: P.PlanNode, old: P.PlanNode, new: P.PlanNode) -> P.PlanNode:
    """Non-mutating child replacement (shallow node copy): staged plans must
    not alter the caller's plan tree — stage temp tables are freed after
    execute, so a mutated shared tree would dangle on re-execution."""
    import copy

    cp = copy.copy(plan)
    for f in dataclasses.fields(cp):
        v = getattr(cp, f.name, None)
        if v is old:
            setattr(cp, f.name, new)
        elif isinstance(v, tuple) and any(x is old for x in v):
            setattr(cp, f.name, tuple(new if x is old else x for x in v))
    return cp


def _apply_orderings(plan: P.PlanNode) -> P.PlanNode:
    """Order-propagation consumers (reference: DataFusion output_ordering /
    EquivalenceProperties): delete Sort nodes whose child already delivers
    the requested ordering (a Sort with fetch becomes a Limit), and flag
    SortMergeJoins whose build child is pre-sorted on the join keys so the
    executor takes the merge path (skips its build-side key sort)."""
    from datafusion_comet_tpu.ir.ordering import (
        order_key_name, ordering_satisfies, out_ordering)

    kids = [(_apply_orderings(c), c) for c in plan.children()]
    for new, old in kids:
        if new is not old:
            plan = _replace_child_pure(plan, old, new)

    if isinstance(plan, P.Sort):
        child = plan.child
        want = []
        for o in plan.orders:
            name = order_key_name(o.child, child.schema)
            if name is None:
                return plan
            want.append((name, o.ascending, o.resolved_nulls_first()))
        if ordering_satisfies(out_ordering(child), want):
            if plan.fetch is None and not plan.skip:
                return child
            out = P.Limit(child, plan.fetch or (1 << 62), plan.skip)
            out.schema = child.schema
            return out
        return plan

    if isinstance(plan, P.SortMergeJoin):
        build = _smj_build_side(plan)
        bchild = plan.right if build == "right" else plan.left
        bkeys = plan.right_keys if build == "right" else plan.left_keys
        want = []
        for k in bkeys:
            name = order_key_name(k, bchild.schema)
            if name is None:
                return plan
            # merge path needs non-null keys first and ascending; a
            # nulls-last (or non-nullable) ascending ordering delivers that
            want.append((name, True, False))
        if ordering_satisfies(out_ordering(bchild), want):
            plan.presorted_build = True
    return plan


def _replace_child_pure_deep(plan: P.PlanNode, old: P.PlanNode, new: P.PlanNode) -> P.PlanNode:
    """Non-mutating replacement of ``old`` anywhere in the tree."""
    if plan is old:
        return new
    kids = [(_replace_child_pure_deep(c, old, new), c) for c in plan.children()]
    out = plan
    for repl, orig in kids:
        if repl is not orig:
            out = _replace_child_pure(out, orig, repl)
    return out


def _scan_tables(plan: P.PlanNode) -> List[str]:
    out: List[str] = []
    if isinstance(plan, P.Scan):
        out.append(plan.table)
    for c in plan.children():
        out.extend(_scan_tables(c))
    return out


_ROW_PRESERVING = (P.Filter, P.Projection, P.Expand, P.Sample)


def _find_stream_agg(plan: P.PlanNode, tables) -> Optional[Tuple[P.PlanNode, str]]:
    """Largest streamable aggregate subtree: HashAggregate(SINGLE) whose
    input is a filter/project/expand/sample pipeline over exactly one Scan
    of a resident table (the exec/streaming.py contract)."""
    best: Optional[Tuple[P.PlanNode, str, int]] = None

    def subtree_scan(p) -> Optional[str]:
        if isinstance(p, P.Scan):
            return p.table
        if not isinstance(p, _ROW_PRESERVING):
            return None
        return subtree_scan(p.children()[0])

    def walk(p):
        nonlocal best
        if (isinstance(p, P.HashAggregate) and p.mode == P.AggMode.SINGLE):
            t = subtree_scan(p.child)
            if t is not None and t in tables:
                cap = tables[t].capacity
                if best is None or cap > best[2]:
                    best = (p, t, cap)
                return  # don't descend into a chosen subtree
        for c in p.children():
            walk(c)

    walk(plan)
    return (best[0], best[1]) if best else None


def _slice_cv(cv, lo: int, cap: int):
    return dataclasses.replace(
        cv,
        data=cv.data[lo:lo + cap],
        validity=cv.validity[lo:lo + cap],
        lengths=None if cv.lengths is None else cv.lengths[lo:lo + cap],
        children=tuple(_slice_cv(c, lo, cap) for c in cv.children),
    )


def _slice_tiles(batch: Batch, tile_cap: int):
    """Device-side tile slices of a resident batch (shared dictionaries and
    decimal bounds carry over, so tiles stay mutually comparable)."""
    for lo in range(0, batch.capacity, tile_cap):
        cols = tuple(_slice_cv(c, lo, tile_cap) for c in batch.columns)
        yield Batch(cols, batch.row_mask[lo:lo + tile_cap], batch.schema)


def _replace_child(plan: P.PlanNode, old: P.PlanNode, new: P.PlanNode) -> P.PlanNode:
    for f in dataclasses.fields(plan):
        v = getattr(plan, f.name, None)
        if v is old:
            setattr(plan, f.name, new)
        elif isinstance(v, tuple) and any(x is old for x in v):
            setattr(plan, f.name, tuple(new if x is old else x for x in v))
    return plan


def _rewrite_expr(e: E.Expr, mapping: Dict[int, str]) -> E.Expr:
    if id(e) in mapping:
        return E.ColumnRef(mapping[id(e)])
    if not e.children():
        return e

    def rw(v):
        if isinstance(v, E.Expr):
            return _rewrite_expr(v, mapping)
        if isinstance(v, tuple):
            return tuple(rw(x) for x in v)
        return v

    kwargs = {
        f.name: rw(getattr(e, f.name)) for f in dataclasses.fields(e) if f.init
    }
    return type(e)(**kwargs)


def _fill_metrics(tree, plan: P.PlanNode, resolved: Dict[int, int],
                  static: Optional[Dict[int, tuple]] = None) -> None:
    if id(plan) in resolved:
        tree.output_rows = resolved[id(plan)]
    if static and id(plan) in static:
        tree.capacity, tree.output_bytes = static[id(plan)]
    for sub, child in zip(tree.children, plan.children()):
        _fill_metrics(sub, child, resolved, static)
