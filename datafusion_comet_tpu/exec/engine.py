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
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P

__all__ = ["Session", "run_plan", "JoinOverflowError"]


class JoinOverflowError(RuntimeError):
    pass


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
    out = _exec(plan, tables, ctx, flags, join_fanout, metrics)
    return out


def _exec(plan, tables, ctx, flags, fanout, metrics=None) -> Batch:
    out = _exec_inner(plan, tables, ctx, flags, fanout, metrics)
    if metrics is not None:
        metrics.record(plan, out)
    return out


def _exec_inner(plan, tables, ctx, flags, fanout, metrics=None) -> Batch:
    if isinstance(plan, P.Scan):
        b = tables[plan.table]
        if plan.projection is not None:
            idx = [b.schema.index_of(n) for n in plan.projection]
            b = b.select(idx, plan.schema)
        return b
    if isinstance(plan, P.Filter):
        return B.filter_op(_exec(plan.child, tables, ctx, flags, fanout, metrics), plan.predicate, ctx)
    if isinstance(plan, P.Projection):
        return B.project_op(_exec(plan.child, tables, ctx, flags, fanout, metrics), plan.exprs, plan.schema, ctx)
    if isinstance(plan, P.HashAggregate):
        child = _exec(plan.child, tables, ctx, flags, fanout, metrics)
        return AGG.hash_aggregate(
            child, plan.group_exprs, plan.agg_exprs, plan.mode, plan.max_groups, plan.schema, ctx
        )
    if isinstance(plan, P.Sort):
        return B.sort_op(_exec(plan.child, tables, ctx, flags, fanout, metrics), plan.orders, plan.fetch, plan.skip, ctx)
    if isinstance(plan, P.Limit):
        return B.limit_op(_exec(plan.child, tables, ctx, flags, fanout, metrics), plan.limit, plan.offset)
    if isinstance(plan, P.Expand):
        return B.expand_op(_exec(plan.child, tables, ctx, flags, fanout, metrics), plan.projections, plan.schema, ctx)
    if isinstance(plan, P.Explode):
        return B.explode_op(
            _exec(plan.child, tables, ctx, flags, fanout, metrics),
            plan.expr, plan.schema, plan.outer, plan.pos, ctx,
        )
    if isinstance(plan, P.Sample):
        return B.sample_op(
            _exec(plan.child, tables, ctx, flags, fanout, metrics),
            plan.lower_bound,
            plan.upper_bound,
            plan.with_replacement,
            plan.seed,
            ctx.partition_id,
        )
    if isinstance(plan, (P.HashJoin, P.SortMergeJoin)):
        left = _exec(plan.left, tables, ctx, flags, fanout, metrics)
        right = _exec(plan.right, tables, ctx, flags, fanout, metrics)
        build_side = plan.build_side if isinstance(plan, P.HashJoin) else _smj_build_side(plan)
        out, ovf = J.hash_join(
            left,
            right,
            plan.left_keys,
            plan.right_keys,
            plan.join_type,
            build_side,
            plan.schema,
            plan.condition,
            max_build_matches=fanout,
            ctx=ctx,
        )
        flags.append(ovf)
        return out
    if isinstance(plan, P.BroadcastNestedLoopJoin):
        left = _exec(plan.left, tables, ctx, flags, fanout, metrics)
        right = _exec(plan.right, tables, ctx, flags, fanout, metrics)
        return J.nested_loop_join(left, right, plan.join_type, plan.schema, plan.condition, ctx)
    if isinstance(plan, P.Window):
        return W.window_op(_exec(plan.child, tables, ctx, flags, fanout, metrics), plan.window_exprs, plan.schema, ctx)
    if isinstance(plan, P.ShuffleExchange):
        # single-partition engine: exchange is identity (multi-device path in
        # parallel/shuffle.py re-lowers this node to an all-to-all)
        return _exec(plan.child, tables, ctx, flags, fanout, metrics)
    if isinstance(plan, P.Union):
        kids = [_exec(c, tables, ctx, flags, fanout, metrics) for c in plan.inputs]
        return _union(kids, plan.schema)
    raise NotImplementedError(f"exec: {type(plan).__name__}")


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

    cols = []
    for ci, f in enumerate(schema.fields):
        datas = [k.columns[ci].data for k in kids]
        vals = [k.columns[ci].validity for k in kids]
        lens = [k.columns[ci].lengths for k in kids]
        # unify string widths
        if f.dtype.is_binary:
            w = max(d.shape[1] for d in datas)
            datas = [jnp.pad(d, ((0, 0), (0, w - d.shape[1]))) if d.shape[1] < w else d for d in datas]
        cols.append(
            ColumnVector(
                jnp.concatenate(datas, axis=0),
                jnp.concatenate(vals),
                None if lens[0] is None else jnp.concatenate(lens),
                f.dtype,
            )
        )
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
        self.join_fanout = join_fanout
        self.max_join_retries = max_join_retries
        self._subqueries: Dict[int, Tuple[P.PlanNode, int]] = {}
        self._next_subquery_id = 0
        self._cache: Dict[Tuple[int, int], Callable] = {}

    # -- registration ------------------------------------------------------------
    def register_batch(self, name: str, batch: Batch) -> None:
        self.tables[name] = batch

    def register_numpy(self, name: str, data, schema: T.Schema, **kw) -> None:
        self.tables[name] = from_numpy(data, schema, **kw)

    def register_parquet(self, name: str, path: str, schema: Optional[T.Schema] = None) -> None:
        from datafusion_comet_tpu.io.parquet import read_parquet

        self.tables[name] = read_parquet(path, schema=schema)

    def table_schema(self, name: str) -> T.Schema:
        return self.tables[name].schema

    # -- scalar subqueries ---------------------------------------------------------
    def scalar_subquery(self, plan: P.PlanNode, column: int = 0) -> E.ScalarSubquery:
        """Register an uncorrelated scalar subquery: executed lazily before
        the outer plan, its single value injected at evaluation (reference:
        CometScalarSubquery / expressions/subquery.rs:38)."""
        bound = P.bind_plan(plan) if _needs_bind(plan) else plan
        sid = self._next_subquery_id
        self._next_subquery_id += 1
        self._subqueries[sid] = (bound, column)
        return E.ScalarSubquery(sid, bound.schema.fields[column].dtype)

    def _materialize_subqueries(self) -> Dict[int, Tuple[object, bool]]:
        values: Dict[int, Tuple[object, bool]] = {}
        for sid, (sub, column) in self._subqueries.items():
            out = to_numpy(self.execute(sub))
            name = sub.schema.fields[column].name
            vals = out[name]
            valid = out[name + "__valid"]
            if len(vals) == 0:
                values[sid] = (None, False)
            else:
                values[sid] = (vals[0], bool(valid[0]))
        return values

    # -- execution ---------------------------------------------------------------
    def compile(self, plan: P.PlanNode, join_fanout: Optional[int] = None):
        """Bind + jit a plan; returns (bound_plan, jitted fn(tables)->(batch, flags))."""
        bound = P.bind_plan(plan) if _needs_bind(plan) else plan
        fanout = join_fanout or self.join_fanout
        sub_values = self._materialize_subqueries() if self._subqueries else None

        def fn(tables):
            flags: List[jax.Array] = []
            ctx = EvalContext(subquery_values=sub_values)
            out = run_plan(bound, tables, ctx, flags, fanout)
            return out, (jnp.any(jnp.stack(flags)) if flags else jnp.zeros((), bool))

        return bound, jax.jit(fn)

    def execute(self, plan: P.PlanNode) -> Batch:
        """Execute with automatic join-fanout re-planning."""
        fanout = self.join_fanout
        for attempt in range(self.max_join_retries):
            bound, fn = self.compile(plan, join_fanout=fanout)
            out, overflowed = fn(self.tables)
            if not bool(overflowed):
                return out
            fanout *= 4
        raise JoinOverflowError(
            f"join fan-out exceeded {fanout} after {self.max_join_retries} retries"
        )

    def collect(self, plan: P.PlanNode) -> Dict[str, np.ndarray]:
        return to_numpy(self.execute(plan))

    # -- observability -------------------------------------------------------------
    def explain(self, plan: P.PlanNode, with_metrics: bool = False) -> str:
        """Render the plan tree; with_metrics executes it and annotates
        per-operator output row counts (reference: CometMetricNode +
        spark.comet.explain.native.enabled, jni_api.rs:811)."""
        from datafusion_comet_tpu.observability.metrics import (
            MetricsCollector,
            build_metrics_tree,
        )
        from datafusion_comet_tpu.observability.trace import with_trace

        bound = P.bind_plan(plan) if _needs_bind(plan) else plan
        tree = build_metrics_tree(bound)
        if not with_metrics:
            return tree.render()
        names_box: List[int] = []

        def fn(tables):
            mc = MetricsCollector()
            flags: List[jax.Array] = []
            out = run_plan(bound, tables, EvalContext(), flags, self.join_fanout, mc)
            names_box.clear()
            names_box.extend(mc.names)
            return out, tuple(mc.counts)

        import time

        with with_trace("explain_execute"):
            t0 = time.time()
            out, counts = jax.jit(fn)(self.tables)
            jax.block_until_ready(out.row_mask)
            elapsed = (time.time() - t0) * 1e3
        resolved = {nid: int(c) for nid, c in zip(names_box, counts)}
        _fill_metrics(tree, bound, resolved)
        tree.elapsed_ms = elapsed
        return tree.render()


def _needs_bind(plan: P.PlanNode) -> bool:
    return plan.schema is None


def _fill_metrics(tree, plan: P.PlanNode, resolved: Dict[int, int]) -> None:
    if id(plan) in resolved:
        tree.output_rows = resolved[id(plan)]
    for sub, child in zip(tree.children, plan.children()):
        _fill_metrics(sub, child, resolved)
