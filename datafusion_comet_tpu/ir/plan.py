"""Operator plan IR: the engine-agnostic physical plan tree.

The analog of the reference's ``Operator`` proto oneof (19 operators,
reference: native/proto/src/proto/operator.proto:49-69) consumed by the
native planner (planner.rs:1202 ``create_plan``). Plans are built unbound,
then ``bind()`` resolves expressions bottom-up and computes output schemas —
the responsibility split the reference keeps between QueryPlanSerde (JVM)
and PhysicalPlanner (native).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.ir import expr as E

__all__ = [
    "PlanNode",
    "Scan",
    "Filter",
    "Projection",
    "HashAggregate",
    "AggMode",
    "Sort",
    "Limit",
    "Expand",
    "HashJoin",
    "SortMergeJoin",
    "BroadcastNestedLoopJoin",
    "JoinType",
    "Window",
    "Explode",
    "MapInBatch",
    "Sample",
    "ShuffleExchange",
    "Union",
    "bind_plan",
]


class JoinType:
    INNER = "inner"
    LEFT = "left"
    RIGHT = "right"
    FULL = "full"
    LEFT_SEMI = "left_semi"
    LEFT_ANTI = "left_anti"
    # null-aware anti join (NOT IN semantics, reference planner.rs:2175-2184)
    LEFT_ANTI_NULL_AWARE = "left_anti_null_aware"
    EXISTENCE = "existence"


class AggMode:
    """Reference: operator.proto:480-484 AggregateMode + planner.rs:1239."""

    PARTIAL = "partial"
    FINAL = "final"
    PARTIAL_MERGE = "partial_merge"
    SINGLE = "single"  # convenience: partial+final in one step (no exchange)


@dataclasses.dataclass
class PlanNode:
    """Base plan node; ``schema`` is populated by bind_plan."""

    schema: Optional[T.Schema] = dataclasses.field(default=None, init=False)

    def children(self) -> Tuple["PlanNode", ...]:
        return ()

    # plan-construction sugar ----------------------------------------------------
    def filter(self, predicate: E.Expr) -> "Filter":
        return Filter(self, predicate)

    def project(self, exprs: Sequence[E.Expr]) -> "Projection":
        return Projection(self, tuple(exprs))

    def aggregate(self, group_by, aggs, mode: str = AggMode.SINGLE) -> "HashAggregate":
        return HashAggregate(self, tuple(group_by), tuple(aggs), mode)

    def sort(self, orders, fetch: Optional[int] = None) -> "Sort":
        return Sort(self, tuple(orders), fetch)

    def limit(self, n: int, offset: int = 0) -> "Limit":
        return Limit(self, n, offset)


def _plan(cls):
    return dataclasses.dataclass(cls)


@_plan
class Scan(PlanNode):
    """Leaf: reads a named table (in-memory or file-backed via io/).
    Reference analog: ScanExec (scan.rs:46) / NativeScan (planner.rs:1514)."""

    table: str
    source_schema: T.Schema
    projection: Optional[Tuple[str, ...]] = None

    def out_schema(self) -> T.Schema:
        if self.projection is None:
            return self.source_schema
        return T.Schema([self.source_schema.field(n) for n in self.projection])


@_plan
class Filter(PlanNode):
    child: PlanNode
    predicate: E.Expr

    def children(self):
        return (self.child,)


@_plan
class Projection(PlanNode):
    child: PlanNode
    exprs: Tuple[E.Expr, ...]

    def children(self):
        return (self.child,)


@_plan
class HashAggregate(PlanNode):
    """Group-by aggregation. Output schema: group columns then aggregate
    columns (reference contract: operator.proto:398-413; result expressions
    are a separate Projection above, planner.rs:1370)."""

    child: PlanNode
    group_exprs: Tuple[E.Expr, ...]
    agg_exprs: Tuple[E.AggExpr, ...]
    mode: str = AggMode.SINGLE
    # static group capacity; None = derive from table stats at execution
    # (exec/stats.py); the engine re-plans on overflow either way
    max_groups: Optional[int] = None

    def children(self):
        return (self.child,)


@_plan
class Sort(PlanNode):
    """Total sort with optional fetch (top-K) and skip
    (reference: planner.rs:1479-1512)."""

    child: PlanNode
    orders: Tuple[E.SortOrder, ...]
    fetch: Optional[int] = None
    skip: int = 0

    def children(self):
        return (self.child,)


@_plan
class Limit(PlanNode):
    child: PlanNode
    limit: int
    offset: int = 0

    def children(self):
        return (self.child,)


@_plan
class CollectLimit(PlanNode):
    """Hybrid-sink limit (reference: CometCollectLimitExec — the JVM-side
    collect-limit node): returns the first ``limit`` rows after ``offset``.
    Binds to the same executor as Limit; exists as its own node for plan
    API/serde parity with the reference's operator set."""

    child: PlanNode
    limit: int
    offset: int = 0

    def children(self):
        return (self.child,)


@_plan
class TakeOrderedAndProject(PlanNode):
    """Hybrid-sink top-k (reference: CometTakeOrderedAndProjectExec): sort
    by ``orders``, keep ``limit`` rows from ``offset``, project ``exprs``.
    Lowered at bind time to Sort(fetch)+Projection — the single-exchange
    gathered-sort path the distributed planner already produces."""

    child: PlanNode
    orders: Tuple[E.SortOrder, ...]
    limit: int
    exprs: Tuple[E.Expr, ...] = ()  # empty = no projection (pass through)
    offset: int = 0

    def children(self):
        return (self.child,)


@_plan
class Expand(PlanNode):
    """Each input row produces len(projections) output rows (reference:
    operators/expand.rs; used for ROLLUP/CUBE/grouping sets)."""

    child: PlanNode
    projections: Tuple[Tuple[E.Expr, ...], ...]
    names: Tuple[str, ...]

    def children(self):
        return (self.child,)


@_plan
class HashJoin(PlanNode):
    """Hash join; build side replicated (broadcast) or co-partitioned
    (reference: planner.rs:2161-2233)."""

    left: PlanNode
    right: PlanNode
    left_keys: Tuple[E.Expr, ...]
    right_keys: Tuple[E.Expr, ...]
    join_type: str = JoinType.INNER
    build_side: str = "right"  # left|right
    condition: Optional[E.Expr] = None  # extra non-equi filter

    def children(self):
        return (self.left, self.right)


@_plan
class SortMergeJoin(PlanNode):
    """Reference: planner.rs:2095-2160 (timestamps stripped of tz for the
    comparator, optional join filter)."""

    left: PlanNode
    right: PlanNode
    left_keys: Tuple[E.Expr, ...]
    right_keys: Tuple[E.Expr, ...]
    join_type: str = JoinType.INNER
    condition: Optional[E.Expr] = None

    def children(self):
        return (self.left, self.right)


@_plan
class BroadcastNestedLoopJoin(PlanNode):
    left: PlanNode
    right: PlanNode
    join_type: str = JoinType.INNER
    condition: Optional[E.Expr] = None

    def children(self):
        return (self.left, self.right)


@_plan
class Window(PlanNode):
    """Window operator (reference: CometWindowExec.scala:41, planner.rs:2236)."""

    child: PlanNode
    window_exprs: Tuple[E.WindowExpr, ...]

    def children(self):
        return (self.child,)


@_plan
class Explode(PlanNode):
    """Generate one output row per array/map element (reference:
    native/core/src/execution/operators/explode — planner.rs:1918). Static
    shape: output capacity = child capacity × max_elems; absent slots stay
    masked. ``pos`` adds a 0-based position column (posexplode); ``outer``
    keeps a null row for empty/null inputs."""

    child: PlanNode
    expr: E.Expr
    outer: bool = False
    pos: bool = False

    def children(self):
        return (self.child,)


@_plan
class MapInBatch(PlanNode):
    """Apply a host Python function to whole materialized batches (reference:
    CometMapInBatchExec.scala:45 — the Arrow pandas-UDF operator: batches
    cross to the foreign runtime, are transformed, and re-enter columnar
    execution). ``fn`` receives a pandas DataFrame of the child's live rows
    and returns a DataFrame matching ``out_fields``. Always executes as a
    staged host transition (the C2R/R2C discipline)."""

    child: PlanNode
    fn: object  # Callable[[pandas.DataFrame], pandas.DataFrame]
    out_fields: Tuple[T.Field, ...]

    def children(self):
        return (self.child,)


@_plan
class Sample(PlanNode):
    """Bernoulli sample (reference: planner.rs:1461, nondetermenistic_funcs
    bernoulli sampler)."""

    child: PlanNode
    lower_bound: float
    upper_bound: float
    with_replacement: bool
    seed: int

    def children(self):
        return (self.child,)


@_plan
class ShuffleExchange(PlanNode):
    """Repartition by hash/range/round-robin/single (reference:
    partitioning.proto:29-36, shuffle_writer.rs:52). On TPU this lowers to
    an all-to-all over the device mesh (parallel/shuffle.py)."""

    child: PlanNode
    partitioning: str  # hash|range|round_robin|single
    keys: Tuple[E.Expr, ...] = ()
    num_partitions: int = 0  # 0 = mesh size
    sort_orders: Tuple[E.SortOrder, ...] = ()  # for range partitioning

    def children(self):
        return (self.child,)


@_plan
class Union(PlanNode):
    inputs: Tuple[PlanNode, ...] = ()

    def children(self):
        return self.inputs


# -------------------------------------------------------------------------------------
# Binding
# -------------------------------------------------------------------------------------


def _expr_nullable(e: E.Expr, schema: T.Schema) -> bool:
    """Conservative bind-time nullability: False only when provably
    non-null (drives sort-order propagation — a non-nullable order key
    satisfies any NULLS FIRST/LAST placement)."""
    if isinstance(e, E.Alias):
        return _expr_nullable(e.child, schema)
    if isinstance(e, E.BoundRef):
        return schema.fields[e.index].nullable
    if isinstance(e, E.ColumnRef):
        for f in schema.fields:
            if f.name == e.name:
                return f.nullable
        return True
    if isinstance(e, E.Literal):
        return e.value is None
    return True


# planner-hint attributes set outside the dataclass fields (stats-derived
# capacities, runtime-filter metadata). bind_plan rebuilds nodes, so these
# must be copied forward explicitly or silently vanish (the round-4
# rf_dense_range loss bug).
HINT_ATTRS = (
    "out_rows_hint", "rf_dense_range", "build_key_range", "key_pack",
    "fanout_hint", "unique_build_hint", "cond_col_ranges",
    "presorted_build", "group_key_ranges", "rf_injected",
)


def bind_plan(plan: PlanNode) -> PlanNode:
    """Bottom-up: bind expressions against child schemas, compute output
    schemas. Mutates ``schema`` slots in place and returns new nodes with
    bound expressions; planner-hint attributes (HINT_ATTRS) carry over."""
    out = _bind_plan_impl(plan)
    if out is not plan:
        for a in HINT_ATTRS:
            v = getattr(plan, a, None)
            if v is not None and getattr(out, a, None) is None:
                setattr(out, a, v)
    return out


def _bind_plan_impl(plan: PlanNode) -> PlanNode:
    if isinstance(plan, Scan):
        plan.schema = plan.out_schema()
        return plan
    kids = [bind_plan(c) for c in plan.children()]
    if isinstance(plan, Filter):
        child = kids[0]
        pred = E.bind(plan.predicate, child.schema)
        out = Filter(child, pred)
        out.schema = child.schema
        return out
    if isinstance(plan, Projection):
        child = kids[0]
        exprs = tuple(E.bind(x, child.schema) for x in plan.exprs)
        out = Projection(child, exprs)
        out.schema = T.Schema(
            [T.Field(x.name, x.dtype, _expr_nullable(x, child.schema)) for x in exprs])
        return out
    if isinstance(plan, HashAggregate):
        child = kids[0]
        if plan.mode == AggMode.SINGLE and any(
            a.func == E.AggFunc.COUNT_DISTINCT for a in plan.agg_exprs
        ):
            return _rewrite_distinct(plan)
        groups = tuple(E.bind(g, child.schema) for g in plan.group_exprs)
        if plan.mode in (AggMode.FINAL, AggMode.PARTIAL_MERGE):
            # children were bound against the pre-exchange input schema when
            # the partial stage was planned; the merge stage reads state
            # columns by name and only uses a.child for result typing
            # (reference: planner.rs:1282 initial_input_buffer_offset).
            aggs = plan.agg_exprs
        else:
            aggs = tuple(
                dataclasses.replace(
                    a,
                    child=E.bind(a.child, child.schema) if a.child is not None else None,
                    filter=E.bind(a.filter, child.schema) if a.filter is not None else None,
                    extra=tuple(E.bind(x, child.schema) for x in a.extra),
                )
                for a in plan.agg_exprs
            )
        out = HashAggregate(child, groups, aggs, plan.mode, plan.max_groups)
        fields = [T.Field(g.name, g.dtype, _expr_nullable(g, child.schema))
                  for g in groups]
        if plan.mode in (AggMode.SINGLE, AggMode.FINAL):
            fields += [T.Field(a.out_name, a.result_dtype()) for a in aggs]
        else:
            # partial modes emit state columns
            from datafusion_comet_tpu.exec.operators import aggregate as AGG

            for a in aggs:
                fields += AGG.state_fields(a)
        out.schema = T.Schema(fields)
        return out
    if isinstance(plan, Sort):
        child = kids[0]
        orders = tuple(
            dataclasses.replace(o, child=E.bind(o.child, child.schema)) for o in plan.orders
        )
        out = Sort(child, orders, plan.fetch, plan.skip)
        out.schema = child.schema
        return out
    if isinstance(plan, Limit):
        out = Limit(kids[0], plan.limit, plan.offset)
        out.schema = kids[0].schema
        return out
    if isinstance(plan, CollectLimit):
        out = Limit(kids[0], plan.limit, plan.offset)
        out.schema = kids[0].schema
        return out
    if isinstance(plan, TakeOrderedAndProject):
        child = kids[0]
        srt = bind_plan(Sort(child, plan.orders, plan.limit, plan.offset))
        if not plan.exprs:
            return srt
        return bind_plan(Projection(srt, plan.exprs))
    if isinstance(plan, Expand):
        child = kids[0]
        projections = tuple(
            tuple(E.bind(x, child.schema) for x in proj) for proj in plan.projections
        )
        out = Expand(child, projections, plan.names)
        out.schema = T.Schema(
            [T.Field(n, x.dtype) for n, x in zip(plan.names, projections[0])]
        )
        return out
    if isinstance(plan, (HashJoin, SortMergeJoin)):
        left, right = kids
        lkeys = tuple(E.bind(k, left.schema) for k in plan.left_keys)
        rkeys = tuple(E.bind(k, right.schema) for k in plan.right_keys)
        joined = _join_schema(left.schema, right.schema, plan.join_type)
        cond = E.bind(plan.condition, joined) if plan.condition is not None else None
        cls = type(plan)
        out = cls(left, right, lkeys, rkeys, plan.join_type, **(
            {"build_side": plan.build_side, "condition": cond}
            if isinstance(plan, HashJoin)
            else {"condition": cond}
        ))
        out.schema = _join_out_schema(left.schema, right.schema, plan.join_type)
        return out
    if isinstance(plan, BroadcastNestedLoopJoin):
        left, right = kids
        joined = _join_schema(left.schema, right.schema, plan.join_type)
        cond = E.bind(plan.condition, joined) if plan.condition is not None else None
        out = BroadcastNestedLoopJoin(left, right, plan.join_type, cond)
        out.schema = _join_out_schema(left.schema, right.schema, plan.join_type)
        return out
    if isinstance(plan, Window):
        child = kids[0]
        wexprs = tuple(
            dataclasses.replace(
                w,
                child=E.bind(w.child, child.schema) if w.child is not None else None,
                partition_by=tuple(E.bind(p, child.schema) for p in w.partition_by),
                order_by=tuple(
                    dataclasses.replace(o, child=E.bind(o.child, child.schema))
                    for o in w.order_by
                ),
                default=E.bind(w.default, child.schema) if w.default is not None else None,
            )
            for w in plan.window_exprs
        )
        out = Window(child, wexprs)
        from datafusion_comet_tpu.exec.operators import window as W

        out.schema = T.Schema(
            list(child.schema.fields)
            + [T.Field(w.out_name, W.result_dtype(w)) for w in wexprs]
        )
        return out
    if isinstance(plan, Explode):
        child = kids[0]
        ex = E.bind(plan.expr, child.schema)
        out = Explode(child, ex, plan.outer, plan.pos)
        gen_fields = []
        if plan.pos:
            gen_fields.append(T.Field("pos", T.INT32))
        if ex.dtype.is_map:
            gen_fields += [
                T.Field("key", ex.dtype.key_type),
                T.Field("value", ex.dtype.value_type),
            ]
        else:
            assert ex.dtype.is_list, f"explode over {ex.dtype!r}"
            gen_fields.append(T.Field("col", ex.dtype.element))
        out.schema = T.Schema(list(child.schema.fields) + gen_fields)
        return out
    if isinstance(plan, MapInBatch):
        out = MapInBatch(kids[0], plan.fn, plan.out_fields)
        out.schema = T.Schema(list(plan.out_fields))
        return out
    if isinstance(plan, Sample):
        out = Sample(kids[0], plan.lower_bound, plan.upper_bound, plan.with_replacement, plan.seed)
        out.schema = kids[0].schema
        return out
    if isinstance(plan, ShuffleExchange):
        child = kids[0]
        keys = tuple(E.bind(k, child.schema) for k in plan.keys)
        orders = tuple(
            dataclasses.replace(o, child=E.bind(o.child, child.schema)) for o in plan.sort_orders
        )
        out = ShuffleExchange(child, plan.partitioning, keys, plan.num_partitions, orders)
        out.schema = child.schema
        return out
    if isinstance(plan, Union):
        out = Union(tuple(kids))
        out.schema = kids[0].schema
        return out
    if getattr(plan, "schema", None) is not None and hasattr(plan, "with_children"):
        # extension node (registered via exec.registry.OPERATORS): the node
        # declares its own output schema and rebuilds itself over bound kids
        out = plan.with_children(tuple(kids))
        out.schema = plan.schema
        return out
    raise NotImplementedError(f"bind_plan: {type(plan).__name__}")


def _rewrite_distinct(plan: HashAggregate) -> PlanNode:
    """COUNT(DISTINCT x) → two-level aggregate: dedup on (groups, x) then
    COUNT(x). Supported when every aggregate is a distinct over the same
    child expression (the TPC-H Q16 shape); mixed distinct/plain aggregates
    need the Expand-based plan (reference: Spark's RewriteDistinctAggregates)
    — planned."""
    distinct = [a for a in plan.agg_exprs if a.func == E.AggFunc.COUNT_DISTINCT]
    plain = [a for a in plan.agg_exprs if a.func != E.AggFunc.COUNT_DISTINCT]
    if plain:
        raise NotImplementedError("mixed DISTINCT and plain aggregates")
    first_child = distinct[0].child
    for a in distinct[1:]:
        if repr(a.child) != repr(first_child):
            raise NotImplementedError("multiple different DISTINCT columns")
    dname = "__distinct_key"
    inner = HashAggregate(
        plan.child,
        plan.group_exprs + (E.Alias(first_child, dname),),
        (),
        AggMode.SINGLE,
        plan.max_groups,
    )
    outer = HashAggregate(
        inner,
        tuple(E.col(g.name) if not isinstance(g, E.BoundRef) else E.col(g.col_name) for g in plan.group_exprs),
        tuple(
            E.AggExpr(E.AggFunc.COUNT, E.col(dname), a.out_name, filter=None)
            for a in distinct
        ),
        AggMode.SINGLE,
        plan.max_groups,
    )
    return bind_plan(outer)


def _join_schema(ls: T.Schema, rs: T.Schema, join_type: str) -> T.Schema:
    return T.Schema(list(ls.fields) + list(rs.fields))


def _join_out_schema(ls: T.Schema, rs: T.Schema, join_type: str) -> T.Schema:
    if join_type in (JoinType.LEFT_SEMI, JoinType.LEFT_ANTI, JoinType.LEFT_ANTI_NULL_AWARE):
        return ls
    if join_type == JoinType.EXISTENCE:
        return T.Schema(list(ls.fields) + [T.Field("exists", T.BOOL)])
    return T.Schema(list(ls.fields) + list(rs.fields))
