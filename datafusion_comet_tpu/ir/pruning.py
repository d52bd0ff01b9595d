"""Column pruning: push required-column sets down to the scans.

The reference inherits column pruning from Spark's optimizer (Catalyst
ColumnPruning → FileSourceScanExec output columns → parquet projection,
parquet_exec.rs projection vector). This engine plans for itself, so the
pass lives here: walk the UNBOUND plan top-down with the set of columns each
node must produce, map through operator semantics to required child columns,
and rewrite ``Scan`` nodes with a projection (which io/parquet then pushes
into the file read).

Pruning matters doubly on TPU: untouched columns would still ride variadic
sorts / pair-gathers through joins, and gathers cost ~180ms per 8M rows.
"""

from __future__ import annotations

from typing import Optional, Sequence, Set

from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P

__all__ = ["prune_columns"]


def _expr_refs(e: Optional[E.Expr], out: Set[str]) -> None:
    if e is None:
        return
    if isinstance(e, E.ColumnRef):
        out.add(e.col_name)
    if isinstance(e, E.BoundRef):
        out.add(e.col_name)
    for c in e.children():
        _expr_refs(c, out)


def _order_refs(orders: Sequence[E.SortOrder], out: Set[str]) -> None:
    for o in orders:
        _expr_refs(o.child, out)


def _agg_refs(aggs: Sequence[E.AggExpr], out: Set[str]) -> None:
    for a in aggs:
        _expr_refs(a.child, out)
        _expr_refs(a.filter, out)
        for x in a.extra:
            _expr_refs(x, out)


ALL = None  # sentinel: every column required


def prune_columns(plan: P.PlanNode, required: Optional[Set[str]] = ALL) -> P.PlanNode:
    """Return a plan with Scan projections narrowed to the required columns.
    ``required=None`` means all output columns are needed (the root)."""
    if isinstance(plan, P.Scan):
        if required is ALL:
            return plan
        avail = [f.name for f in plan.source_schema.fields]
        keep = tuple(n for n in avail if n in required)
        if plan.projection is not None:
            keep = tuple(n for n in plan.projection if n in required)
        if not keep:  # degenerate (e.g. COUNT(*)): keep one narrow column
            keep = (avail[0],)
        if plan.projection is not None and tuple(plan.projection) == keep:
            return plan
        if len(keep) == len(avail) and plan.projection is None:
            return plan
        return P.Scan(plan.table, plan.source_schema, keep)

    if isinstance(plan, P.Projection):
        need: Set[str] = set()
        for x in plan.exprs:
            _expr_refs(x, need)
        return P.Projection(prune_columns(plan.child, need), plan.exprs)

    if isinstance(plan, P.Filter):
        need = set() if required is ALL else set(required)
        _expr_refs(plan.predicate, need)
        child = prune_columns(plan.child, ALL if required is ALL else need)
        return P.Filter(child, plan.predicate)

    if isinstance(plan, P.HashAggregate):
        if plan.mode in (P.AggMode.FINAL, P.AggMode.PARTIAL_MERGE):
            # merge stages read STATE columns by name, not the input exprs —
            # don't prune through them
            return P.HashAggregate(
                prune_columns(plan.child, ALL), plan.group_exprs, plan.agg_exprs,
                plan.mode, plan.max_groups,
            )
        need = set()
        for g in plan.group_exprs:
            _expr_refs(g, need)
        _agg_refs(plan.agg_exprs, need)
        return P.HashAggregate(
            prune_columns(plan.child, need), plan.group_exprs, plan.agg_exprs,
            plan.mode, plan.max_groups,
        )

    if isinstance(plan, P.Sort):
        need = None if required is ALL else set(required)
        if need is not None:
            _order_refs(plan.orders, need)
        return P.Sort(prune_columns(plan.child, need), plan.orders, plan.fetch, plan.skip)

    if isinstance(plan, P.Limit):
        return P.Limit(prune_columns(plan.child, required), plan.limit, plan.offset)

    if isinstance(plan, (P.HashJoin, P.SortMergeJoin)):
        lneed: Optional[Set[str]] = None if required is ALL else set()
        rneed: Optional[Set[str]] = None if required is ALL else set()
        if required is not ALL:
            lnames = _subtree_columns(plan.left)
            rnames = _subtree_columns(plan.right)
            for n in required:
                if n in lnames:
                    lneed.add(n)
                if n in rnames:
                    rneed.add(n)
            for k in plan.left_keys:
                _expr_refs(k, lneed)
            for k in plan.right_keys:
                _expr_refs(k, rneed)
            if plan.condition is not None:
                cond: Set[str] = set()
                _expr_refs(plan.condition, cond)
                lneed |= cond & lnames
                rneed |= cond & rnames
        kwargs = dict(
            left=prune_columns(plan.left, lneed),
            right=prune_columns(plan.right, rneed),
            left_keys=plan.left_keys, right_keys=plan.right_keys,
            join_type=plan.join_type, condition=plan.condition,
        )
        if isinstance(plan, P.HashJoin):
            return P.HashJoin(build_side=plan.build_side, **kwargs)
        return P.SortMergeJoin(**kwargs)

    if isinstance(plan, P.Window):
        need = None if required is ALL else set(required)
        if need is not None:
            for w in plan.window_exprs:
                _expr_refs(w.child, need)
                _expr_refs(w.default, need)
                for pb in w.partition_by:
                    _expr_refs(pb, need)
                _order_refs(w.order_by, need)
                need.discard(w.out_name)
        return P.Window(prune_columns(plan.child, need), plan.window_exprs)

    if isinstance(plan, P.Explode):
        need = None if required is ALL else set(required)
        if need is not None:
            _expr_refs(plan.expr, need)
            need -= {"pos", "col", "key", "value"}
        return P.Explode(prune_columns(plan.child, need), plan.expr, plan.outer, plan.pos)

    if isinstance(plan, P.ShuffleExchange):
        need = None if required is ALL else set(required)
        if need is not None:
            for k in plan.keys:
                _expr_refs(k, need)
            _order_refs(plan.sort_orders, need)
        return P.ShuffleExchange(
            prune_columns(plan.child, need), plan.partitioning, plan.keys,
            plan.num_partitions, plan.sort_orders,
        )

    # conservative default: children keep everything
    kids = [prune_columns(c, ALL) for c in plan.children()]
    if not kids:
        return plan
    import dataclasses as _dc

    if isinstance(plan, P.Union):
        return P.Union(tuple(kids))
    if isinstance(plan, (P.HashJoin, P.SortMergeJoin, P.BroadcastNestedLoopJoin)):
        return _dc.replace(plan, left=kids[0], right=kids[1])
    return _dc.replace(plan, child=kids[0])


def _subtree_columns(plan: P.PlanNode) -> Set[str]:
    """All column names a subtree can output (pre-bind approximation)."""
    if isinstance(plan, P.Scan):
        names = plan.projection or [f.name for f in plan.source_schema.fields]
        return set(names)
    if isinstance(plan, P.Projection):
        return {x.name for x in plan.exprs}
    if isinstance(plan, P.HashAggregate):
        out = {g.name for g in plan.group_exprs}
        out |= {a.out_name for a in plan.agg_exprs}
        # partial modes emit state columns prefixed by out_name
        out |= {f"{a.out_name}__{suffix}" for a in plan.agg_exprs
                for suffix in ("sum", "count", "val", "n", "avg", "m2",
                               "xavg", "yavg", "ck", "xm2", "ym2")}
        return out
    if isinstance(plan, P.Window):
        return _subtree_columns(plan.child) | {w.out_name for w in plan.window_exprs}
    if isinstance(plan, P.Explode):
        return _subtree_columns(plan.child) | {"pos", "col", "key", "value"}
    if isinstance(plan, (P.HashJoin, P.SortMergeJoin, P.BroadcastNestedLoopJoin)):
        return _subtree_columns(plan.left) | _subtree_columns(plan.right)
    out: Set[str] = set()
    for c in plan.children():
        out |= _subtree_columns(c)
    return out
