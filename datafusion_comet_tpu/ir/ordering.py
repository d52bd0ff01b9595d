"""Sort-order propagation over bound plans.

The reference's planner tracks output orderings so SortMergeJoin can consume
pre-sorted children and redundant sorts are elided (DataFusion
EquivalenceProperties / output_ordering). Here the engine is sort-centric —
aggregation and exchanges already produce key-ordered output — so knowing a
node's ordering lets the planner delete whole sort operators:

- ``out_ordering(plan)`` returns the (field_name, ascending, nulls_first)
  prefix ordering of the node's live rows, () when unknown,
- HashAggregate output is ordered by its group keys (the sort-based
  segmented reduction leaves groups in grouping-limb order: ascending,
  null group LAST),
- Filter / Limit preserve order; Projection preserves it through
  passthrough/alias columns; Sort establishes it.

Consumers: engine._elide_redundant_sorts (Sort over an already-ordered
child becomes identity/Limit) and the SortMergeJoin presorted-build merge
path (exec/operators/join.py skips its build-side key sort).
"""

from __future__ import annotations

from typing import Optional, Tuple

from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P

__all__ = ["out_ordering", "order_key_name", "ordering_satisfies"]

# (field name, ascending, nulls_first) — nulls_first None means "the field
# cannot be null, any null placement is satisfied"
OrderKey = Tuple[str, bool, Optional[bool]]


def order_key_name(e: E.Expr, schema) -> Optional[str]:
    """Resolve a bound order/key expression to its input field name (None
    for computed expressions)."""
    if isinstance(e, E.Alias):
        return order_key_name(e.child, schema)
    if isinstance(e, E.BoundRef):
        return schema.fields[e.index].name
    if isinstance(e, E.ColumnRef):
        return e.name
    return None


def _field_nullable(schema, name: str) -> bool:
    for f in schema.fields:
        if f.name == name:
            return f.nullable
    return True


def out_ordering(plan: P.PlanNode) -> Tuple[OrderKey, ...]:
    if isinstance(plan, P.Sort):
        child_schema = plan.child.schema
        out = []
        for o in plan.orders:
            name = order_key_name(o.child, child_schema)
            if name is None:
                break
            nf: Optional[bool] = o.resolved_nulls_first()
            if not _field_nullable(child_schema, name):
                nf = None
            out.append((name, o.ascending, nf))
        return tuple(out)
    if isinstance(plan, (P.Filter, P.Limit)):
        return out_ordering(plan.child)
    if isinstance(plan, P.Projection):
        child = out_ordering(plan.child)
        if not child:
            return ()
        # passthrough/alias rename map: input field -> output name
        rename = {}
        for e in plan.exprs:
            src = order_key_name(e, plan.child.schema)
            if src is not None:
                rename.setdefault(src, e.name)
        out = []
        for name, asc, nf in child:
            if name not in rename:
                break
            out.append((rename[name], asc, nf))
        return tuple(out)
    if isinstance(plan, P.HashAggregate) and plan.mode in (
            P.AggMode.SINGLE, P.AggMode.FINAL):
        # sort-based aggregation: groups emerge in grouping-limb order —
        # ascending by each key, with the all-null key group LAST
        out = []
        for g in plan.group_exprs:
            name = g.name
            nf: Optional[bool] = False
            if plan.schema is not None and not _field_nullable(plan.schema, name):
                nf = None
            out.append((name, True, nf))
        return tuple(out)
    return ()


def ordering_satisfies(have: Tuple[OrderKey, ...], want_keys) -> bool:
    """True when rows ordered by ``have`` are already ordered by
    ``want_keys`` (a prefix match; each want key is (name, ascending,
    nulls_first))."""
    if len(want_keys) > len(have):
        return False
    for (hn, ha, hnf), (wn, wa, wnf) in zip(have, want_keys):
        if hn != wn or ha != wa:
            return False
        if hnf is not None and wnf is not None and hnf != wnf:
            return False
    return True
