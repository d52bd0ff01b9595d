"""Runtime semi-join filter injection — the InjectRuntimeFilter /
bloom-filter-join-pushdown analog.

Reference contract: Comet executes Spark's bloom-filter runtime join filters
natively end-to-end (BloomFilterAgg + BloomFilterMightContain,
/root/reference/native/spark-expr/src/bloom_filter/; SURVEY.md §2c scalar
subqueries note). The *capability* is: a selective dimension filter thins the
fact side of a join before the expensive operators run.

TPU-first formulation: instead of a bloom filter evaluated inside the fact
scan, the dimension chain (Scan→Filter→Projection over a small resident
table) is evaluated ON THE HOST at plan time (exec/host_filter.py — sound
superset if conjuncts are unsupported), the exact surviving key set is
registered as a tiny constant table, and a LEFT_SEMI hash join against it is
pushed down the fact side to just above its scan. Because the key set is
small with a known exact range, the injected semi join takes a sortless
dense-bitmap lookup path (join.py), and its output compacts to the
stats-estimated row count — every downstream sort/aggregate then runs at the
post-filter capacity instead of the fact-table capacity (q17: the per-part
AVG subquery aggregates ~6k rows instead of 6M).

Safety: the filter only ever REMOVES rows whose join key cannot match the
dimension side of an equi-join chain (transitive equality through INNER /
LEFT_SEMI join keys), so results are unchanged; a dropped group below an
aggregate can only be a group whose key cannot survive the join above.
"""

from __future__ import annotations

import copy
import dataclasses
import hashlib
from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.conf import CONF, register_entry
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P

__all__ = ["inject_runtime_filters", "RUNTIME_FILTER_ENABLED"]

RUNTIME_FILTER_ENABLED = register_entry(
    "comet.exec.runtimeFilter.enabled", True, "exec",
    "Inject plan-time runtime semi-join filters: selective Scan+Filter "
    "dimension chains are evaluated on the host, their surviving join-key "
    "set becomes a constant build table, and a dense-lookup LEFT_SEMI join "
    "is pushed down the fact side of equi-joins (the bloom-filter join "
    "pushdown analog, reference spark-expr/src/bloom_filter/). Sound: "
    "unsupported filter conjuncts widen the key set, never shrink it.",
)
RUNTIME_FILTER_MIN_REDUCTION = register_entry(
    "comet.exec.runtimeFilter.minReduction", 8, "exec",
    "Only inject a runtime filter when the estimated fact-side reduction "
    "factor (key-domain span / surviving keys) is at least this.",
)
_MIN_TARGET_ROWS = 65536  # don't bother filtering small fact sides
_MAX_DIM_CAPACITY = 1 << 22  # host-evaluable dimension size cap
_MAX_KEYS = 1 << 20  # key sets larger than this are not worth a semi join


def inject_runtime_filters(plan: P.PlanNode, session) -> P.PlanNode:
    """Return a rewritten (non-mutating) plan with runtime semi-join
    filters injected where profitable. ``session`` provides resident
    tables + stats and receives the constant key tables.

    Two-phase: first every candidate (join, side) is planned WITHOUT
    mutation and at most ONE filter — the most selective — is approved per
    source scan (q8 injected both a 0.006-ratio part-key filter and a
    0.076-ratio order-key filter on the same lineitem scan; the second
    probe+compaction cost more than its marginal thinning was worth — the
    RevertNativeForTransitionHeavyStages cost discipline). Approval rides
    a node attribute so the bottom-up rebuild (which copies ancestors)
    keeps it."""
    if not CONF.get(RUNTIME_FILTER_ENABLED):
        return plan
    cands: List[Tuple[P.PlanNode, str, "_RF", int]] = []
    _collect(plan, session, cands)
    best: Dict[int, Tuple[P.PlanNode, str, "_RF"]] = {}
    for join, side, rf, scan_key in cands:
        cur = best.get(scan_key)
        if cur is None or rf.est_ratio < cur[2].est_ratio:
            best[scan_key] = (join, side, rf)
    for join, side, rf in best.values():
        approved = getattr(join, "_rf_approved", None) or {}
        # one filter per join: keep the more selective side
        keep = min(list(approved.items()) + [(side, rf)],
                   key=lambda kv: kv[1].est_ratio)
        join._rf_approved = dict([keep])
    out = _rewrite(plan, session)
    for join, _side, _rf in best.values():  # clean the original tree's tags
        if getattr(join, "_rf_approved", None) is not None:
            join._rf_approved = None
    return out


def _collect(p: P.PlanNode, session, out: List) -> None:
    for c in p.children():
        _collect(c, session, out)
    if not (isinstance(p, P.HashJoin) and p.join_type == P.JoinType.INNER):
        return
    if len(p.left_keys) != 1 or len(p.right_keys) != 1:
        return
    lk = _src_col(p.left_keys[0])
    rk = _src_col(p.right_keys[0])
    if lk is None or rk is None:
        return
    for target, tkey, other, okey, side in (
        (p.left, lk, p.right, rk, "left"),
        (p.right, rk, p.left, lk, "right"),
    ):
        rf = _plan_filter(target, tkey, other, okey, session)
        if rf is None:
            continue
        scan = _source_scan(target, tkey)
        if scan is None:
            continue
        out.append((p, side, rf, id(scan)))


def _source_scan(p: P.PlanNode, col: str) -> Optional[P.Scan]:
    """The (largest) scan inside ``p`` that sources ``col`` — the dedup key
    for per-scan filter approval."""
    hits: List[P.Scan] = []

    def walk(q):
        if isinstance(q, P.Scan):
            if any(f.name == col for f in q.out_schema().fields):
                hits.append(q)
            return
        for c in q.children():
            walk(c)

    walk(p)
    return hits[0] if len(hits) == 1 else None


def _rewrite(p: P.PlanNode, session) -> P.PlanNode:
    kids = [(_rewrite(c, session), c) for c in p.children()]
    for new, old in kids:
        if new is not old:
            p = _swap_child(p, old, new)
    if isinstance(p, P.HashJoin) and p.join_type == P.JoinType.INNER:
        p = _try_filter_join(p, session)
    return p


def _swap_child(p: P.PlanNode, old: P.PlanNode, new: P.PlanNode) -> P.PlanNode:
    cp = copy.copy(p)
    cp.schema = None  # children changed; rebind
    for f in dataclasses.fields(cp):
        v = getattr(cp, f.name, None)
        if v is old:
            setattr(cp, f.name, new)
        elif isinstance(v, tuple) and any(x is old for x in v):
            setattr(cp, f.name, tuple(new if x is old else x for x in v))
    return cp


def _try_filter_join(j: P.HashJoin, session) -> P.HashJoin:
    approved = getattr(j, "_rf_approved", None)
    if not approved:
        return j
    out = j
    for side, rf in approved.items():
        target = j.left if side == "left" else j.right
        keys = j.left_keys if side == "left" else j.right_keys
        tkey = _src_col(keys[0])
        if tkey is None:
            continue
        new_target = _push_semi(target, tkey, rf, session)
        if new_target is None:
            continue
        out = _swap_child(out, target, new_target)
        # the join's own output estimate: the dim selectivity is now ALREADY
        # applied inside the filtered side, so the stats walk must not apply
        # it again (independence would collapse the estimate ~ratio² — the
        # q17 est=1 bug); fact rows × ratio is the right join-output size
        # for a PK-dim equi join
        if getattr(out, "out_rows_hint", None) is None:
            trows = _subtree_scan_rows(target, tkey, session)
            if trows:
                out.out_rows_hint = max(int(trows * rf.est_ratio), 1)
        break  # one filter per join is plenty
    if getattr(out, "_rf_approved", None) is not None:
        out._rf_approved = None  # consumed
    return out


# -- dimension discovery ---------------------------------------------------------


def _src_col(e: E.Expr) -> Optional[str]:
    while isinstance(e, (E.Alias, E.Cast)):
        e = e.child
    if isinstance(e, (E.ColumnRef, E.BoundRef)):
        return e.col_name
    return None


def _out_names(p: P.PlanNode) -> Optional[Set[str]]:
    """Output column names of an (possibly unbound) subtree; None=unknown."""
    if p.schema is not None:
        return {f.name for f in p.schema.fields}
    if isinstance(p, P.Scan):
        return {f.name for f in p.out_schema().fields}
    if isinstance(p, (P.Filter, P.Sort, P.Limit, P.Sample, P.ShuffleExchange)):
        return _out_names(p.children()[0])
    if isinstance(p, P.Projection):
        try:
            return {e.name for e in p.exprs}
        except Exception:
            return None
    if isinstance(p, P.HashAggregate):
        try:
            return {g.name for g in p.group_exprs} | {a.out_name for a in p.agg_exprs}
        except Exception:
            return None
    if isinstance(p, (P.HashJoin, P.SortMergeJoin)):
        if p.join_type in (P.JoinType.LEFT_SEMI, P.JoinType.LEFT_ANTI,
                           P.JoinType.LEFT_ANTI_NULL_AWARE):
            return _out_names(p.left)
        l, r = _out_names(p.left), _out_names(p.right)
        if l is None or r is None:
            return None
        return l | r
    return None


def _dim_sources(p: P.PlanNode, col: str, out: List[Tuple[P.PlanNode, str]],
                 depth: int = 0) -> None:
    """Collect (subtree, colname) sites whose column is equality-pinned to
    ``col`` in ``p``'s output, via projection renames and INNER/SEMI join
    key equivalence."""
    if depth > 32:
        return
    out.append((p, col))
    if isinstance(p, (P.Filter, P.Sort, P.Limit)):
        _dim_sources(p.children()[0], col, out, depth + 1)
    elif isinstance(p, P.Projection):
        for e in p.exprs:
            try:
                nm = e.name
            except Exception:
                continue
            if nm == col:
                src = _src_col(e)
                if src:
                    _dim_sources(p.child, src, out, depth + 1)
                break
    elif isinstance(p, (P.HashJoin, P.SortMergeJoin)):
        sides = [(p.left, p.left_keys, p.right, p.right_keys)]
        if p.join_type not in (P.JoinType.LEFT_SEMI, P.JoinType.LEFT_ANTI,
                               P.JoinType.LEFT_ANTI_NULL_AWARE,
                               P.JoinType.EXISTENCE):
            sides.append((p.right, p.right_keys, p.left, p.left_keys))
        for side, keys, oside, okeys in sides:
            names = _out_names(side)
            if names is not None and col in names:
                _dim_sources(side, col, out, depth + 1)
                # key equivalence transfers to the other side (INNER/SEMI
                # keep only key-equal rows; LEFT/outer do NOT pin equality)
                if p.join_type in (P.JoinType.INNER, P.JoinType.LEFT_SEMI):
                    for k, ok in zip(keys, okeys):
                        if _src_col(k) == col:
                            okc = _src_col(ok)
                            if okc:
                                _dim_sources(oside, okc, out, depth + 1)
                break


def _dim_chain(p: P.PlanNode, col: str):
    """If ``p`` is a Scan→(Filter|Projection)* chain exposing ``col``,
    return (scan, filters, col_at_scan); else None."""
    filters: List[E.Expr] = []
    cur, name = p, col
    for _ in range(16):
        if isinstance(cur, P.Scan):
            if any(f.name == name for f in cur.out_schema().fields):
                return cur, filters, name
            return None
        if isinstance(cur, P.Filter):
            filters.append(cur.predicate)
            cur = cur.child
            continue
        if isinstance(cur, P.Projection):
            nxt = None
            for e in cur.exprs:
                try:
                    if e.name == name:
                        nxt = _src_col(e)
                except Exception:
                    pass
            if nxt is None:
                return None
            name = nxt
            cur = cur.child
            continue
        return None
    return None


# -- planning --------------------------------------------------------------------


@dataclasses.dataclass
class _RF:
    table: str  # registered constant key table
    col: str  # its single column name
    keys: np.ndarray
    lo: int
    hi: int
    est_ratio: float  # estimated surviving fraction of the fact side


def _plan_filter(target: P.PlanNode, tkey: str, other: P.PlanNode, okey: str,
                 session) -> Optional[_RF]:
    """Find a cheap selective dimension source for ``okey`` on the other
    side, host-evaluate it, and gate on estimated reduction."""
    # the fact side must be big enough to care
    trows = _subtree_scan_rows(target, tkey, session)
    if trows is None or trows < _MIN_TARGET_ROWS:
        return None
    sites: List[Tuple[P.PlanNode, str]] = []
    _dim_sources(other, okey, sites)
    seen: Set[int] = set()
    for sub, col in sites:
        if id(sub) in seen:
            continue
        seen.add(id(sub))
        chain = _dim_chain(sub, col)
        if chain is None:
            continue
        scan, filters, key_at_scan = chain
        if not filters:
            continue  # no selectivity without a filter
        batch = session.tables.get(scan.table)
        if batch is None or batch.capacity > _MAX_DIM_CAPACITY:
            continue
        from datafusion_comet_tpu.exec.host_filter import eval_dim_filter

        try:
            mask, applied = eval_dim_filter(batch, filters)
        except Exception:
            continue
        if not applied:
            continue
        keys = _key_values(batch, key_at_scan, mask)
        if keys is None or len(keys) == 0 or len(keys) > _MAX_KEYS:
            continue
        lo, hi = int(keys.min()), int(keys.max())
        # estimated fact fraction surviving: |keys| / key-domain size.
        # Exact column range (stats.ranges) beats the sampled NDV sketch.
        domain = _key_domain(target, tkey, session)
        if domain is None:
            st = session.stats.get(scan.table)
            if st is not None and st.ranges and key_at_scan in st.ranges:
                dlo, dhi = st.ranges[key_at_scan]
                domain = dhi - dlo + 1
        if domain is None or domain <= 0:
            continue
        ratio = len(keys) / domain
        if ratio * CONF.get(RUNTIME_FILTER_MIN_REDUCTION) > 1.0:
            continue
        name = _register_keys(session, keys, scan.table, key_at_scan,
                              batch.schema.field(key_at_scan).dtype)
        return _RF(name, f"__rfk_{name[5:]}", keys, lo, hi, ratio)
    return None


def _key_domain(target: P.PlanNode, col: str, session) -> Optional[int]:
    """Exact value-domain span of ``col`` at its source scan inside the
    target subtree (FK columns: span ≈ distinct count; sound enough for a
    reduction-ratio gate)."""
    hits: List[Tuple[int, int]] = []

    def walk(p):
        if isinstance(p, P.Scan):
            st = session.stats.get(p.table)
            if st is not None and st.ranges and col in st.ranges and \
                    any(f.name == col for f in p.out_schema().fields):
                hits.append(st.ranges[col])
            return
        for c in p.children():
            walk(c)

    if isinstance(target, str):
        return None
    walk(target)
    if len(hits) != 1:
        return None
    lo, hi = hits[0]
    return hi - lo + 1


def _subtree_scan_rows(p: P.PlanNode, col: str, session) -> Optional[int]:
    """Row count of the scan (inside ``p``) that sources ``col``."""
    best: List[int] = []

    def walk(q):
        if isinstance(q, P.Scan):
            if any(f.name == col for f in q.out_schema().fields):
                st = session.stats.get(q.table)
                b = session.tables.get(q.table)
                if st is not None:
                    best.append(st.rows)
                elif b is not None:
                    best.append(b.capacity)
            return
        for c in q.children():
            walk(c)

    walk(p)
    return max(best) if best else None


def _key_values(batch, col: str, mask: np.ndarray) -> Optional[np.ndarray]:
    try:
        i = batch.schema.index_of(col)
    except Exception:
        return None
    cv = batch.columns[i]
    if cv.is_dict or not (cv.dtype.is_integer or cv.dtype.type_id == "DATE"):
        return None
    vals = np.asarray(cv.data)
    valid = np.asarray(cv.validity)
    keep = mask & valid
    return np.unique(vals[keep].astype(np.int64))


def _register_keys(session, keys: np.ndarray, dim_table: str, dim_col: str,
                   dtype: T.DataType) -> str:
    h = hashlib.sha1()
    h.update(dim_table.encode())
    h.update(dim_col.encode())
    h.update(keys.tobytes())
    name = f"__rf_{h.hexdigest()[:12]}"
    if name in session.tables:
        return name
    col = f"__rfk_{h.hexdigest()[:12]}"
    schema = T.Schema([T.Field(col, dtype, nullable=False)])
    data = {col: keys.astype(np.int64)}
    session.register_numpy(name, data, schema)
    return name


# -- push-down -------------------------------------------------------------------


def _push_semi(p: P.PlanNode, col: str, rf: _RF, session) -> Optional[P.PlanNode]:
    """Insert the semi join against the key table as low as the column
    flows unchanged; returns a NEW tree (shared nodes untouched)."""
    if isinstance(p, (P.Filter, P.Sort, P.Limit)):
        sub = _push_semi(p.children()[0], col, rf, session)
        if sub is None:
            return _attach(p, col, rf, session)
        return _swap_child(p, p.children()[0], sub)
    if isinstance(p, P.Projection):
        src = None
        for e in p.exprs:
            try:
                if e.name == col:
                    src = _src_col(e)
            except Exception:
                pass
        if src:
            sub = _push_semi(p.child, src, rf, session)
            if sub is not None:
                return _swap_child(p, p.child, sub)
        return _attach(p, col, rf, session)
    if isinstance(p, P.HashAggregate):
        for g in p.group_exprs:
            try:
                if g.name == col:
                    src = _src_col(g)
                    if src:
                        sub = _push_semi(p.child, src, rf, session)
                        if sub is not None:
                            return _swap_child(p, p.child, sub)
            except Exception:
                pass
        return _attach(p, col, rf, session)
    if isinstance(p, (P.HashJoin, P.SortMergeJoin)):
        semi_like = p.join_type in (
            P.JoinType.LEFT_SEMI, P.JoinType.LEFT_ANTI,
            P.JoinType.LEFT_ANTI_NULL_AWARE, P.JoinType.EXISTENCE)
        for side in ((p.left,) if semi_like else (p.left, p.right)):
            names = _out_names(side)
            if names is not None and col in names:
                # pushing below an outer-preserved side is safe for INNER /
                # LEFT_SEMI / the probe side of LEFT (rows removed cannot
                # re-appear as NULLs on their OWN side)
                if p.join_type in (P.JoinType.INNER, P.JoinType.LEFT_SEMI,
                                   P.JoinType.LEFT, P.JoinType.LEFT_ANTI):
                    sub = _push_semi(side, col, rf, session)
                    if sub is not None:
                        return _swap_child(p, side, sub)
                break
        return _attach(p, col, rf, session)
    if isinstance(p, P.Scan):
        return _attach(p, col, rf, session)
    return _attach(p, col, rf, session)


def _attach(p: P.PlanNode, col: str, rf: _RF, session) -> Optional[P.PlanNode]:
    names = _out_names(p)
    if names is None or col not in names:
        return None
    build = P.Scan(rf.table, session.tables[rf.table].schema)
    j = P.HashJoin(p, build, (E.ColumnRef(col),), (E.ColumnRef(rf.col),),
                   P.JoinType.LEFT_SEMI, "right")
    j.rf_dense_range = (rf.lo, rf.hi)
    # injected dense-bitmap semi joins are one scatter + one gather — no
    # concat sort, no pair list — so they must NOT count toward the
    # stage-split join budget: counting them forced an extra stage whose
    # full-capacity temp materialization cost MORE than the filter saved
    # (TPC-H q8's r4 1.05→2.94 s regression; the transition-cost
    # discipline of RevertNativeForTransitionHeavyStages.scala:33-38)
    j.rf_injected = True
    rows = _subtree_scan_rows(p, col, session)
    if rows:
        j.out_rows_hint = max(int(rows * rf.est_ratio), 1)
    return j
