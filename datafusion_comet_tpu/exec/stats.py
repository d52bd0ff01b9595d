"""Table statistics + capacity derivation.

The reference relies on Spark's cost-based planner for aggregate sizing;
here static XLA shapes make group capacities part of the compiled program,
so the engine derives them from per-table NDV sketches collected at
registration (reference analog: the JVM plumbs Spark statistics into
CometExecRule; native/core planner consumes them via the proto).

Flow: ``collect_stats`` sketches row count + per-column NDV from host data
(sampled beyond a threshold), ``derive_capacities`` walks a bound plan
bottom-up carrying (row_estimate, {column: ndv}) and fills every
``HashAggregate.max_groups is None`` with a padded estimate. Underestimates
are not fatal: the engine's overflow re-planning loop doubles capacities
and re-executes (exec/engine.py _execute_retry).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import numpy as np

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P

DEFAULT_MAX_GROUPS = 1 << 16
_SAMPLE = 65536


@dataclasses.dataclass
class TableStats:
    rows: int
    ndv: Dict[str, int]  # per-column distinct-count estimate
    # exact per-column (min, max) for integer/date columns — drives join
    # multi-key packing (several key limbs -> one int64 limb)
    ranges: Dict[str, tuple] = None


def collect_stats(data: Dict[str, np.ndarray], schema: T.Schema) -> TableStats:
    """Sketch row count + per-column NDV from host arrays. Columns longer
    than the sample threshold are sampled and scaled with the first-order
    birthday estimator d ≈ u / (1 - (1 - s/n)^(n_s/u))... kept simpler: the
    sample's unique count scaled by the unseen-mass ratio (good enough to
    size a power-of-two capacity; overflow re-planning corrects the rest)."""
    n = len(next(iter(data.values()))) if data else 0
    ndv: Dict[str, int] = {}
    for f in schema.fields:
        col = data.get(f.name)
        if col is None or n == 0:
            continue
        if getattr(f.dtype, "is_nested", False) or f.dtype.type_id in ("LIST", "MAP", "STRUCT"):
            continue  # no scalar NDV for nested columns
        try:
            arr = np.asarray(col)
        except (ValueError, TypeError):
            continue
        if arr.ndim != 1:
            continue
        if n <= _SAMPLE:
            try:
                u = len(np.unique(arr[~_null_mask(arr)])) or 1
            except TypeError:  # unhashable/object mix
                u = min(n, DEFAULT_MAX_GROUPS)
            ndv[f.name] = max(u, 1)
            continue
        idx = np.random.default_rng(0).choice(n, _SAMPLE, replace=False)
        sample = arr[idx]
        try:
            u = len(np.unique(sample[~_null_mask(sample)])) or 1
        except TypeError:
            ndv[f.name] = min(n, DEFAULT_MAX_GROUPS)
            continue
        ndv[f.name] = _invert_coupon(u, _SAMPLE, n)
    ranges: Dict[str, tuple] = {}
    for f in schema.fields:
        col = data.get(f.name)
        if col is None or n == 0:
            continue
        if not (f.dtype.is_integer or f.dtype.type_id == "DATE"):
            continue
        try:
            arr = np.asarray(col)
        except (ValueError, TypeError):
            continue
        if arr.ndim != 1 or not np.issubdtype(arr.dtype, np.integer):
            continue
        vmask = data.get(f.name + "__valid")
        vals = arr if vmask is None else arr[np.asarray(vmask, bool)]
        if len(vals):
            ranges[f.name] = (int(vals.min()), int(vals.max()))
    return TableStats(rows=n, ndv=ndv, ranges=ranges)


def _invert_coupon(u: int, s: int, n: int) -> int:
    """Distinct-count estimate from a size-s sample showing u distinct
    values over an n-row column: invert E[u] = d·(1-(1-1/d)^s) by binary
    search (the coupon-collector expectation; replaces the old piecewise
    saturating/linear heuristic that overestimated mid-cardinality FK
    columns by >20x — e.g. lineitem.l_partkey, domain 200k, 65k-row sample
    shows ~55k distinct which linear scaling blew up to ~5M)."""
    if u >= s:  # every sampled row distinct: assume mostly-unique column
        return n
    lo, hi = u, n
    for _ in range(60):
        if hi - lo <= max(1, lo // 1000):
            break
        d = (lo + hi) / 2
        exp_u = d * (1.0 - math.exp(s * math.log1p(-1.0 / d)))
        if exp_u < u:
            lo = d
        else:
            hi = d
    return max(int((lo + hi) / 2), 1)


def _null_mask(arr: np.ndarray) -> np.ndarray:
    if arr.dtype == object:
        return np.array([v is None for v in arr])
    return np.zeros(len(arr), bool)


_RANGE_SELECTIVITY = 0.4
_FILTER_SELECTIVITY = 0.5


def derive_capacities(plan: P.PlanNode, stats: Dict[str, TableStats]) -> None:
    """Fill every ``HashAggregate.max_groups is None`` in-place with a
    power-of-two estimate: min(Π ndv(group cols), input row estimate) × 2
    safety, floored at 1024. NDV entries are BASE sketches (never shrunk by
    filters — they remain upper bounds); use sites cap them by the row
    estimate."""
    _walk(plan, stats)


def _pred_selectivity(pred: E.Expr, ndv: Dict[str, int]) -> float:
    """Per-conjunct selectivity: equality → 1/ndv, IN-list → k/ndv,
    ranges → 0.4, everything else → 0.5 (the classic System-R defaults;
    the reference leans on Spark's CBO for the same numbers)."""
    sel = 1.0
    for c in _conjuncts(pred):
        if isinstance(c, E.BinaryOp) and c.op == "or":
            a = _pred_selectivity(c.left, ndv)
            b = _pred_selectivity(c.right, ndv)
            sel *= min(a + b, 1.0)
            continue
        col = None
        if isinstance(c, E.BinaryOp):
            col = _source_column(c.left) or _source_column(c.right)
            if c.op == "eq" and col and col in ndv:
                sel *= 1.0 / max(ndv[col], 1)
            elif c.op in ("lt", "le", "gt", "ge"):
                sel *= _RANGE_SELECTIVITY
            else:
                sel *= _FILTER_SELECTIVITY
        elif isinstance(c, E.InList):
            col = _source_column(c.child)
            k = len(c.values)
            sel *= min(k / max(ndv.get(col, 10), 1), 1.0) if col else _FILTER_SELECTIVITY
        else:
            sel *= _FILTER_SELECTIVITY
    return max(sel, 1e-6)


def _column_range(plan: P.PlanNode, name: str, stats: Dict[str, TableStats]):
    """Exact (min, max) of a named column within a subtree, following
    Projection/group-key renames down to source Scans (q21's
    ``l_suppkey AS ls2``). Distinct conflicting ranges → None; identical
    hits from several scan sites (self-joins) agree and stay usable.
    Filters/joins only shrink value sets, so the base range is a sound
    bound."""
    hits = []

    def walk(p, nm):
        if isinstance(p, P.Scan):
            st = stats.get(p.table)
            if st is not None and st.ranges and nm in st.ranges and \
                    any(f.name == nm for f in p.out_schema().fields):
                hits.append(st.ranges[nm])
            return
        if isinstance(p, P.Projection):
            for e in p.exprs:
                try:
                    n2 = e.name
                except Exception:
                    continue
                if n2 == nm:
                    src = _source_column(e)
                    if src:
                        walk(p.child, src)
                    return
            return
        if isinstance(p, P.HashAggregate):
            for g in p.group_exprs:
                try:
                    if g.name == nm:
                        src = _source_column(g)
                        if src:
                            walk(p.child, src)
                        return
                except Exception:
                    continue
            return  # aggregate values are computed, not source columns
        for c in p.children():
            walk(c, nm)

    walk(plan, name)
    uniq = set(hits)
    return hits[0] if len(uniq) == 1 else None


def _conjuncts(e: E.Expr):
    if isinstance(e, E.BinaryOp) and e.op == "and":
        return _conjuncts(e.left) + _conjuncts(e.right)
    return [e]


def _walk(plan: P.PlanNode, stats: Dict[str, TableStats]) -> Tuple[int, Dict[str, int]]:
    """Returns (row_estimate, {output column name: base ndv estimate})."""
    if isinstance(plan, P.Scan):
        st = stats.get(plan.table)
        if st is None:
            return DEFAULT_MAX_GROUPS, {}
        names = [f.name for f in plan.out_schema().fields]
        return max(st.rows, 1), {k: v for k, v in st.ndv.items() if k in names}

    kids = [_walk(c, stats) for c in plan.children()]

    if isinstance(plan, P.Filter):
        rows, ndv = kids[0]
        rows = max(int(rows * _pred_selectivity(plan.predicate, ndv)), 1)
        if getattr(plan, "out_rows_hint", None) is None:
            plan.out_rows_hint = rows  # drives post-filter capacity shrink
        return rows, ndv

    if isinstance(plan, P.Projection):
        rows, ndv = kids[0]
        out: Dict[str, int] = {}
        for e in plan.exprs:
            src = _source_column(e)
            if src is not None and src in ndv:
                out[e.name] = ndv[src]
        return rows, out

    if isinstance(plan, (P.HashJoin, P.SortMergeJoin)):
        (lr, ln), (rr, rn) = kids
        jt = plan.join_type

        def _set_build_range():
            # single-key build-side exact value range → the join's
            # dense-domain paths (unique-build position table, semi
            # membership bitmap, minmax condition tables — join.py) replace
            # their concat sorts with one scatter + one gather over the span
            if (len(plan.right_keys) != 1
                    or getattr(plan, "build_key_range", None) is not None):
                return
            bsd = getattr(plan, "build_side", "right")
            bside = plan.left if bsd == "left" else plan.right
            bkey = _source_column((plan.left_keys if bsd == "left"
                                   else plan.right_keys)[0])
            if bkey:
                r = _column_range(bside, bkey, stats)
                if r is not None:
                    plan.build_key_range = r

        if jt in (P.JoinType.LEFT_SEMI, P.JoinType.LEFT_ANTI,
                  P.JoinType.LEFT_ANTI_NULL_AWARE, P.JoinType.EXISTENCE):
            _set_build_range()
            # exact ranges of condition columns (q21's `ls2 <> l_suppkey`):
            # lets the dense minmax-carry scatter run in int32 (a 64-bit
            # scatter is ~19x slower on v5e — kernels bench)
            if (plan.condition is not None
                    and getattr(plan, "cond_col_ranges", None) is None):
                crs: Dict[str, tuple] = {}

                def refs(e):
                    nm = _source_column(e)
                    if nm:
                        yield nm
                    for c in e.children():
                        yield from refs(c)

                for cname in set(refs(plan.condition)):
                    r = (_column_range(plan.right, cname, stats)
                         or _column_range(plan.left, cname, stats))
                    if r is not None:
                        crs[cname] = r
                if crs:
                    plan.cond_col_ranges = crs
            if jt == P.JoinType.LEFT_SEMI:
                # probe rows surviving ≈ lr × (build keys / probe key NDV);
                # drives the engine's semi-output compaction (>=8x rule, so
                # a mild overestimate costs nothing)
                lk0 = _source_column(plan.left_keys[0]) if plan.left_keys else None
                if lk0 and lk0 in ln:
                    ratio = min(1.0, rr / max(ln[lk0], 1))
                    est = max(int(lr * ratio), 1)
                    if getattr(plan, "out_rows_hint", None) is None:
                        plan.out_rows_hint = est
                    ln = dict(ln)
                    ln[lk0] = min(ln[lk0], max(rr, 1))
                    return est, ln
            return lr, ln
        lk = [_source_column(k) for k in plan.left_keys]
        rk = [_source_column(k) for k in plan.right_keys]
        # RewriteJoin analog (reference: RewriteJoin.scala build-side
        # selection): INNER hash joins may build on either side — put the
        # build on the (estimated) smaller input. The build side is sorted
        # by key limbs and its columns gathered per probe match, so build
        # cost scales with build rows; a 2x margin avoids flapping on noisy
        # estimates. Outer/semi/anti joins pin the probe to the preserved
        # side, so only INNER swaps.
        if (
            isinstance(plan, P.HashJoin)
            and jt == P.JoinType.INNER
            and plan.build_side == "right"
            and lr * 2 <= rr
        ):
            plan.build_side = "left"
        _set_build_range()  # after the build-side swap: range follows build
        # PK-like build side (single key, NDV ≈ rows): hint the gather-free
        # unique-build join; a wrong hint is caught by the in-graph
        # duplicate-key flag and re-planned with the general path
        build = getattr(plan, "build_side", "right")
        if len(plan.right_keys) == 1 and build == "right" and rk[0] in rn:
            if rn[rk[0]] >= int(0.8 * rr):
                plan.unique_build_hint = True
        elif len(plan.left_keys) == 1 and build == "left" and lk and lk[0] in ln:
            if ln[lk[0]] >= int(0.8 * lr):
                plan.unique_build_hint = True
        # Multi-key packing hint: when every join key is a plain integer
        # column whose exact (min, max) is known from its source table, the
        # key tuple packs injectively into ONE int64 limb (sum of
        # range-offset * stride) — halving the carry-range sort's key
        # operands for composite-key joins (q9/q16 shape). Ranges merge
        # across both sides so the pack is identical left/right; an
        # out-of-range value at runtime raises the join overflow flag and
        # the retry disables packing.
        if (len(plan.left_keys) > 1 and getattr(plan, "key_pack", None) is None
                and lk and rk and all(lk) and all(rk)):
            spans = []
            prod = 1
            for a, b_ in zip(lk, rk):
                ra = _column_range(plan.left, a, stats)
                rb = _column_range(plan.right, b_, stats)
                if ra is None or rb is None:
                    spans = None
                    break
                lo, hi = min(ra[0], rb[0]), max(ra[1], rb[1])
                spans.append((lo, hi))
                prod *= (hi - lo + 1)
                if prod >= (1 << 62):
                    spans = None
                    break
            if spans:
                plan.key_pack = tuple(spans)
        # Per-join fan-out hint: expected matches per probe row = build rows
        # / NDV(build keys). Attempt-0 capacity overflows force a full
        # recompile (minutes on the tunnel TPU), so size K from stats with a
        # 2x margin instead of starting every join at the session default.
        if jt in (P.JoinType.INNER, P.JoinType.LEFT, P.JoinType.RIGHT,
                  P.JoinType.FULL) and getattr(plan, "fanout_hint", None) is None:
            b_rows, b_ndv, b_keys = (
                (rr, rn, rk) if build == "right" else (lr, ln, lk))
            if b_keys and all(k in b_ndv for k in b_keys if k) and all(b_keys):
                ndv_prod = 1
                for k in b_keys:
                    ndv_prod = min(ndv_prod * max(b_ndv[k], 1), max(b_rows, 1))
                matches = max(b_rows / max(ndv_prod, 1), 1.0)
                plan.fanout_hint = int(
                    min(max(2, 1 << math.ceil(math.log2(2.0 * matches))), 256))
        # FK→PK star join: the filtered dimension side thins the fact side by
        # rr / ndv(dim key); the fact FK column's distinctness is then capped
        # by the surviving dimension rows (this is what makes a downstream
        # GROUP BY fk_col capacity track the dimension filter)
        rows = max(lr, rr)
        ndv = {**rn, **ln}
        if rr <= lr and rk and rk[0] in rn:
            ratio = min(1.0, rr / max(rn[rk[0]], 1))
            rows = max(int(lr * ratio), 1)
            if lk and lk[0]:
                ndv[lk[0]] = min(ndv.get(lk[0], rr), rr)
        elif lr < rr and lk and lk[0] in ln:
            ratio = min(1.0, lr / max(ln[lk[0]], 1))
            rows = max(int(rr * ratio), 1)
            if rk and rk[0]:
                ndv[rk[0]] = min(ndv.get(rk[0], lr), lr)
        # the join's own output-row estimate sizes the compacted pair list
        # (outer joins keep at least every preserved-side row)
        est = rows
        if jt in (P.JoinType.LEFT, P.JoinType.FULL):
            est = max(est, lr)
        if jt in (P.JoinType.RIGHT, P.JoinType.FULL):
            est = max(est, rr)
        if getattr(plan, "out_rows_hint", None) is None:
            plan.out_rows_hint = est
        else:
            # a pre-set hint (runtime-filter injector's exact-ratio value)
            # beats the independence-assuming formula — and must propagate
            # upward, or correlated filters collapse ancestor estimates
            rows = max(int(plan.out_rows_hint), 1)
        return rows, ndv

    if isinstance(plan, P.BroadcastNestedLoopJoin):
        (lr, ln), (rr, rn) = kids
        rows = max(lr * rr, 1)
        return rows, {**rn, **ln}

    if isinstance(plan, P.Union):
        rows = sum(r for r, _ in kids)
        ndv: Dict[str, int] = {}
        for _, n in kids:
            for k, v in n.items():
                ndv[k] = ndv.get(k, 0) + v
        return rows, {k: min(v, rows) for k, v in ndv.items()}

    if isinstance(plan, P.Expand):
        rows, ndv = kids[0]
        n_proj = len(plan.projections)
        out = {}
        for name in plan.names:
            if name in ndv:
                out[name] = min(ndv[name] + n_proj, rows * n_proj)
            else:
                out[name] = n_proj  # tag / literal columns
        return rows * n_proj, out

    if isinstance(plan, P.HashAggregate):
        rows, ndv = kids[0]
        est = 1
        known = True
        for g in plan.group_exprs:
            src = _source_column(g)
            if src is not None and src in ndv:
                est *= max(min(ndv[src], rows), 1)
            else:
                known = False
        if not plan.group_exprs:
            groups = 1
        elif known:
            groups = min(est, rows)
        else:
            groups = min(max(est, 1) * DEFAULT_MAX_GROUPS, rows) if est > 1 else min(DEFAULT_MAX_GROUPS, rows)
        if plan.max_groups is None:
            plan.max_groups = _pad(groups)
        # per-key exact integer ranges (where resolvable to one source
        # Scan) so the aggregate can pack the whole key tuple into 1-2
        # sort limbs (q10 shape: 6 keys -> 1 limb)
        if plan.group_exprs and getattr(plan, "group_key_ranges", None) is None:
            krs = []
            for g in plan.group_exprs:
                src = _source_column(g)
                krs.append(_column_range(plan.child, src, stats) if src else None)
            if any(r is not None for r in krs):
                plan.group_key_ranges = tuple(krs)
        out = {}
        for g in plan.group_exprs:
            src = _source_column(g)
            out[g.name] = min(ndv.get(src, groups), groups) if src else groups
        return max(groups, 1), out

    if isinstance(plan, P.Sort):
        rows, ndv = kids[0]
        if plan.fetch is not None:
            rows = min(rows, plan.fetch)
        return rows, {k: min(v, rows) for k, v in ndv.items()}

    if isinstance(plan, P.Limit):
        rows, ndv = kids[0]
        rows = min(rows, plan.limit)
        return rows, {k: min(v, rows) for k, v in ndv.items()}

    if kids:
        return kids[0]
    return DEFAULT_MAX_GROUPS, {}


def _source_column(e: E.Expr) -> Optional[str]:
    """The underlying column name when the expr is (an alias/cast of) a
    column reference; None for computed exprs."""
    while isinstance(e, (E.Alias, E.Cast)):
        e = e.child
    if isinstance(e, (E.BoundRef, E.ColumnRef)):
        return e.col_name
    return None


def _pad(groups: int) -> int:
    """×2 safety, next power of two, floor 1024 (overflow re-planning
    corrects underestimates; the floor keeps tiny aggregates from
    retracing when data grows slightly)."""
    target = max(groups * 2, 1024)
    return 1 << max(int(math.ceil(math.log2(target))), 0)
