"""Hash aggregate operator: grouped aggregation with Partial/Final/PartialMerge.

Reference contract: operator.proto:398-413 + planner.rs:1239-1375 (modes,
FILTER clauses, state columns at group-key offset) and the aggregate kernel
semantics of native/spark-expr/src/agg_funcs (sum/avg null-when-empty,
variance via combinable (n, avg, m2) states, count ignores nulls).

TPU-first formulation (measured-in on v5e — see _segments/_seg_sum notes):
instead of an open-addressing hash table (pointer chasing — hostile to XLA),
grouping is **sort-based segmented reduction with carried payloads**:

1. group-key columns → orderable limbs (sortkeys.grouping_limbs), packed to
   one int32 code when the key space is small;
2. every aggregate input is pre-evaluated and its buffers ride ONE stable
   variadic `lax.sort` as payloads (TPU random gathers after a sort cost
   ~15× a carried payload);
3. segment ids via cumsum over key-change flags of the sorted limbs;
4. sums/counts/averages reduce by cumsum + searchsorted boundary gathers
   (TPU scatter serializes colliding updates; cumsum is bandwidth-bound);
   value min/max keep segment scatters;
5. output is a fixed-capacity batch (``max_groups``) with a live-group mask,
   keeping every shape static for jit.

Small batches with tiny packed key spaces skip the sort entirely via
perfect-hash direct bucketing (_bucket_aggregate).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec import sortkeys
from datafusion_comet_tpu.exec.batch import Batch, ColumnVector, quantize_bound
from datafusion_comet_tpu.exec.evaluator import EvalContext, _NARROW_LIMIT, _dec_bound, evaluate
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir.plan import AggMode

__all__ = ["state_fields", "hash_aggregate"]


# -------------------------------------------------------------------------------------
# State-column layout (the cross-exchange contract for Partial/Final modes)
# -------------------------------------------------------------------------------------

_WELFORD_FUNCS = (
    E.AggFunc.VAR_SAMP,
    E.AggFunc.VAR_POP,
    E.AggFunc.STDDEV_SAMP,
    E.AggFunc.STDDEV_POP,
)
_COVAR_FUNCS = (E.AggFunc.COVAR_SAMP, E.AggFunc.COVAR_POP, E.AggFunc.CORR)
_MINMAX_LIKE = (E.AggFunc.MIN, E.AggFunc.MAX, E.AggFunc.FIRST, E.AggFunc.LAST)
_BIT_FUNCS = (E.AggFunc.BIT_AND, E.AggFunc.BIT_OR, E.AggFunc.BIT_XOR)
_BOOL_FUNCS = (E.AggFunc.BOOL_AND, E.AggFunc.BOOL_OR)
_SPECIAL_FUNCS = (
    E.AggFunc.COLLECT_LIST,
    E.AggFunc.COLLECT_SET,
    E.AggFunc.PERCENTILE,
    E.AggFunc.MEDIAN,
    E.AggFunc.APPROX_COUNT_DISTINCT,
    E.AggFunc.BLOOM_FILTER,
    E.AggFunc.APPROX_PERCENTILE,
)

# Per-THREAD aggregate trace state (mode for mode-sensitive kernels like
# approx_percentile, sorted-segment flag, dense key domain). Thread-local
# because parallel compile workers (tpcbench --compile-workers) trace
# different queries concurrently — module globals raced and corrupted
# sibling traces.
import threading as _threading

_TLS = _threading.local()


def _tls(name: str, default):
    return getattr(_TLS, name, default)


def _sum_state_dtype(a: E.AggExpr) -> T.DataType:
    cd = a.child.dtype
    if cd.is_decimal:
        return T.decimal(min(cd.precision + 10, T.MAX_DECIMAL_PRECISION), cd.scale)
    if cd.is_integer:
        return T.INT64
    return T.FLOAT64


def state_fields(a: E.AggExpr) -> List[T.Field]:
    """State-column schema emitted by Partial mode for one aggregate.

    Reference analog: DataFusion accumulator state_fields consumed at
    ``initial_input_buffer_offset`` (planner.rs:1282-1343)."""
    o = a.out_name
    f = a.func
    if f in (E.AggFunc.COUNT, E.AggFunc.COUNT_DISTINCT):
        return [T.Field(f"{o}__count", T.INT64, nullable=False)]
    if f == E.AggFunc.SUM:
        return [T.Field(f"{o}__sum", _sum_state_dtype(a))]
    if f == E.AggFunc.AVG:
        return [
            T.Field(f"{o}__sum", _sum_state_dtype(a)),
            T.Field(f"{o}__count", T.INT64, nullable=False),
        ]
    if f in _MINMAX_LIKE:
        return [T.Field(f"{o}__val", a.child.dtype)]
    if f in _WELFORD_FUNCS:
        return [
            T.Field(f"{o}__n", T.FLOAT64, nullable=False),
            T.Field(f"{o}__avg", T.FLOAT64, nullable=False),
            T.Field(f"{o}__m2", T.FLOAT64, nullable=False),
        ]
    if f in _COVAR_FUNCS:
        return [
            T.Field(f"{o}__n", T.FLOAT64, nullable=False),
            T.Field(f"{o}__xavg", T.FLOAT64, nullable=False),
            T.Field(f"{o}__yavg", T.FLOAT64, nullable=False),
            T.Field(f"{o}__ck", T.FLOAT64, nullable=False),
            T.Field(f"{o}__xm2", T.FLOAT64, nullable=False),
            T.Field(f"{o}__ym2", T.FLOAT64, nullable=False),
        ]
    if f in _BIT_FUNCS:
        return [T.Field(f"{o}__val", a.child.dtype)]
    if f in _BOOL_FUNCS:
        return [T.Field(f"{o}__val", T.BOOL)]
    if f == E.AggFunc.APPROX_PERCENTILE:
        from datafusion_comet_tpu.conf import APPROX_PCT_SKETCH, CONF

        k = CONF.get(APPROX_PCT_SKETCH)
        return [
            T.Field(f"{o}__sketch", T.binary(8 * k), nullable=False),
            T.Field(f"{o}__count", T.INT64, nullable=False),
        ]
    raise NotImplementedError(f"state_fields: {f}")


# -------------------------------------------------------------------------------------
# Segment machinery
# -------------------------------------------------------------------------------------


def _segments(
    key_cols: Sequence[ColumnVector],
    row_mask: jax.Array,
    max_groups: int,
    key_limbs: Optional[List[jax.Array]] = None,
    payloads: Sequence[jax.Array] = (),
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, List[jax.Array], jax.Array]:
    """Sort rows by group key; return (perm, seg_id(per sorted row, dead rows
    → max_groups so segment ops drop them), num_groups, first_row_src_index,
    sorted_payloads, sorted_row_mask).

    ``payloads`` are 1-D per-row arrays CARRIED THROUGH the variadic sort —
    the single most important aggregation optimization on TPU: a payload
    rides the sorting network at near-bandwidth cost, while a post-sort
    random gather of the same column costs ~15× (measured on v5e: 8 carried
    payloads 95ms vs 8 gathers 1.5s at 8M rows).
    ``key_limbs`` overrides the per-column limbs (e.g. a packed int32 key)."""
    cap = row_mask.shape[0]
    if key_limbs is not None:
        limbs = [(~row_mask).astype(jnp.int32)] + list(key_limbs)
    elif key_cols:
        limbs = [(~row_mask).astype(jnp.int32)] + sortkeys.grouping_limbs(key_cols)
    else:
        limbs = [(~row_mask).astype(jnp.int32)]
    nk = len(limbs)
    iota = jnp.arange(cap, dtype=jnp.int32)
    ops = tuple(limbs) + (iota,) + tuple(payloads) + (row_mask,)
    out = jax.lax.sort(ops, num_keys=nk, is_stable=True)
    sorted_limbs = out[:nk]
    perm = out[nk]
    sorted_payloads = list(out[nk + 1 : -1])
    sorted_mask = out[-1]
    changed = jnp.zeros(cap, bool).at[0].set(True)
    for s in sorted_limbs[1:]:
        changed = changed | jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
    changed = changed & sorted_mask
    seg = jnp.cumsum(changed.astype(jnp.int32)) - 1
    num_groups = seg[-1] + 1  # valid only if any row live
    num_groups = jnp.where(jnp.any(sorted_mask), num_groups, 0)
    seg = jnp.where(sorted_mask, seg, max_groups)  # dead rows dropped by segment ops
    # source row index (pre-sort) of each group's first row, for key gather —
    # seg is nondecreasing, so boundaries come from searchsorted (no scatter)
    first_src, _ = _seg_bounds(seg, max_groups)
    first_src = jnp.where(
        jnp.arange(max_groups) < num_groups, jnp.clip(first_src, 0, cap - 1), 0
    ).astype(jnp.int32)
    # first_src currently indexes sorted order; map to original rows
    first_orig = perm[first_src]
    return perm, seg, num_groups, first_orig, sorted_payloads, sorted_mask


# Reduction backends (trace-time flags, set by hash_aggregate around the
# reduction calls):
# - _SORTED_SEG: segment ids are SORTED (lexsort grouping path) — sums
#   reduce to one cumsum + two boundary gathers (TPU scatter serializes
#   colliding updates, ~700ms for 8M rows on v5e; cumsum is bandwidth-bound).
# - _DENSE_M: the packed key domain is tiny (dict codes / bool / int8 keys,
#   m ≤ comet.exec.agg.denseMaxDomain) — every reduction is a masked full
#   reduction over a virtual (cap, m) broadcast that XLA fuses into ONE
#   bandwidth pass with the m-axis on vector lanes. No row sort, no scatter,
#   no group-capacity hints: the TPU answer to perfect-hash aggregation.



def _dense_eq(seg: jax.Array, m: int) -> jax.Array:
    gids = jnp.arange(m, dtype=seg.dtype)
    return seg[:, None] == gids[None, :]  # (cap, m); dead rows (seg==m) all-False


def _dense_sum(x: jax.Array, seg: jax.Array, m: int) -> jax.Array:
    xd = x.astype(jnp.int32) if x.dtype == jnp.bool_ else x
    return jnp.sum(jnp.where(_dense_eq(seg, m), xd[:, None], 0), axis=0).astype(xd.dtype)


def _dense_minmax(x: jax.Array, seg: jax.Array, m: int, is_min: bool) -> jax.Array:
    if x.dtype == jnp.bool_:
        ident = np.array(True if is_min else False)
    elif jnp.issubdtype(x.dtype, jnp.floating):
        ident = np.array(np.inf if is_min else -np.inf, x.dtype)
    else:
        info = jnp.iinfo(x.dtype)
        ident = np.array(info.max if is_min else info.min, x.dtype)
    sel = jnp.where(_dense_eq(seg, m), x[:, None], ident)
    return (jnp.min if is_min else jnp.max)(sel, axis=0)


def _seg_bounds(seg, m):
    """[start, end) of each group in the SORTED row order (empty group →
    start == end). Cached per traced seg array (hash_aggregate scopes the
    cache): every reduction of the same aggregate shares one computation.
    Large m switches from searchsorted (log2(cap) binary-search rounds,
    each an m-wide gather — ~seconds when m is millions, the q18 GROUP BY
    l_orderkey sink) to two one-pass scatter-min/max tables."""
    cache = _tls('seg_bounds', None)
    key = (id(seg), m)
    if cache is not None and key in cache:
        return cache[key]
    cap = seg.shape[0]
    if m >= (1 << 16):
        iota = jnp.arange(cap, dtype=jnp.int32)
        slot = jnp.minimum(seg, m)  # dead rows (seg == max_groups) → sink
        starts = jnp.full(m + 1, cap, jnp.int32).at[slot].min(
            iota, mode="drop")[:m]
        ends = jnp.zeros(m + 1, jnp.int32).at[slot].max(
            iota + 1, mode="drop")[:m]
        ends = jnp.maximum(ends, starts)  # empty group: start == end == cap
    else:
        gids = jnp.arange(m, dtype=seg.dtype)
        starts = jnp.searchsorted(seg, gids, side="left")
        ends = jnp.searchsorted(seg, gids, side="right")
    if cache is not None:
        cache[key] = (starts, ends)
    return starts, ends


def _seg_sum(x, seg, m):
    if _tls('dense_m', None) is not None and m <= _tls('dense_m', None):
        return _dense_sum(x, seg, m)
    if _tls('sorted_seg', False):
        acc = jnp.cumsum(x, axis=0)
        starts, ends = _seg_bounds(seg, m)
        cap = x.shape[0]
        pre_end = jnp.where(ends > 0, jnp.take(acc, jnp.clip(ends - 1, 0, cap - 1)), 0)
        pre_start = jnp.where(starts > 0, jnp.take(acc, jnp.clip(starts - 1, 0, cap - 1)), 0)
        return (pre_end - pre_start).astype(x.dtype)
    return jax.ops.segment_sum(x, seg, num_segments=m + 1)[:m]


def _seg_min(x, seg, m):
    if _tls('dense_m', None) is not None and m <= _tls('dense_m', None):
        return _dense_minmax(x, seg, m, is_min=True)
    return jax.ops.segment_min(x, seg, num_segments=m + 1)[:m]


def _seg_max(x, seg, m):
    if _tls('dense_m', None) is not None and m <= _tls('dense_m', None):
        return _dense_minmax(x, seg, m, is_min=False)
    if _tls('sorted_seg', False) and x.dtype == jnp.bool_:
        # boolean "any" per segment: count of Trues > 0 via the cumsum path
        return _seg_sum(x.astype(jnp.int32), seg, m) > 0
    return jax.ops.segment_max(x, seg, num_segments=m + 1)[:m]


def _minmax_identity(dt: T.DataType, is_min: bool):
    if dt.is_floating:
        return np.array(np.inf if is_min else -np.inf, dt.np_dtype())
    info = np.iinfo(dt.np_dtype()) if dt.np_dtype() != np.bool_ else None
    if dt.is_boolean:
        return np.array(True if is_min else False)
    return np.array(info.max if is_min else info.min, dt.np_dtype())


# -------------------------------------------------------------------------------------
# Main operator
# -------------------------------------------------------------------------------------


_PACK_BITS_CAP = 24  # packed-key paths: at most 2^24 distinct codes
_BUCKET_BITS_CAP = 16  # direct scatter only below 2^16 buckets


def _try_pack_keys(key_cols: Sequence[ColumnVector]):
    """Perfect-hash fast path: when the combined group-key space is small
    (narrow strings / bool / int8), the bucket id IS the packed key — no row
    sort needed, aggregates scatter straight into 2^bits buckets. The
    static-shape analog of DuckDB-style perfect-hash aggregation; on TPU it
    replaces an O(n log n) multi-key sort with O(n) scatter-adds."""
    total_bits = 0
    parts = []
    for cv in key_cols:
        dt = cv.dtype
        if dt.is_boolean:
            enc, b = cv.data.astype(jnp.int32), 1
        elif dt.type_id == "INT8":
            enc, b = cv.data.astype(jnp.int32) + 128, 8
        elif cv.is_dict:
            # dict codes ARE a perfect hash of the key domain (and code
            # order == string order, so bucket order stays key order)
            k = cv.dictionary.size
            enc, b = jnp.clip(cv.data, 0, max(k - 1, 0)), max(k.bit_length(), 1)
        elif dt.is_binary and dt.byte_width <= 2:
            w = dt.byte_width
            len_bits = w.bit_length()  # length in [0, w]
            enc = jnp.zeros(cv.capacity, jnp.int32)
            for i in range(w):
                enc = (enc << 8) | cv.data[:, i].astype(jnp.int32)
            enc = (enc << len_bits) | jnp.minimum(cv.lengths, w).astype(jnp.int32)
            b = 8 * w + len_bits
        else:
            return None
        # null bit (null == null groups together; nulls collapse to code 0)
        enc = jnp.where(cv.validity, enc + 1, 0)
        b += 1
        total_bits += b
        if total_bits > _PACK_BITS_CAP:
            return None
        parts.append((enc, b))
    seg = jnp.zeros(key_cols[0].capacity, jnp.int32)
    for enc, b in parts:
        seg = (seg << b) | enc
    return seg, 1 << total_bits


def _pack_sort_limbs(key_cols: Sequence[ColumnVector], key_ranges) -> Optional[List[jax.Array]]:
    """Pack ALL group keys into as few int64 sort limbs as possible while
    preserving grouping_limbs order (per key: null flag then value; nulls
    last; dict codes == string order; ints offset by their stats range).
    Returns None when any key can't encode — the caller falls back to the
    generic multi-limb path. Sort cost scales with total limb bytes, so a
    6-key GROUP BY (q10 shape) drops from ~13 limbs to 1-2."""
    key_ranges = key_ranges or (None,) * len(key_cols)
    limbs: List[jax.Array] = []
    acc = None
    bits_used = 0
    for cv, rng in zip(key_cols, key_ranges):
        dt = cv.dtype
        if dt.is_boolean:
            enc, b = cv.data.astype(jnp.int64), 1
        elif cv.is_dict:
            k = cv.dictionary.size
            enc = jnp.clip(cv.data, 0, max(k - 1, 0)).astype(jnp.int64)
            b = max((max(k - 1, 0)).bit_length(), 1)
        elif dt.type_id == "INT8":
            enc, b = cv.data.astype(jnp.int64) + 128, 8
        elif (dt.is_integer or dt.type_id == "DATE") and rng is not None:
            lo, hi = rng
            span = hi - lo
            if span < 0 or span >= (1 << 62):
                return None
            enc = jnp.clip(cv.data.astype(jnp.int64), lo, hi) - np.int64(lo)
            b = max(span.bit_length(), 1)
        else:
            return None
        # per-key null flag (most significant; nulls group last, matching
        # sortkeys.grouping_limbs) and null values neutralized to 0
        enc = jnp.where(cv.validity, enc, 0)
        nf = (~cv.validity).astype(jnp.int64)
        b += 1
        if bits_used + b > 62:
            limbs.append(acc)
            acc, bits_used = None, 0
        piece = (nf << (b - 1)) | enc
        acc = piece if acc is None else ((acc << b) | piece)
        bits_used += b
    if acc is not None:
        limbs.append(acc)
    return limbs


def hash_aggregate(
    batch: Batch,
    group_exprs: Sequence[E.Expr],
    agg_exprs: Sequence[E.AggExpr],
    mode: str,
    max_groups: int,
    out_schema: T.Schema,
    ctx: Optional[EvalContext] = None,
    key_ranges=None,
) -> Batch:
    ctx = ctx or EvalContext()
    max_groups = min(max_groups * max(ctx.agg_scale, 1), batch.capacity)
    if not group_exprs:
        # ungrouped aggregate: exactly one output row — a tight capacity
        # keeps downstream cross joins (scalar-subquery BNLJ chains) from
        # inheriting the input's padding multiplicatively
        max_groups = min(max_groups, 8)
    key_cols = [evaluate(g, batch, ctx) for g in group_exprs]
    packed = _try_pack_keys(key_cols) if key_cols else None
    # Sortless paths:
    # - DENSE (any batch size): packed key domain ≤ denseMaxDomain → masked
    #   full reductions, one fused bandwidth pass per aggregate input. This
    #   is the Q1-class fast path dictionary encoding unlocks.
    # - BUCKET scatter (small batches only): TPU scatter serializes
    #   colliding updates (~700ms per 8M-row scatter, measured), so direct
    #   scatter-adds only when outputs are cheap.
    has_special = any(a.func in _SPECIAL_FUNCS for a in agg_exprs)
    if packed is not None and not has_special:
        from datafusion_comet_tpu.conf import CONF, AGG_DENSE_MAX_DOMAIN

        dense = packed[1] <= max(CONF.get(AGG_DENSE_MAX_DOMAIN), 0)
        if dense or (
            packed[1] <= (1 << _BUCKET_BITS_CAP) and batch.capacity <= (1 << 18)
        ):
            prev = _tls('dense_m', None)
            _TLS.dense_m = packed[1] if dense else None
            try:
                out = _bucket_aggregate(
                    batch, key_cols, agg_exprs, mode, packed, out_schema, ctx
                )
            finally:
                _TLS.dense_m = prev
            if out.capacity > max_groups:
                out = _compact_groups(out, max_groups)
            return out
    # packed but too many buckets for direct scatter: the packed int32 still
    # replaces multi-limb string keys as a single cheap sort key
    if packed is not None:
        key_limbs = [packed[0]]
    else:
        # bucket domain too large: still try to collapse the key tuple into
        # 1-2 packed int64 SORT limbs (dict codes / bools / stats-ranged
        # ints) — grouping order preserved, sort traffic divided by the
        # per-key limb count
        key_limbs = _pack_sort_limbs(key_cols, key_ranges) if key_cols else None
    merging = mode in (AggMode.FINAL, AggMode.PARTIAL_MERGE)

    # Pre-evaluate every aggregate input on the UNSORTED batch and carry the
    # 1-D buffers through the variadic sort (payloads ride the sorting
    # network at ~bandwidth; post-sort gathers cost ~15× — see _segments).
    pre: List[ColumnVector] = []
    names: List[str] = []
    index_of: Dict[int, int] = {}

    def _add(ex: Optional[E.Expr], name: Optional[str] = None) -> None:
        if ex is None or id(ex) in index_of or isinstance(ex, E.Literal):
            return  # literals evaluate anywhere (and percentile needs them raw)
        index_of[id(ex)] = len(pre)
        pre.append(evaluate(ex, batch, ctx))
        names.append(name or f"__agg_in_{len(pre) - 1}")

    if merging:
        state_refs: Dict[str, E.Expr] = {}
        for a in agg_exprs:
            for fld in state_fields(a):
                if fld.name not in state_refs:
                    i = batch.schema.index_of(fld.name)
                    state_refs[fld.name] = E.BoundRef(i, fld.name, batch.schema.fields[i].dtype)
                    _add(state_refs[fld.name], fld.name)
    else:
        for a in agg_exprs:
            _add(a.child)
            _add(a.filter)
            for x in a.extra:
                _add(x)

    payloads: List[jax.Array] = []
    slot_of: Dict[int, int] = {}
    for i, cv in enumerate(pre):
        if cv.data.ndim == 1 and cv.lengths is None and not cv.children:
            slot_of[i] = len(payloads)
            payloads.append(cv.data)
            payloads.append(cv.validity)

    prev_bounds = _tls('seg_bounds', None)
    _TLS.seg_bounds = {}  # per-aggregate (start, end) cache — see _seg_bounds
    try:
        return _sorted_aggregate(
            batch, key_cols, agg_exprs, mode, max_groups, out_schema, ctx,
            key_limbs, payloads, pre, names, index_of, slot_of, merging)
    finally:
        _TLS.seg_bounds = prev_bounds


def _sorted_aggregate(batch, key_cols, agg_exprs, mode, max_groups,
                      out_schema, ctx, key_limbs, payloads, pre, names,
                      index_of, slot_of, merging):
    group_exprs = key_cols  # group-key COLUMNS (already evaluated)
    perm, seg, num_groups, first_orig, sp, sorted_mask = _segments(
        key_cols, batch.row_mask, max_groups, key_limbs, payloads
    )
    sorted_cvs: List[ColumnVector] = []
    for i, cv in enumerate(pre):
        if i in slot_of:
            s = slot_of[i]
            sorted_cvs.append(ColumnVector(sp[s], sp[s + 1], None, cv.dtype,
                                           dictionary=cv.dictionary))
        else:  # strings / nested: gather once via the permutation
            sorted_cvs.append(cv.take(perm))
    synth_schema = T.Schema([T.Field(n, c.dtype) for n, c in zip(names, sorted_cvs)])
    synth = Batch(tuple(sorted_cvs), sorted_mask, synth_schema)
    # perm=None signals "already in sorted order" — gathers are skipped
    # entirely (a TPU gather costs ~180ms per 8M rows even with identity
    # indices; the payload sort already delivered sorted buffers)

    def _ref(ex: Optional[E.Expr]) -> Optional[E.Expr]:
        if ex is None or isinstance(ex, E.Literal):
            return ex
        i = index_of[id(ex)]
        return E.BoundRef(i, names[i], pre[i].dtype)

    out_cols: List[ColumnVector] = []
    # group-key output columns: gather each group's first row.
    # SQL contract: an UNGROUPED aggregate emits exactly one row even over
    # empty input (sum→null, count→0).
    if not group_exprs:
        num_groups = jnp.maximum(num_groups, 1)
    if ctx.overflow_flags is not None and max_groups < batch.capacity:
        # more distinct groups than static capacity → results would silently
        # truncate; surface for the engine's re-plan loop
        ctx.overflow_flags.append(num_groups > max_groups)
    group_mask = jnp.arange(max_groups) < num_groups
    for kc in key_cols:
        out_cols.append(kc.take(first_orig))

    prev_sorted = _tls('sorted_seg', False)
    _TLS.sorted_seg = True  # seg from _segments is nondecreasing → cumsum reductions
    prev_mode = _tls('agg_mode', "single")
    _TLS.agg_mode = mode
    try:
        for a in agg_exprs:
            if merging:
                vals = _merge_agg(a, synth, None, seg, max_groups, group_mask)
            else:
                a2 = dataclasses.replace(
                    a,
                    child=_ref(a.child),
                    filter=_ref(a.filter),
                    extra=tuple(_ref(x) for x in a.extra),
                )
                vals = _input_agg(a2, synth, None, seg, max_groups, group_mask, ctx)
            if mode in (AggMode.SINGLE, AggMode.FINAL):
                out_cols.append(_finalize(a, vals, group_mask))
            else:
                out_cols.extend(vals)
    finally:
        _TLS.sorted_seg = prev_sorted
        _TLS.agg_mode = prev_mode

    # pad/trim columns dtypes already correct; assemble
    return Batch(tuple(out_cols), group_mask, out_schema)


def _compact_groups(batch: Batch, max_groups: int) -> Batch:
    """Pack live groups of a bucket-capacity batch into a max_groups-row
    batch (stable argsort on liveness — cheap relative to the avoided
    full-row sort; bucket order == key order, which downstream relies on)."""
    order = jnp.argsort(~batch.row_mask, stable=True)[:max_groups]
    mask = batch.row_mask[order]
    return batch.take(order, mask)


def _bucket_aggregate(
    batch: Batch,
    key_cols,
    agg_exprs,
    mode: str,
    packed,
    out_schema: T.Schema,
    ctx: EvalContext,
) -> Batch:
    """Direct-bucket aggregation (no sort): output capacity = bucket count,
    live groups = buckets with at least one row."""
    seg_raw, n_buckets = packed
    cap = batch.capacity
    seg = jnp.where(batch.row_mask, seg_raw, n_buckets)
    # perm=None: segment ops accept unsorted ids and read buffers in place
    # (an identity-perm gather costs ~180ms per 8M-row column on v5e)
    perm = None
    if _tls('dense_m', None) is not None and n_buckets <= _tls('dense_m', None):
        present = _dense_sum(jnp.ones(cap, jnp.int32), seg, n_buckets) > 0
    else:
        present = (
            jnp.zeros(n_buckets + 1, jnp.int32).at[seg].add(1, mode="drop")[:n_buckets]
            > 0
        )
    first_orig = _seg_min(jnp.arange(cap, dtype=jnp.int32), seg, n_buckets)
    first_orig = jnp.where(present, jnp.clip(first_orig, 0, cap - 1), 0)
    group_mask = present

    out_cols: List[ColumnVector] = [kc.take(first_orig) for kc in key_cols]
    merging = mode in (AggMode.FINAL, AggMode.PARTIAL_MERGE)
    for a in agg_exprs:
        if merging:
            vals = _merge_agg(a, batch, perm, seg, n_buckets, group_mask)
        else:
            vals = _input_agg(a, batch, perm, seg, n_buckets, group_mask, ctx)
        if mode in (AggMode.SINGLE, AggMode.FINAL):
            out_cols.append(_finalize(a, vals, group_mask))
        else:
            out_cols.extend(vals)
    return Batch(tuple(out_cols), group_mask, out_schema)


# ---- Partial/Single: aggregate raw input rows ---------------------------------------


def _decimal_sum(cv: ColumnVector, x, valid, seg, m, st: T.DataType):
    """Segment-sum into state dtype ``st``. Decimal sums whose sound bound
    (max|value| × rows) exceeds int64 use the i128 4×32-bit-lane
    decomposition: per-lane int64 segment sums cannot overflow for < 2^31
    rows and recombine with carries only at group boundaries (reference:
    spark-expr/src/agg_funcs sum/avg decimal i256 state). Returns
    (state_data, sum_bound_or_None, overflow_mask_or_None); the bound is
    None on the wide path, the overflow mask None on the narrow one."""
    if st.is_decimal and st.is_wide_decimal:
        sb = _dec_bound(cv, cv.dtype if cv.dtype.is_decimal else st) * x.shape[0]
        if cv.is_wide_storage or sb >= _NARROW_LIMIT:
            from datafusion_comet_tpu.exec import decimal_wide as DW
            from datafusion_comet_tpu.utils import int128

            p = DW.pair(x) if x.ndim == 2 else int128.from_i64(x.astype(jnp.int64))
            lanes = DW.decompose4(p)
            sums = [_seg_sum(jnp.where(valid, lane, 0), seg, m) for lane in lanes]
            packed = DW.pack(DW.recombine4(*sums))
            # Spark nulls decimal sums that overflow the 38-digit state.
            # The exact check catches 10^38..2^127; an f64 estimate of the
            # lane sums screens totals big enough to have wrapped i128.
            est = sum(s.astype(jnp.float64) * 2.0 ** (32 * i) for i, s in enumerate(sums))
            over = DW.overflow_check(DW.pair(packed), st.precision) | (jnp.abs(est) >= 1.5e38)
            return packed, None, over
        s = _seg_sum(jnp.where(valid, x, 0).astype(jnp.int64), seg, m)
        return s, sb, None
    xs = jnp.where(valid, x, 0).astype(st.np_dtype())
    return _seg_sum(xs, seg, m), None, None


def _input_agg(
    a: E.AggExpr,
    batch: Batch,
    perm: jax.Array,
    seg: jax.Array,
    m: int,
    group_mask: jax.Array,
    ctx: EvalContext,
) -> List[ColumnVector]:
    f = a.func
    g = (lambda arr: arr) if perm is None else (lambda arr: jnp.take(arr, perm, axis=0))
    active = batch.row_mask
    if a.filter is not None:
        fcv = evaluate(a.filter, batch, ctx)
        active = active & fcv.validity & fcv.data.astype(bool)

    if f == E.AggFunc.COUNT and a.child is None:  # COUNT(*)
        # counts fit int32 (≤ capacity); int64 is emulated on TPU — sum
        # narrow, widen at the group boundary
        cnt = _seg_sum(g(active).astype(jnp.int32), seg, m).astype(jnp.int64)
        return [ColumnVector(cnt, group_mask, None, T.INT64)]

    cv = evaluate(a.child, batch, ctx)
    valid = g(cv.validity & active)
    x = g(cv.data)

    if f == E.AggFunc.COUNT:
        cnt = _seg_sum(valid.astype(jnp.int32), seg, m).astype(jnp.int64)
        return [ColumnVector(cnt, group_mask, None, T.INT64)]

    if f == E.AggFunc.SUM:
        st = _sum_state_dtype(a)
        s, sb, over = _decimal_sum(cv, x, valid, seg, m, st)
        has = _seg_max(valid, seg, m) & group_mask
        if over is not None:
            has = has & ~over
        bound = quantize_bound(sb) if sb is not None else None
        return [ColumnVector(s, has, None, st, mag_bound=bound)]

    if f == E.AggFunc.AVG:
        st = _sum_state_dtype(a)
        s, sb, over = _decimal_sum(cv, x, valid, seg, m, st)
        cnt = _seg_sum(valid.astype(jnp.int32), seg, m).astype(jnp.int64)
        has = (cnt > 0) & group_mask
        if over is not None:
            has = has & ~over
        bound = quantize_bound(sb) if sb is not None else None
        return [
            ColumnVector(s, has, None, st, mag_bound=bound),
            ColumnVector(cnt, group_mask, None, T.INT64),
        ]

    if f in (E.AggFunc.MIN, E.AggFunc.MAX):
        dt = a.child.dtype
        is_min = f == E.AggFunc.MIN
        if dt.is_binary or dt.is_floating or cv.is_wide_storage:
            # multi-limb tournament (exact Spark order: NaN greatest, -0==0;
            # strings: unsigned bytes, prefix first; i128 decimals: hi/lo)
            return [_limb_minmax(a, cv, valid, perm, seg, m, group_mask)]
        ident = _minmax_identity(dt, is_min)
        xs = jnp.where(valid, x, ident)
        s = _seg_min(xs, seg, m) if is_min else _seg_max(xs, seg, m)
        has = _seg_max(valid, seg, m) & group_mask
        # min/max values are a subset of the inputs: the bound carries over
        return [ColumnVector(s.astype(dt.np_dtype()), has, None, dt, mag_bound=cv.mag_bound)]

    if f in (E.AggFunc.FIRST, E.AggFunc.LAST):
        dt = a.child.dtype
        cap = x.shape[0]
        rowpos = jnp.arange(cap, dtype=jnp.int64)
        consider = valid if a.ignore_nulls else g(batch.row_mask)
        pos = jnp.where(consider, rowpos, cap if f == E.AggFunc.FIRST else -1)
        win = (
            _seg_min(pos, seg, m) if f == E.AggFunc.FIRST else _seg_max(pos, seg, m)
        )
        has = _seg_max(consider, seg, m) & group_mask
        win_c = jnp.clip(win, 0, cap - 1).astype(jnp.int32)
        val_cv = ColumnVector(x, g(cv.validity), None if cv.lengths is None else g(cv.lengths), dt, dictionary=cv.dictionary)
        taken = val_cv.take(win_c)
        return [ColumnVector(taken.data, has & taken.validity if not a.ignore_nulls else has, taken.lengths, dt, dictionary=cv.dictionary)]

    if f in _WELFORD_FUNCS:
        xd = jnp.where(valid, x, 0).astype(jnp.float64)
        n = _seg_sum(valid.astype(jnp.float64), seg, m)
        s1 = _seg_sum(xd, seg, m)
        s2 = _seg_sum(xd * xd, seg, m)
        safe_n = jnp.maximum(n, 1.0)
        avg = s1 / safe_n
        m2 = jnp.maximum(s2 - s1 * s1 / safe_n, 0.0)
        return [
            ColumnVector(n, group_mask, None, T.FLOAT64),
            ColumnVector(avg, group_mask, None, T.FLOAT64),
            ColumnVector(m2, group_mask, None, T.FLOAT64),
        ]

    if f in _COVAR_FUNCS:
        ycv = evaluate(a.extra[0], batch, ctx)
        yvalid = g(ycv.validity) & valid
        xd = jnp.where(yvalid, x, 0).astype(jnp.float64)
        yd = jnp.where(yvalid, g(ycv.data), 0).astype(jnp.float64)
        n = _seg_sum(yvalid.astype(jnp.float64), seg, m)
        sx = _seg_sum(xd, seg, m)
        sy = _seg_sum(yd, seg, m)
        sxy = _seg_sum(xd * yd, seg, m)
        sxx = _seg_sum(xd * xd, seg, m)
        syy = _seg_sum(yd * yd, seg, m)
        safe_n = jnp.maximum(n, 1.0)
        xavg, yavg = sx / safe_n, sy / safe_n
        ck = sxy - sx * sy / safe_n
        xm2 = jnp.maximum(sxx - sx * sx / safe_n, 0.0)
        ym2 = jnp.maximum(syy - sy * sy / safe_n, 0.0)
        return [
            ColumnVector(v, group_mask, None, T.FLOAT64)
            for v in (n, xavg, yavg, ck, xm2, ym2)
        ]

    if f in _BIT_FUNCS:
        dt = a.child.dtype
        ident = {
            E.AggFunc.BIT_AND: np.array(-1, dt.np_dtype()),
            E.AggFunc.BIT_OR: np.array(0, dt.np_dtype()),
            E.AggFunc.BIT_XOR: np.array(0, dt.np_dtype()),
        }[f]
        xs = jnp.where(valid, x, ident).astype(jnp.int64)
        if f == E.AggFunc.BIT_AND:
            s = ~_seg_bitor(~xs, seg, m)  # AND(xs) = ~OR(~xs)
        elif f == E.AggFunc.BIT_OR:
            s = _seg_bitor(xs, seg, m)
        else:
            s = _seg_xor(xs, seg, m)
        has = _seg_max(valid, seg, m) & group_mask
        return [ColumnVector(s.astype(dt.np_dtype()), has, None, dt)]

    if f in _BOOL_FUNCS:
        xb = x.astype(bool)
        if f == E.AggFunc.BOOL_AND:
            s = _seg_min(jnp.where(valid, xb, True), seg, m)
        else:
            s = _seg_max(jnp.where(valid, xb, False), seg, m)
        has = _seg_max(valid, seg, m) & group_mask
        return [ColumnVector(s, has, None, T.BOOL)]

    if f in _SPECIAL_FUNCS:
        from datafusion_comet_tpu.exec.operators import agg_special as SP

        raw_valid = cv.validity & active  # original row order
        if f == E.AggFunc.APPROX_PERCENTILE:
            if _tls('agg_mode', "single") == AggMode.PARTIAL:
                return SP.approx_percentile_partial(a, cv, raw_valid, perm, seg, m, group_mask)
            return SP.approx_percentile_exact(a, cv, raw_valid, perm, seg, m, group_mask)
        fn = {
            E.AggFunc.COLLECT_LIST: SP.collect_agg,
            E.AggFunc.COLLECT_SET: SP.collect_agg,
            E.AggFunc.PERCENTILE: SP.percentile_agg,
            E.AggFunc.MEDIAN: SP.percentile_agg,
            E.AggFunc.APPROX_COUNT_DISTINCT: SP.hll_agg,
            E.AggFunc.BLOOM_FILTER: SP.bloom_agg,
        }[f]
        return fn(a, cv, raw_valid, perm, seg, m, group_mask)

    raise NotImplementedError(f"aggregate {f}")


def _argreduce_gather(keys: jax.Array, rowpos: jax.Array, seg, m, is_min: bool):
    """Per-segment argmin/argmax over i64 keys, tie→lowest row. Packs
    (key, rowpos) into a comparable pair via two-stage segment reduce."""
    best = _seg_min(keys, seg, m) if is_min else _seg_max(keys, seg, m)
    cap = keys.shape[0]
    best_per_row = jnp.take(
        jnp.concatenate([best, jnp.zeros(1, best.dtype)]), jnp.minimum(seg, m), axis=0
    )
    is_winner = keys == best_per_row
    pos = jnp.where(is_winner, rowpos, cap)
    win = _seg_min(pos, seg, m)
    return jnp.clip(win, 0, cap - 1).astype(jnp.int32)


def _seg_bitor(x: jax.Array, seg, m) -> jax.Array:
    """Segment bitwise-OR: per-bit max. 64 single-bit passes would be slow;
    instead OR = max works only per bit. We use the observation that for
    unsigned interpretation OR(xs) has each bit = max of that bit; compute
    via 8 passes over 8-bit planes using segment_max of small ints."""
    acc = jnp.zeros_like(_seg_max(x, seg, m))
    for shift in range(0, 64, 8):
        plane = (x >> shift) & 0xFF
        # OR of values in [0,255]: max is NOT or; do per-bit max within plane
        p = jnp.zeros_like(acc)
        for b in range(8):
            bit = (plane >> b) & 1
            p = p | (_seg_max(bit, seg, m) << b)
        acc = acc | (p << shift)
    return acc


def _seg_xor(x: jax.Array, seg, m) -> jax.Array:
    acc = jnp.zeros_like(_seg_max(x, seg, m))
    for shift in range(0, 64, 8):
        plane = (x >> shift) & 0xFF
        p = jnp.zeros_like(acc)
        for b in range(8):
            bit = (plane >> b) & 1
            p = p | ((_seg_sum(bit, seg, m) & 1) << b)
        acc = acc | (p << shift)
    return acc


def _limb_minmax(a, cv: ColumnVector, valid, perm, seg, m, group_mask) -> ColumnVector:
    """min/max over multi-limb orderable types (strings, floats) via per-limb
    tournament: reduce the first limb, keep winners, proceed to next limb."""
    g = (lambda arr: arr) if perm is None else (lambda arr: jnp.take(arr, perm, axis=0))
    limbs = [g(l) for l in sortkeys.column_limbs(cv)]
    is_min = a.func == E.AggFunc.MIN
    cap = valid.shape[0]
    lident = np.int64(np.iinfo(np.int64).max if is_min else np.iinfo(np.int64).min)
    alive = valid
    for l in limbs:
        ls = jnp.where(alive, l, lident)
        best = _seg_min(ls, seg, m) if is_min else _seg_max(ls, seg, m)
        best_per_row = jnp.take(
            jnp.concatenate([best, jnp.zeros(1, best.dtype)]),
            jnp.minimum(seg, m),
            axis=0,
        )
        alive = alive & (l == best_per_row)
    rowpos = jnp.arange(cap, dtype=jnp.int64)
    win = _seg_min(jnp.where(alive, rowpos, cap), seg, m)
    win_c = jnp.clip(win, 0, cap - 1).astype(jnp.int32)
    has = _seg_max(valid, seg, m) & group_mask
    src = ColumnVector(
        g(cv.data),
        g(cv.validity),
        None if cv.lengths is None else g(cv.lengths),
        cv.dtype,
        dictionary=cv.dictionary,
    )
    taken = src.take(win_c)
    return ColumnVector(taken.data, has, taken.lengths, cv.dtype,
                        dictionary=cv.dictionary)


# ---- Final/PartialMerge: merge state columns ----------------------------------------


def _state_cols(a: E.AggExpr, batch: Batch) -> List[ColumnVector]:
    names = [f.name for f in state_fields(a)]
    return [batch.column(n) for n in names]


def _merge_agg(
    a: E.AggExpr, batch: Batch, perm, seg, m, group_mask
) -> List[ColumnVector]:
    f = a.func
    sts = _state_cols(a, batch)
    g = (lambda arr: arr) if perm is None else (lambda arr: jnp.take(arr, perm, axis=0))
    p = lambda cv: (g(cv.data), g(cv.validity) & g(batch.row_mask))

    if f in (E.AggFunc.COUNT, E.AggFunc.COUNT_DISTINCT):
        x, v = p(sts[0])
        cnt = _seg_sum(jnp.where(v, x, 0), seg, m)
        return [ColumnVector(cnt, group_mask, None, T.INT64)]

    if f == E.AggFunc.SUM:
        x, v = p(sts[0])
        s, sb, over = _decimal_sum(sts[0], x, v, seg, m, sts[0].dtype)
        has = _seg_max(v, seg, m) & group_mask
        if over is not None:
            has = has & ~over
        bound = quantize_bound(sb) if sb is not None else None
        return [ColumnVector(s, has, None, sts[0].dtype, mag_bound=bound)]

    if f == E.AggFunc.AVG:
        x, v = p(sts[0])
        c, cv_ = p(sts[1])
        s, sb, over = _decimal_sum(sts[0], x, v, seg, m, sts[0].dtype)
        cnt = _seg_sum(jnp.where(cv_, c, 0), seg, m)
        has = (cnt > 0) & group_mask
        if over is not None:
            has = has & ~over
        bound = quantize_bound(sb) if sb is not None else None
        return [
            ColumnVector(s, has, None, sts[0].dtype, mag_bound=bound),
            ColumnVector(cnt, group_mask, None, T.INT64),
        ]

    if f in (E.AggFunc.MIN, E.AggFunc.MAX, E.AggFunc.FIRST, E.AggFunc.LAST):
        st = sts[0]
        shadow = E.AggExpr(
            E.AggFunc.MIN if f == E.AggFunc.MIN else (E.AggFunc.MAX if f == E.AggFunc.MAX else f),
            _fake_bound(st.dtype),
            a.out_name,
            ignore_nulls=True,
        )
        fake_batch = Batch((st,), batch.row_mask, T.Schema([T.Field("x", st.dtype)]))
        return _input_agg(shadow, fake_batch, perm, seg, m, group_mask, EvalContext())

    if f in _WELFORD_FUNCS:
        n, _ = p(sts[0])
        avg, _ = p(sts[1])
        m2, _ = p(sts[2])
        live = g(batch.row_mask)
        n = jnp.where(live, n, 0.0)
        ntot = _seg_sum(n, seg, m)
        s1 = _seg_sum(n * avg, seg, m)
        safe = jnp.maximum(ntot, 1.0)
        avgt = s1 / safe
        # m2_tot = Σ m2_i + Σ n_i avg_i² − n_tot avg_tot²
        m2t = _seg_sum(jnp.where(live, m2, 0.0) + n * avg * avg, seg, m) - ntot * avgt * avgt
        m2t = jnp.maximum(m2t, 0.0)
        return [
            ColumnVector(ntot, group_mask, None, T.FLOAT64),
            ColumnVector(avgt, group_mask, None, T.FLOAT64),
            ColumnVector(m2t, group_mask, None, T.FLOAT64),
        ]

    if f in _COVAR_FUNCS:
        live = g(batch.row_mask)
        n = jnp.where(live, p(sts[0])[0], 0.0)
        xavg = p(sts[1])[0]
        yavg = p(sts[2])[0]
        ck = jnp.where(live, p(sts[3])[0], 0.0)
        xm2 = jnp.where(live, p(sts[4])[0], 0.0)
        ym2 = jnp.where(live, p(sts[5])[0], 0.0)
        ntot = _seg_sum(n, seg, m)
        safe = jnp.maximum(ntot, 1.0)
        xat = _seg_sum(n * xavg, seg, m) / safe
        yat = _seg_sum(n * yavg, seg, m) / safe
        ckt = _seg_sum(ck + n * xavg * yavg, seg, m) - ntot * xat * yat
        xm2t = jnp.maximum(_seg_sum(xm2 + n * xavg * xavg, seg, m) - ntot * xat * xat, 0.0)
        ym2t = jnp.maximum(_seg_sum(ym2 + n * yavg * yavg, seg, m) - ntot * yat * yat, 0.0)
        return [
            ColumnVector(v, group_mask, None, T.FLOAT64)
            for v in (ntot, xat, yat, ckt, xm2t, ym2t)
        ]

    if f in _BIT_FUNCS or f in _BOOL_FUNCS:
        st = sts[0]
        shadow = E.AggExpr(f, _fake_bound(st.dtype), a.out_name)
        fake_batch = Batch((st,), batch.row_mask, T.Schema([T.Field("x", st.dtype)]))
        return _input_agg(shadow, fake_batch, perm, seg, m, group_mask, EvalContext())

    if f == E.AggFunc.APPROX_PERCENTILE:
        from datafusion_comet_tpu.exec.operators import agg_special as SP

        sketch, cnt = sts[0], sts[1]
        if perm is not None:
            sketch, cnt = sketch.take(perm), cnt.take(perm)
        live = batch.row_mask if perm is None else jnp.take(batch.row_mask, perm)
        return SP.approx_percentile_merge(
            a, sketch, cnt, live, seg, m, group_mask,
            finalize=(_tls('agg_mode', "single") == AggMode.FINAL),
        )

    raise NotImplementedError(f"merge {f}")


def _fake_bound(dt: T.DataType) -> E.BoundRef:
    return E.BoundRef(0, "x", dt)


# ---- Finalize: states → result value -------------------------------------------------


def _finalize(a: E.AggExpr, vals: List[ColumnVector], group_mask) -> ColumnVector:
    f = a.func
    rt = a.result_dtype()
    if f in (E.AggFunc.COUNT, E.AggFunc.COUNT_DISTINCT, E.AggFunc.SUM) or f in _MINMAX_LIKE or f in _BIT_FUNCS or f in _BOOL_FUNCS or f in _SPECIAL_FUNCS:
        out = vals[0]
        if f == E.AggFunc.SUM and rt != out.dtype and not rt.is_decimal:
            return ColumnVector(out.data.astype(rt.np_dtype()), out.validity, None, rt)
        return out
    if f == E.AggFunc.AVG:
        s, cnt = vals[0], vals[1]
        if rt.is_decimal:
            from datafusion_comet_tpu.exec import decimal_wide as DW

            # avg = sum/count at result scale (HALF_UP): lift the sum state
            # (narrow or two-limb) to i128, upscale, divide by the count
            k = rt.scale - s.dtype.scale
            num = DW.rescale(DW.lift(s), k)
            den = jnp.maximum(cnt.data, 1).astype(jnp.int64)
            q = DW._div_i128_i64_full(num, den)
            ok = s.validity & (cnt.data > 0)
            vb = _dec_bound(s, s.dtype) * 10 ** max(k, 0)
            if rt.is_wide_decimal and vb >= _NARROW_LIMIT:
                return ColumnVector(DW.pack(q), ok, None, rt)
            bound = quantize_bound(vb) if rt.is_wide_decimal else None
            return ColumnVector(q[1], ok, None, rt, mag_bound=bound)
        d = s.data.astype(jnp.float64) / jnp.maximum(cnt.data, 1).astype(jnp.float64)
        return ColumnVector(d, s.validity & (cnt.data > 0), None, T.FLOAT64)
    if f in _WELFORD_FUNCS:
        n, avg, m2 = (v.data for v in vals)
        if f == E.AggFunc.VAR_POP:
            d = m2 / jnp.maximum(n, 1.0)
            ok = n >= 1
        elif f == E.AggFunc.VAR_SAMP:
            d = m2 / jnp.maximum(n - 1.0, 1.0)
            ok = n >= 2
        elif f == E.AggFunc.STDDEV_POP:
            d = jnp.sqrt(m2 / jnp.maximum(n, 1.0))
            ok = n >= 1
        else:
            d = jnp.sqrt(m2 / jnp.maximum(n - 1.0, 1.0))
            ok = n >= 2
        # Spark: var_samp of a single row = NaN (not null) when n==1
        d = jnp.where((n == 1.0) & (f in (E.AggFunc.VAR_SAMP, E.AggFunc.STDDEV_SAMP)), jnp.nan, d)
        return ColumnVector(d, (n >= 1) & group_mask, None, T.FLOAT64)
    if f in _COVAR_FUNCS:
        n, xavg, yavg, ck, xm2, ym2 = (v.data for v in vals)
        if f == E.AggFunc.COVAR_POP:
            d = ck / jnp.maximum(n, 1.0)
            ok = n >= 1
        elif f == E.AggFunc.COVAR_SAMP:
            d = jnp.where(n == 1.0, jnp.nan, ck / jnp.maximum(n - 1.0, 1.0))
            ok = n >= 1
        else:  # corr
            denom = jnp.sqrt(xm2 * ym2)
            d = jnp.where(denom == 0.0, jnp.nan, ck / jnp.maximum(denom, 1e-300))
            ok = n >= 1
        return ColumnVector(d, ok & group_mask, None, T.FLOAT64)
    raise NotImplementedError(f"finalize {f}")
