"""Join operators: hash join (all types), null-aware anti, nested loop.

Reference contract: planner.rs:2161-2233 (HashJoin: NullEquality::
NullEqualsNothing — null keys never match; null-aware anti join semantics
:2175-2184) and :2095-2160 (SortMergeJoin). Join types operator.proto:502-534.

TPU-first formulation: a chained hash table would be pointer-chasing; the
DEFAULT path is the **carry-range join** — ONE stable concat sort of
(build, probe) by (invalid, key limbs, side) carries every key group's
build range (start, count) to its probe rows through cumulative scans, so
duplicate-key probing costs two sorts + one gather instead of ~2·log2(build)
sequential binary-search gathers. With a stats output-row estimate the
matches then emit as a **compacted pair list**: per-probe counts cumsum
into output offsets, one unique scatter + cummax assigns each slot its
probe row, and every pair-level gather runs at the estimated-output
capacity (capacity overflow rides the engine's retry loop). Fallbacks:
the expanded (probe × K) block when no estimate exists (row i*K+j =
probe i's j-th match; K overflow re-plans), and the vectorized multi-limb
binary search behind comet.exec.join.carryRange.enabled=false. Unmatched
outer probe rows surface in their j=0 slot with null build columns; FULL
appends unmatched build rows as a build-capacity tail.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec import sortkeys
from datafusion_comet_tpu.exec.batch import Batch, ColumnVector
from datafusion_comet_tpu.exec.evaluator import EvalContext, evaluate, evaluate_predicate
from datafusion_comet_tpu.exec.operators.common import lex_lower_bound, lex_upper_bound
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir.plan import JoinType

__all__ = ["hash_join", "nested_loop_join"]

_DEFAULT_CTX = EvalContext()


def _key_limbs(cols: Sequence[ColumnVector]) -> Tuple[List[jax.Array], jax.Array]:
    """Value limbs for join keys + per-row all-keys-valid flag (null keys
    never match: NullEqualsNothing)."""
    limbs: List[jax.Array] = []
    all_valid = None
    for cv in cols:
        limbs.extend(sortkeys.column_limbs(cv))
        all_valid = cv.validity if all_valid is None else (all_valid & cv.validity)
    return limbs, all_valid


def _harmonize_keys(
    build_keys: List[ColumnVector], probe_keys: List[ColumnVector]
) -> Tuple[List[ColumnVector], List[ColumnVector]]:
    """Dict-encoded keys from DIFFERENT tables carry different code spaces;
    remap both sides' codes into merged-dictionary ranks (trace-time
    constant tables) so they compare as plain int32 — no byte decode."""
    from datafusion_comet_tpu.exec.dictionary import union_ranks

    out_b, out_p = [], []
    for b, p in zip(build_keys, probe_keys):
        if b.is_dict and p.is_dict and b.dictionary != p.dictionary:
            ra, rb = union_ranks(b.dictionary, p.dictionary)
            bk = jnp.take(jnp.asarray(ra), jnp.clip(b.data, 0, len(ra) - 1))
            pk = jnp.take(jnp.asarray(rb), jnp.clip(p.data, 0, len(rb) - 1))
            b = ColumnVector(bk, b.validity, None, T.INT32)
            p = ColumnVector(pk, p.validity, None, T.INT32)
        elif b.is_dict != p.is_dict:
            b, p = b.decode(), p.decode()
        out_b.append(b)
        out_p.append(p)
    return out_b, out_p


def _null_column(
    dt: T.DataType, cap: int, like: Optional[ColumnVector] = None
) -> ColumnVector:
    if like is not None and like.is_dict:
        return ColumnVector(jnp.zeros(cap, jnp.int32), jnp.zeros(cap, bool),
                            None, dt, dictionary=like.dictionary)
    if dt.is_binary:
        return ColumnVector(
            jnp.zeros((cap, dt.byte_width), jnp.uint8),
            jnp.zeros(cap, bool),
            jnp.zeros(cap, jnp.int32),
            dt,
        )
    return ColumnVector(jnp.zeros(cap, dt.np_dtype()), jnp.zeros(cap, bool), None, dt)


def _repeat_cv(cv: ColumnVector, k: int) -> ColumnVector:
    """Repeat each row k times via broadcast+reshape (no gather)."""

    def rep(a):
        if a is None:
            return None
        out = jnp.broadcast_to(a[:, None, ...], (a.shape[0], k) + a.shape[1:])
        return out.reshape((a.shape[0] * k,) + a.shape[1:])

    return ColumnVector(
        rep(cv.data), rep(cv.validity), rep(cv.lengths), cv.dtype,
        tuple(_repeat_cv(c, k) for c in cv.children),
        dictionary=cv.dictionary,
    )


def _concat_cv(a: ColumnVector, b: ColumnVector) -> ColumnVector:
    """Row-concat two columns of the same dtype (dict-aware)."""
    a, b = a.unify_encoding(b)

    def cat(x, y):
        if x is None:
            return None
        if x.ndim > 1 and x.shape[1] != y.shape[1]:
            w = max(x.shape[1], y.shape[1])
            x = jnp.pad(x, ((0, 0), (0, w - x.shape[1])))
            y = jnp.pad(y, ((0, 0), (0, w - y.shape[1])))
        return jnp.concatenate([x, y], axis=0)

    return ColumnVector(
        cat(a.data, b.data), cat(a.validity, b.validity), cat(a.lengths, b.lengths),
        a.dtype, dictionary=a.dictionary,
    )


def _carry_probe_range(blimbs, bvalid, plimbs, pvalid):
    """Gather-free probe matching for ARBITRARY (duplicate-key) build sides.

    Generalizes ``_carry_probe_match`` from one carried build index to a
    carried build *range*: concat(build, probe) → ONE stable sort by
    (invalid, key limbs, side) so each key group lists its build rows first
    → per-sorted-row scans derive the group's build range with no gather:

      start = cummax(where(group_start, position, 0))         (group origin)
      count = builds_strictly_before(row) - builds_strictly_before(start)

    (both operands of ``count`` are cumsums of the build indicator; all of a
    group's build rows precede its probe rows, so for a probe row the
    difference is exactly the group's build-row count). A second sort by
    (side, original index) restores probe order carrying (start, count).

    The j-th match of probe row p then lives at sorted position start[p]+j,
    whose ORIGINAL build index is one gather into the sorted-index payload —
    the only data-dependent gather on the probe path, replacing the general
    path's ~2·log2(build) sequential binary-search gathers (~180 ms each per
    8M rows on v5e, latency-bound).

    Returns (start (pcap,) int32 sorted positions, count (pcap,) int32,
    s_idx (bcap+pcap,) int32 original indices by sorted position — build-
    local at build positions)."""
    bcap = bvalid.shape[0]
    pcap = pvalid.shape[0]
    n = bcap + pcap
    limbs_cat = [jnp.concatenate([b, p]) for b, p in zip(blimbs, plimbs)]
    side = jnp.concatenate([jnp.zeros(bcap, jnp.int32), jnp.ones(pcap, jnp.int32)])
    valid_cat = jnp.concatenate([bvalid, pvalid])
    idx = jnp.concatenate([jnp.arange(bcap, dtype=jnp.int32),
                           jnp.arange(pcap, dtype=jnp.int32)])
    keys = [(~valid_cat).astype(jnp.int32)] + limbs_cat + [side]
    sorted_all = jax.lax.sort(tuple(keys) + (idx,), num_keys=len(keys), is_stable=True)
    s_valid = sorted_all[0] == 0
    s_limbs = list(sorted_all[1: 1 + len(limbs_cat)])
    s_side = sorted_all[1 + len(limbs_cat)]
    s_idx = sorted_all[-1]
    is_build = ((s_side == 0) & s_valid).astype(jnp.int32)
    # new-key boundary (invalid rows are each their own group)
    same = jnp.ones(n - 1, bool)
    for l in s_limbs:
        same = same & (l[1:] == l[:-1])
    newkey = jnp.concatenate([jnp.ones(1, bool), ~same]) | ~s_valid
    pos = jnp.arange(n, dtype=jnp.int32)
    start_pos = jax.lax.cummax(jnp.where(newkey, pos, 0))
    cb_excl = jnp.cumsum(is_build) - is_build  # builds strictly before row
    start_cb = jax.lax.cummax(jnp.where(newkey, cb_excl, 0))  # monotone carry
    count_sorted = (cb_excl - start_cb).astype(jnp.int32)
    # restore probe original order: probe rows first, by original index
    k1 = jnp.where(s_side == 1, 0, 1).astype(jnp.int32)
    back = jax.lax.sort((k1, s_idx, start_pos, count_sorted),
                        num_keys=2, is_stable=True)
    return back[2][:pcap], back[3][:pcap], s_idx


def _carry_probe_group_minmax(blimbs, bvalid, plimbs, pvalid, bpay, bpay_valid):
    """Carry each key group's (any, min, max) over a build payload to its
    probe rows — the semi/anti condition-pushdown primitive.

    Same concat-sort skeleton as ``_carry_probe_range`` (ONE stable sort by
    (invalid, key limbs, side) puts a group's build rows before its probe
    rows), but instead of a (start, count) range it runs one segmented
    associative scan carrying (group id, min, max, any-valid) — so
    ``EXISTS(b in group: b.payload CMP probe_expr)`` answers per probe row
    with NO pair materialization at all. Payload is a single int64 limb
    (integer/date family).

    Returns (any (pcap,) bool, minv (pcap,) int64, maxv (pcap,) int64) in
    probe original order; min/max are over build rows with valid keys AND
    valid payload; ``any`` is whether the group has such a row."""
    bcap = bvalid.shape[0]
    pcap = pvalid.shape[0]
    n = bcap + pcap
    limbs_cat = [jnp.concatenate([b, p]) for b, p in zip(blimbs, plimbs)]
    side = jnp.concatenate([jnp.zeros(bcap, jnp.int32), jnp.ones(pcap, jnp.int32)])
    valid_cat = jnp.concatenate([bvalid, pvalid])
    idx = jnp.concatenate([jnp.arange(bcap, dtype=jnp.int32),
                           jnp.arange(pcap, dtype=jnp.int32)])
    pay_cat = jnp.concatenate([bpay.astype(jnp.int64), jnp.zeros(pcap, jnp.int64)])
    payv_cat = jnp.concatenate(
        [(bpay_valid & bvalid), jnp.zeros(pcap, bool)]).astype(jnp.int32)
    keys = [(~valid_cat).astype(jnp.int32)] + limbs_cat + [side]
    sorted_all = jax.lax.sort(
        tuple(keys) + (idx, pay_cat, payv_cat), num_keys=len(keys), is_stable=True)
    s_valid = sorted_all[0] == 0
    s_limbs = list(sorted_all[1: 1 + len(limbs_cat)])
    s_side = sorted_all[1 + len(limbs_cat)]
    s_idx, s_pay, s_payv = sorted_all[-3], sorted_all[-2], sorted_all[-1]
    same = jnp.ones(n - 1, bool)
    for l in s_limbs:
        same = same & (l[1:] == l[:-1])
    newkey = jnp.concatenate([jnp.ones(1, bool), ~same]) | ~s_valid
    gid = jnp.cumsum(newkey.astype(jnp.int32))
    INT_MIN = jnp.int64(-(2 ** 63))
    INT_MAX = jnp.int64(2 ** 63 - 1)
    live = s_payv == 1
    lo0 = jnp.where(live, s_pay, INT_MAX)
    hi0 = jnp.where(live, s_pay, INT_MIN)

    def combine(a, b):
        ga, lo_a, hi_a, any_a = a
        gb, lo_b, hi_b, any_b = b
        stay = ga == gb
        return (gb,
                jnp.where(stay, jnp.minimum(lo_a, lo_b), lo_b),
                jnp.where(stay, jnp.maximum(hi_a, hi_b), hi_b),
                jnp.where(stay, jnp.maximum(any_a, any_b), any_b))

    _, lo2, hi2, any2 = jax.lax.associative_scan(
        combine, (gid, lo0, hi0, s_payv))
    # probe rows follow their group's build rows, so the inclusive prefix at
    # a probe row covers the whole build side of its group; restore order
    k1 = jnp.where(s_side == 1, 0, 1).astype(jnp.int32)
    back = jax.lax.sort((k1, s_idx, any2, lo2, hi2), num_keys=2, is_stable=True)
    return back[2][:pcap].astype(bool), back[3][:pcap], back[4][:pcap]


_SEMI_MINMAX_FLIP = {"lt": "gt", "le": "ge", "gt": "lt", "ge": "le", "ne": "ne"}


def _bound_ref_indices(e: E.Expr, out: set) -> None:
    if isinstance(e, E.BoundRef):
        out.add(e.index)
    for c in e.children():
        _bound_ref_indices(c, out)


def _semi_minmax_dtype_ok(dt: T.DataType) -> bool:
    return dt.is_integer or dt.type_id == "DATE"


def _semi_cond_decompose(cond: E.Expr, nprobe: int):
    """Detect ``cmp(build_col, probe_expr)`` (either orientation) in a
    pair-schema-bound condition. Returns (op oriented as build OP probe,
    build column index in the BUILD schema, probe-side expr — bindable
    against the probe batch since probe fields lead the pair schema) or
    None when the shape/types don't admit the min/max pushdown."""
    e = cond
    while isinstance(e, E.Alias):
        e = e.child
    if not isinstance(e, E.BinaryOp) or e.op not in _SEMI_MINMAX_FLIP:
        return None

    def bare_build(x):
        return isinstance(x, E.BoundRef) and x.index >= nprobe

    def probe_only(x):
        refs: set = set()
        _bound_ref_indices(x, refs)
        return all(i < nprobe for i in refs)

    if bare_build(e.left) and probe_only(e.right):
        op, bref, pexpr = e.op, e.left, e.right
    elif bare_build(e.right) and probe_only(e.left):
        op, bref, pexpr = _SEMI_MINMAX_FLIP[e.op], e.right, e.left
    else:
        return None
    if not (_semi_minmax_dtype_ok(bref.ref_dtype)
            and pexpr.dtype is not None and _semi_minmax_dtype_ok(pexpr.dtype)):
        return None
    return op, bref.index - nprobe, pexpr


def _carry_probe_match(blimbs, bvalid, plimbs, pvalid):
    """Gather-free probe matching for a UNIQUE-key build side.

    The binary-search probe costs ~2·log2(build) sequential gathers (~180 ms
    per 8M rows on v5e each, index-pattern independent); when build keys are
    unique this replaces them with two variadic sorts + cumulative scans:

      concat(build, probe) → ONE sort by (invalid, key limbs, side) so each
      key group starts with its (single) build row → the group-start build
      index reaches every probe row via a segmented cummax with a monotone
      per-group offset (no gather) → a second sort by (side, original index)
      restores probe order.

    Returns (b_idx (pcap,) int32, matched (pcap,) bool, dup_flag) where
    dup_flag=True means build keys were NOT unique — results are then
    incomplete and the engine must re-plan with the general path."""
    bcap = bvalid.shape[0]
    pcap = pvalid.shape[0]
    n = bcap + pcap
    limbs_cat = [jnp.concatenate([b, p]) for b, p in zip(blimbs, plimbs)]
    side = jnp.concatenate([jnp.zeros(bcap, jnp.int32), jnp.ones(pcap, jnp.int32)])
    valid_cat = jnp.concatenate([bvalid, pvalid])
    idx = jnp.concatenate([jnp.arange(bcap, dtype=jnp.int32),
                           jnp.arange(pcap, dtype=jnp.int32)])
    keys = [(~valid_cat).astype(jnp.int32)] + limbs_cat + [side]
    sorted_all = jax.lax.sort(tuple(keys) + (idx,), num_keys=len(keys), is_stable=True)
    s_valid = sorted_all[0] == 0
    s_limbs = list(sorted_all[1: 1 + len(limbs_cat)])
    s_side = sorted_all[1 + len(limbs_cat)]
    s_idx = sorted_all[-1]
    is_build = (s_side == 0) & s_valid
    # new-key boundary among valid rows
    newkey = jnp.ones(n, bool)
    same = jnp.ones(n - 1, bool)
    for l in s_limbs:
        same = same & (l[1:] == l[:-1])
    newkey = newkey.at[1:].set(~same)
    newkey = newkey | ~s_valid
    # duplicate build keys: a build row whose predecessor is a build row of
    # the same key
    prev_build = jnp.concatenate([jnp.zeros(1, bool), is_build[:-1]])
    dup = jnp.any(is_build & ~newkey & prev_build)
    # segmented carry of the group-start build index via monotone offsets
    gid = jnp.cumsum(newkey.astype(jnp.int64))
    OFF = np.int64(bcap + 2)
    x = jnp.where(is_build & newkey, s_idx.astype(jnp.int64) + 1, 0)
    y = x + gid * OFF
    carried = jax.lax.cummax(y) - gid * OFF
    b_of_sorted = (carried - 1).astype(jnp.int32)  # -1 = no build row in group
    matched_sorted = (carried > 0) & s_valid & (s_side == 1)
    # restore probe original order: probe rows first, by original index
    k1 = jnp.where(s_side == 1, 0, 1).astype(jnp.int32)
    back = jax.lax.sort((k1, s_idx, b_of_sorted, matched_sorted.astype(jnp.int32)),
                        num_keys=2, is_stable=True)
    b_idx = jnp.clip(back[2][:pcap], 0, bcap - 1)
    matched = back[3][:pcap].astype(bool)
    return b_idx, matched, dup


def hash_join(
    left: Batch,
    right: Batch,
    left_keys: Sequence[E.Expr],
    right_keys: Sequence[E.Expr],
    join_type: str,
    build_side: str,
    out_schema: T.Schema,
    condition: Optional[E.Expr] = None,
    max_build_matches: int = 4,
    unique_build: bool = False,
    presorted_build: bool = False,
    key_pack: Optional[Tuple[Tuple[int, int], ...]] = None,
    compact_rows: Optional[int] = None,
    ctx: EvalContext = _DEFAULT_CTX,
    dense_range: Optional[Tuple[int, int]] = None,
    build_key_range: Optional[Tuple[int, int]] = None,
    cond_col_ranges: Optional[dict] = None,
) -> Tuple[Batch, jax.Array]:
    """Returns (joined batch, overflow flag: True if any probe row had more
    than max_build_matches matches OR the compacted pair list overflowed
    ``compact_rows`` — results are then incomplete and the engine must
    re-plan with larger capacities).

    ``compact_rows``: stats-estimated output capacity. When set (and the
    carry-range path runs), the join emits a COMPACTED pair list instead of
    the (probe × K) block: per-probe match counts cumsum into output
    offsets, one tiny scatter + cummax assigns each output slot its probe
    row, and every gather then runs at the estimated-output capacity —
    downstream operators never see the K-expanded mostly-dead block (the
    static-shape analog of DataFusion's exact-size join output batches)."""
    if build_side == "left":
        build, probe = left, right
        build_keys, probe_keys = left_keys, right_keys
    else:
        build, probe = right, left
        build_keys, probe_keys = right_keys, left_keys

    K = max_build_matches
    compact = False
    bcap, pcap = build.capacity, probe.capacity

    bkey_cols = [evaluate(k, build, ctx) for k in build_keys]
    pkey_cols = [evaluate(k, probe, ctx) for k in probe_keys]
    bcmp_cols, pcmp_cols = _harmonize_keys(bkey_cols, pkey_cols)
    pack_oor = None
    if key_pack is not None and len(key_pack) == len(bcmp_cols) and all(
            not c.is_dict and (c.dtype.is_integer or c.dtype.type_id == "DATE")
            for c in bcmp_cols + pcmp_cols):
        # stats-derived composite-key packing: (k1-lo1) + (k2-lo2)*span1 + …
        # is injective within the recorded ranges, so the multi-limb key
        # tuple becomes ONE sort limb; a valid row outside its range raises
        # the overflow flag (retry re-plans without packing)
        def pack(cols):
            acc = jnp.zeros(cols[0].capacity, jnp.int64)
            oor = jnp.zeros(cols[0].capacity, bool)
            valid = cols[0].validity
            stride = 1
            for cv, (lo, hi) in zip(cols, key_pack):
                valid = valid & cv.validity
                k = cv.data.astype(jnp.int64)
                oor = oor | (k < lo) | (k > hi)
                acc = acc + (jnp.clip(k, lo, hi) - lo) * np.int64(stride)
                stride *= hi - lo + 1
            return [acc], valid, oor & valid

        blimbs, bvalid, boor = pack(bcmp_cols)
        plimbs, pvalid, poor = pack(pcmp_cols)
        pack_oor = jnp.any(boor & build.row_mask) | jnp.any(poor & probe.row_mask)
    else:
        blimbs, bvalid = _key_limbs(bcmp_cols)
        plimbs, pvalid = _key_limbs(pcmp_cols)
    bvalid = bvalid & build.row_mask
    pvalid = pvalid & probe.row_mask

    _dense_rng = dense_range if dense_range is not None else build_key_range
    _dense_ok = (
        len(bcmp_cols) == 1 and not bcmp_cols[0].is_dict
        and not pcmp_cols[0].is_dict
        and (bcmp_cols[0].dtype.is_integer
             or bcmp_cols[0].dtype.type_id == "DATE")
        and _dense_rng is not None
        and 0 < int(_dense_rng[1]) - int(_dense_rng[0]) + 1 <= (1 << 24)
    )

    if (_dense_ok and condition is None
            and join_type in (JoinType.LEFT_SEMI, JoinType.LEFT_ANTI,
                              JoinType.EXISTENCE)):
        # sortless dense-bitmap membership (runtime-filter fast path and
        # any semi/anti whose single int key has an exact stats range):
        # one scatter at the key-domain span + one probe gather — no
        # concat sort, no pair list
        lo, hi = _dense_rng
        span = int(hi) - int(lo) + 1
        bk = bcmp_cols[0].data.astype(jnp.int64) - np.int64(lo)
        table = jnp.zeros(span + 1, bool).at[
            jnp.where(bvalid & (bk >= 0) & (bk < span), bk, span)
        ].set(True, mode="drop")
        pk = pcmp_cols[0].data.astype(jnp.int64) - np.int64(lo)
        in_rng = (pk >= 0) & (pk < span)
        # slot `span` is the dead-row sink and may have been scattered to;
        # out-of-range or invalid probe keys must never read it as a hit
        hit = jnp.take(table, jnp.where(in_rng, pk, span)) & pvalid & in_rng
        overflow = pack_oor if pack_oor is not None else jnp.zeros((), bool)
        if join_type == JoinType.LEFT_SEMI:
            return Batch(probe.columns, probe.row_mask & hit,
                         out_schema), overflow
        if join_type == JoinType.LEFT_ANTI:
            return Batch(probe.columns, probe.row_mask & ~hit,
                         out_schema), overflow
        exists_cv = ColumnVector(hit, jnp.ones(pcap, bool), None, T.BOOL)
        return Batch(tuple(probe.columns) + (exists_cv,),
                     probe.row_mask, out_schema), overflow

    from datafusion_comet_tpu.conf import CONF, JOIN_CARRY_RANGE, JOIN_SEMI_MINMAX

    if (condition is not None and build_side != "left" and not unique_build
            and join_type in (JoinType.LEFT_SEMI, JoinType.LEFT_ANTI,
                              JoinType.EXISTENCE)
            and CONF.get(JOIN_SEMI_MINMAX)):
        # condition pushdown: a single comparison against one build column
        # answers per-group via a min/max carry — no pair list exists
        # (q21's self-join `l2.suppkey <> l1.suppkey` shape)
        pair_schema = T.Schema(
            list(probe.schema.fields) + list(build.schema.fields))
        cond_b = (E.bind(_unbind_ok(condition), pair_schema)
                  if condition.dtype is None else condition)
        fast = _semi_cond_decompose(cond_b, len(probe.schema.fields))
        if fast is not None:
            op, b_col_idx, pexpr = fast
            bcv = build.columns[b_col_idx]
            pcv = evaluate(pexpr, probe, ctx)
            # int32-encodable condition column? 64-bit scatters are ~19x
            # slower on v5e (kernels bench), so the dense variant only runs
            # when the build column's exact stats range fits a biased int32
            cname = build.schema.fields[b_col_idx].name
            crng = (cond_col_ranges or {}).get(cname)
            dense_cond = (
                _dense_ok and crng is not None
                and 0 <= int(crng[1]) - int(crng[0]) < (1 << 31) - 2
                and bcv.data.ndim == 1)
            if not bcv.is_dict and not pcv.is_dict:
                if dense_cond:
                    # dense variant: scatter-min/max the (int32-biased)
                    # condition column into the key-domain table — no
                    # concat sort
                    lo, hi = _dense_rng
                    span = int(hi) - int(lo) + 1
                    clo = np.int64(int(crng[0]))
                    bk = bcmp_cols[0].data.astype(jnp.int64) - np.int64(lo)
                    bslot = jnp.where(
                        bvalid & bcv.validity & (bk >= 0) & (bk < span),
                        bk, span)
                    enc = jnp.clip(bcv.data.astype(jnp.int64) - clo,
                                   0, (1 << 31) - 4).astype(jnp.int32)
                    big = jnp.int32((1 << 31) - 2)
                    tmin = jnp.full(span + 1, big, jnp.int32).at[bslot].min(
                        enc, mode="drop")
                    tmax = jnp.full(span + 1, -1, jnp.int32).at[bslot].max(
                        enc, mode="drop")
                    pk = pcmp_cols[0].data.astype(jnp.int64) - np.int64(lo)
                    in_rng = (pk >= 0) & (pk < span)
                    slot = jnp.where(in_rng, pk, span)
                    mi = jnp.take(tmin, slot)
                    ma = jnp.take(tmax, slot)
                    anyv = (mi != big) & in_rng
                    minv = mi.astype(jnp.int64) + clo
                    maxv = ma.astype(jnp.int64) + clo
                else:
                    anyv, minv, maxv = _carry_probe_group_minmax(
                        blimbs, bvalid, plimbs, pvalid,
                        bcv.data, bcv.validity)
                pe = pcv.data.astype(jnp.int64)
                if op == "ne":
                    exists = (minv != pe) | (maxv != pe)
                elif op == "lt":
                    exists = minv < pe
                elif op == "le":
                    exists = minv <= pe
                elif op == "gt":
                    exists = maxv > pe
                else:  # ge
                    exists = maxv >= pe
                has_match = pvalid & pcv.validity & anyv & exists
                overflow = (pack_oor if pack_oor is not None
                            else jnp.zeros((), bool))
                if join_type == JoinType.LEFT_SEMI:
                    return Batch(probe.columns, probe.row_mask & has_match,
                                 out_schema), overflow
                if join_type == JoinType.LEFT_ANTI:
                    return Batch(probe.columns, probe.row_mask & ~has_match,
                                 out_schema), overflow
                exists_cv = ColumnVector(
                    has_match, jnp.ones(pcap, bool), None, T.BOOL)
                return Batch(tuple(probe.columns) + (exists_cv,),
                             probe.row_mask, out_schema), overflow

    if unique_build:
        # PK-FK fast path: ≤1 match per probe row, no binary-search gathers;
        # a duplicate build key raises the overflow flag (the engine then
        # re-plans with the general path)
        K = 1
        if _dense_ok:
            # dense variant: scatter build positions into the exact key
            # domain, probe with one gather — replaces the concat sort
            # entirely (sort ≈ 0.5-1.5 s vs gather ≈ 0.2 s at 8M rows)
            lo, hi = _dense_rng
            span = int(hi) - int(lo) + 1
            bk = bcmp_cols[0].data.astype(jnp.int64) - np.int64(lo)
            bslot = jnp.where(bvalid & (bk >= 0) & (bk < span), bk, span)
            biota = jnp.arange(bcap, dtype=jnp.int32)
            tpos = jnp.zeros(span + 1, jnp.int32).at[bslot].max(
                biota + 1, mode="drop")
            tcnt = jnp.zeros(span + 1, jnp.int32).at[bslot].add(
                jnp.ones(bcap, jnp.int32), mode="drop")
            dup = jnp.any(tcnt[:span] > 1)
            pk = pcmp_cols[0].data.astype(jnp.int64) - np.int64(lo)
            in_rng = (pk >= 0) & (pk < span)
            pos = jnp.take(tpos, jnp.where(in_rng & pvalid, pk, span))
            # slot `span` is the dead-row sink (may hold scattered junk)
            matched = (pos > 0) & in_rng & pvalid
            b_idx = jnp.clip(pos - 1, 0, bcap - 1)
        else:
            b_idx, matched, dup = _carry_probe_match(blimbs, bvalid, plimbs, pvalid)
        count = matched.astype(jnp.int32)
        overflow = dup
        j = jnp.zeros(pcap, jnp.int32)
        p_idx = jnp.arange(pcap, dtype=jnp.int32)
        pair_valid = matched
        has_match = matched
    elif CONF.get(JOIN_CARRY_RANGE):
        # general gather-free path: duplicate build keys carry a (start,
        # count) range through two sorts + scans instead of binary search
        start, cnt, s_idx = _carry_probe_range(blimbs, bvalid, plimbs, pvalid)
        count = jnp.where(pvalid, cnt, 0)
        has_match = count > 0
        if compact_rows is not None:
            # compacted pair list: slot s belongs to probe row p with
            # off[p] <= s < off[p]+slots[p]; p_of_s fills via one unique
            # scatter at group starts + cummax. No K-expansion exists, so
            # the per-probe fan-out cap K is irrelevant here — the ONLY
            # capacity contract is the total pair count
            compact = True
            outer_probe = join_type in (JoinType.LEFT, JoinType.RIGHT, JoinType.FULL)
            slots = count.astype(jnp.int64)
            if outer_probe:
                slots = jnp.where(probe.row_mask, jnp.maximum(slots, 1), slots)
            csum = jnp.cumsum(slots)
            off = csum - slots  # exclusive prefix
            total = csum[-1]
            cap_out = compact_rows
            overflow = total > cap_out
            parange = jnp.arange(pcap, dtype=jnp.int32)
            dest = jnp.where(slots > 0, jnp.minimum(off, cap_out), cap_out)
            pfill = jnp.zeros(cap_out + 1, jnp.int32).at[dest].max(
                parange + 1, mode="drop")[:cap_out]
            p_of_s = jax.lax.cummax(pfill) - 1
            pc = jnp.clip(p_of_s, 0, pcap - 1)
            s_pos = jnp.arange(cap_out, dtype=jnp.int64)
            j = (s_pos - jnp.take(off, pc)).astype(jnp.int32)
            slot_live = (p_of_s >= 0) & (s_pos < total) & (j >= 0)                 & (j < jnp.take(slots, pc).astype(jnp.int32))
            pair_valid = slot_live & (j < jnp.take(count, pc))
            srt_pos = jnp.clip(jnp.take(start, pc) + j, 0, bcap + pcap - 1)
            b_idx = jnp.clip(s_idx[srt_pos], 0, bcap - 1)
            p_idx = pc
        else:
            overflow = jnp.any(count > K)
            j = jnp.tile(jnp.arange(K, dtype=jnp.int32), pcap)
            p_idx = jnp.repeat(jnp.arange(pcap, dtype=jnp.int32), K)
            pair_valid = j < jnp.repeat(jnp.minimum(count, K), K)
            srt_pos = jnp.clip(jnp.repeat(start, K) + j, 0, bcap + pcap - 1)
            b_idx = jnp.clip(s_idx[srt_pos], 0, bcap - 1)
    else:
        iota_b = jnp.arange(bcap, dtype=jnp.int32)
        if presorted_build:
            # merge path: the planner proved the build input is already
            # ordered by the join keys with valid rows front-packed
            # (ir/ordering.py) — the searchsorted probes run directly on
            # the input limbs, no build-side sort
            bperm = iota_b
            sorted_limbs = list(blimbs)
        else:
            # sort build rows: joinable rows first, by key — limbs ride the
            # variadic sort as payloads (post-sort gathers cost ~15× a
            # carried payload on TPU)
            sort_limbs = [(~bvalid).astype(jnp.int64)] + blimbs
            sorted_all = jax.lax.sort(
                tuple(sort_limbs) + (iota_b,) + tuple(blimbs),
                num_keys=len(sort_limbs), is_stable=True,
            )
            bperm = sorted_all[len(sort_limbs)]
            sorted_limbs = list(sorted_all[len(sort_limbs) + 1 :])
        n_build = jnp.sum(bvalid.astype(jnp.int32))

        lo = lex_lower_bound(sorted_limbs, plimbs, n_build)
        hi = lex_upper_bound(sorted_limbs, plimbs, n_build)
        count = jnp.where(pvalid, hi - lo, 0)
        overflow = jnp.any(count > K)

        # matched-pair block: row p*K+j ↦ build sorted index lo[p]+j
        j = jnp.tile(jnp.arange(K, dtype=jnp.int32), pcap)
        p_idx = jnp.repeat(jnp.arange(pcap, dtype=jnp.int32), K)
        pair_valid = j < jnp.repeat(jnp.minimum(count, K), K)
        b_sorted_idx = jnp.clip(jnp.repeat(lo, K) + j, 0, bcap - 1)
        b_idx = bperm[b_sorted_idx]

        has_match = count > 0  # per probe row (before condition)

    if pack_oor is not None:
        overflow = overflow | pack_oor

    if compact:
        # every per-probe flag reaches its output slots via ONE gather at
        # the compacted capacity; dead slots mask through slot_live
        per_probe = lambda x: jnp.take(x, p_idx) & slot_live
        probe_cols = [c.take(p_idx) for c in probe.columns]
    else:
        per_probe = lambda x: jnp.repeat(x, K)
        probe_cols = [_repeat_cv(c, K) for c in probe.columns]

    # build side: data-dependent gather (inherent)
    build_cols = [c.take(b_idx) for c in build.columns]

    if condition is not None:
        # evaluate the extra non-equi predicate on matched pairs
        pair_schema = T.Schema(
            list((left if build_side != "left" else build).schema.fields)
            + list((right if build_side != "left" else probe).schema.fields)
        )
        if build_side == "left":
            pair_cols = tuple(build_cols) + tuple(probe_cols)
            pair_schema = T.Schema(list(build.schema.fields) + list(probe.schema.fields))
        else:
            pair_cols = tuple(probe_cols) + tuple(build_cols)
            pair_schema = T.Schema(list(probe.schema.fields) + list(build.schema.fields))
        pair_batch = Batch(pair_cols, pair_valid, pair_schema)
        cond = E.bind(_unbind_ok(condition), pair_schema) if condition.dtype is None else condition
        cmask = evaluate_predicate(cond, pair_batch, ctx)
        pair_valid = pair_valid & cmask
        has_match = (
            jax.ops.segment_max(
                pair_valid.astype(jnp.int32), p_idx, num_segments=pcap
            ).astype(bool)
        )

    if join_type == JoinType.INNER:
        mask = pair_valid
        out_cols = _assemble(probe_cols, build_cols, build_side)
        return Batch(tuple(out_cols), mask, out_schema), overflow

    if join_type in (JoinType.LEFT, JoinType.RIGHT):
        outer_on_probe = (join_type == JoinType.LEFT) == (build_side != "left")
        if not outer_on_probe:
            raise NotImplementedError(
                "outer side must be the probe side; planner must pick build side accordingly"
            )
        # unmatched probe rows surface in slot j=0 with null build side
        unmatched = probe.row_mask & ~has_match
        un_slot = (j == 0) & per_probe(unmatched)
        mask = pair_valid | un_slot
        null_build = per_probe(~has_match & probe.row_mask) & (j == 0)
        build_cols = [c.with_validity(c.validity & ~null_build) for c in build_cols]
        out_cols = _assemble(probe_cols, build_cols, build_side)
        return Batch(tuple(out_cols), mask, out_schema), overflow

    if join_type == JoinType.FULL:
        # probe-side part as LEFT; plus unmatched build rows appended
        unmatched_p = probe.row_mask & ~has_match
        un_slot = (j == 0) & per_probe(unmatched_p)
        mask_pairs = pair_valid | un_slot
        null_build = per_probe(unmatched_p) & (j == 0)
        build_cols_pairs = [c.with_validity(c.validity & ~null_build) for c in build_cols]
        # build rows that matched no probe row: count probe hits per build row
        hit = jnp.zeros(bcap, jnp.int32).at[b_idx].add(pair_valid.astype(jnp.int32), mode="drop")
        unmatched_b = build.row_mask & (hit == 0)
        tail_probe = [
            _null_column(f.dtype, bcap, like=c)
            for f, c in zip(probe.schema.fields, probe.columns)
        ]
        tail_build = list(build.columns)
        pair_block = _assemble(probe_cols, build_cols_pairs, build_side)
        tail_block = _assemble(tail_probe, tail_build, build_side)
        out_cols = [_concat_cv(a, b) for a, b in zip(pair_block, tail_block)]
        mask = jnp.concatenate([mask_pairs, unmatched_b])
        return Batch(tuple(out_cols), mask, out_schema), overflow

    if join_type in (JoinType.LEFT_SEMI, JoinType.LEFT_ANTI, JoinType.EXISTENCE, JoinType.LEFT_ANTI_NULL_AWARE):
        assert build_side != "left", "semi/anti joins keep the left (probe) side"
        if join_type == JoinType.LEFT_SEMI:
            mask = probe.row_mask & has_match
            return Batch(probe.columns, mask, out_schema), overflow
        if join_type == JoinType.LEFT_ANTI:
            # rows with null keys never match → they pass anti join
            mask = probe.row_mask & ~has_match
            return Batch(probe.columns, mask, out_schema), overflow
        if join_type == JoinType.LEFT_ANTI_NULL_AWARE:
            # NOT IN semantics (reference planner.rs:2175-2184): if the build
            # side has ANY null key, nothing passes; probe rows with null keys
            # never pass.
            build_has_null = jnp.any(build.row_mask & ~_all_valid(bkey_cols))
            mask = probe.row_mask & ~has_match & pvalid & ~build_has_null
            return Batch(probe.columns, mask, out_schema), overflow
        # EXISTENCE: left columns + boolean exists
        exists = ColumnVector(has_match, jnp.ones(pcap, bool), None, T.BOOL)
        return Batch(tuple(probe.columns) + (exists,), probe.row_mask, out_schema), overflow

    raise NotImplementedError(f"join type {join_type}")


def _all_valid(cols: Sequence[ColumnVector]) -> jax.Array:
    v = cols[0].validity
    for c in cols[1:]:
        v = v & c.validity
    return v


def _assemble(probe_cols, build_cols, build_side: str):
    return list(build_cols) + list(probe_cols) if build_side == "left" else list(probe_cols) + list(build_cols)


def _unbind_ok(e: E.Expr) -> E.Expr:
    return e


def nested_loop_join(
    left: Batch,
    right: Batch,
    join_type: str,
    out_schema: T.Schema,
    condition: Optional[E.Expr] = None,
    ctx: EvalContext = _DEFAULT_CTX,
) -> Batch:
    """Broadcast nested-loop join: full cross product (cap_l × cap_r) with a
    condition mask (reference: planner.rs:1377 BNLJ). Use only when one side
    is small (the planner broadcasts the small side)."""
    from datafusion_comet_tpu.conf import BNLJ_MAX_PRODUCT, CONF

    limit = CONF.get(BNLJ_MAX_PRODUCT)
    if limit and left.capacity * right.capacity > limit:
        raise MemoryError(
            f"BNLJ cross product {left.capacity} x {right.capacity} rows exceeds "
            f"comet.exec.bnlj.maxProductRows={limit}; add equi-join keys or "
            f"filter the broadcast side"
        )
    lcap, rcap = left.capacity, right.capacity
    li = jnp.repeat(jnp.arange(lcap, dtype=jnp.int32), rcap)
    ri = jnp.tile(jnp.arange(rcap, dtype=jnp.int32), lcap)
    lcols = [c.take(li) for c in left.columns]
    rcols = [c.take(ri) for c in right.columns]
    pair_live = left.row_mask[li] & right.row_mask[ri]
    pair_schema = T.Schema(list(left.schema.fields) + list(right.schema.fields))
    pair = Batch(tuple(lcols) + tuple(rcols), pair_live, pair_schema)
    if condition is not None:
        cmask = evaluate_predicate(condition, pair, ctx)
    else:
        cmask = pair_live
    if join_type == JoinType.INNER:
        return Batch(pair.columns, cmask, out_schema)
    if join_type == JoinType.LEFT:
        has = jax.ops.segment_max(cmask.astype(jnp.int32), li, num_segments=lcap).astype(bool)
        un = left.row_mask & ~has
        un_slot = (ri == 0) & jnp.repeat(un, rcap)
        null_r = jnp.repeat(un, rcap) & (ri == 0)
        rcols2 = [c.with_validity(c.validity & ~null_r) for c in rcols]
        return Batch(tuple(lcols) + tuple(rcols2), cmask | un_slot, out_schema)
    if join_type == JoinType.LEFT_SEMI:
        has = jax.ops.segment_max(cmask.astype(jnp.int32), li, num_segments=lcap).astype(bool)
        return Batch(left.columns, left.row_mask & has, out_schema)
    if join_type == JoinType.LEFT_ANTI:
        has = jax.ops.segment_max(cmask.astype(jnp.int32), li, num_segments=lcap).astype(bool)
        return Batch(left.columns, left.row_mask & ~has, out_schema)
    if join_type == JoinType.RIGHT:
        # mirror of LEFT: unmatched right rows once, with null left side
        has_r = jax.ops.segment_max(cmask.astype(jnp.int32), ri, num_segments=rcap).astype(bool)
        un_r = right.row_mask & ~has_r
        un_slot = (li == 0) & jnp.tile(un_r, lcap)
        lcols2 = [c.with_validity(c.validity & ~un_slot) for c in lcols]
        return Batch(tuple(lcols2) + tuple(rcols), cmask | un_slot, out_schema)
    if join_type == JoinType.FULL:
        # left-join block, then unmatched right rows appended in their own
        # rcap-slot tail (no slot-sharing edge cases)
        has_l = jax.ops.segment_max(cmask.astype(jnp.int32), li, num_segments=lcap).astype(bool)
        has_r = jax.ops.segment_max(cmask.astype(jnp.int32), ri, num_segments=rcap).astype(bool)
        un_l_slot = (ri == 0) & jnp.repeat(left.row_mask & ~has_l, rcap)
        live_main = cmask | un_l_slot

        def append_tail(cv_main: ColumnVector, cv_tail: Optional[ColumnVector], dt) -> ColumnVector:
            if cv_tail is None:  # null left side in the tail
                tail = _null_column(dt, rcap, like=cv_main)
            else:
                tail = cv_tail
            return _concat_cv(cv_main, tail)

        lcols2 = [
            append_tail(c, None, f.dtype)
            for c, f in zip(lcols, left.schema.fields)
        ]
        rcols2 = [
            append_tail(c.with_validity(c.validity & ~un_l_slot), rc, f.dtype)
            for c, rc, f in zip(rcols, right.columns, right.schema.fields)
        ]
        live = jnp.concatenate([live_main, right.row_mask & ~has_r])
        return Batch(tuple(lcols2) + tuple(rcols2), live, out_schema)
    raise NotImplementedError(f"nested loop join type {join_type}")
