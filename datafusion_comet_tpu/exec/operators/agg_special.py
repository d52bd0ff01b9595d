"""Special aggregates: collect_list/set, exact percentile/median, HLL++
approx_count_distinct, and the Spark-compatible bloom filter aggregate.

Reference kernels being re-designed TPU-first:
- collect_list/collect_set   (spark-expr/src/agg_funcs/ collect ops)
- percentile                 (agg_funcs/percentile — exact, interpolated)
- approx_count_distinct      (agg_funcs/hll_plus_plus.rs — HLL++ dense)
- bloom_filter_agg           (spark-expr/src/bloom_filter/, spark_bit_array.rs)

All are formulated as segmented scatter/reduce over a (group, value)-sorted
permutation — no per-group loops:
- collect: position-within-group scatter into a (groups, E) element matrix;
- percentile: rank-within-group gather + linear interpolation;
- HLL++: segment_max over (group × register) flattened ids;
- bloom: scatter-or into a (groups × num_bits) bit matrix, then on-device
  big-endian long packing matching Spark's BloomFilterImpl.writeTo layout.
"""

from __future__ import annotations

import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import Batch, ColumnVector
from datafusion_comet_tpu.exec import sortkeys
from datafusion_comet_tpu.ir import expr as E

__all__ = [
    "collect_agg",
    "approx_percentile_exact",
    "approx_percentile_partial",
    "approx_percentile_merge",
    "percentile_agg",
    "hll_agg",
    "bloom_agg",
    "bloom_might_contain",
    "bloom_num_hash_functions",
]


def _group_of_row(perm, seg, cap):
    if perm is None:  # rows already in sorted (grouped) order
        return seg
    return jnp.zeros(cap, seg.dtype).at[perm].set(seg)


def _seg_sum(x, seg, m):
    return jax.ops.segment_sum(x, seg, num_segments=m + 1)[:m]


def _seg_min(x, seg, m):
    return jax.ops.segment_min(x, seg, num_segments=m + 1)[:m]


def _seg_max(x, seg, m):
    return jax.ops.segment_max(x, seg, num_segments=m + 1)[:m]


# -------------------------------------------------------------------------------------
# collect_list / collect_set
# -------------------------------------------------------------------------------------


def collect_agg(
    a: E.AggExpr,
    cv: ColumnVector,
    valid: jax.Array,  # (cap,) value non-null AND row active, original order
    perm,
    seg,
    m: int,
    group_mask,
) -> List[ColumnVector]:
    """collect_list/collect_set over one group-sorted batch. Values beyond
    ``max_elems`` per group are dropped (static capacity; mirror of the
    reference's unbounded growth — callers size max_elems to the workload)."""
    cap = valid.shape[0]
    gor = _group_of_row(perm, seg, cap)
    Emax = a.max_elems
    gperm = (lambda arr: arr) if perm is None else (lambda arr: arr[perm])
    if a.func == E.AggFunc.COLLECT_SET:
        # sort by (group, value) and keep first occurrence per run
        limbs = [jnp.where(valid, gor, m).astype(jnp.int64)] + sortkeys.column_limbs(cv)
        perm2 = sortkeys.lexsort(limbs)
        sorted_valid = valid[perm2]
        changed = jnp.zeros(cap, bool).at[0].set(True)
        for l in limbs:
            s = l[perm2]
            changed = changed | jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
        keep = sorted_valid & changed
        use_perm, use_valid = perm2, keep
    else:
        use_perm = perm
        use_valid = gperm(valid)

    g_sorted = gor[use_perm] if use_perm is not None else gor
    g_eff = jnp.where(use_valid, g_sorted, m)
    # position within group among KEPT values: exclusive running count per seg
    ones = use_valid.astype(jnp.int32)
    incl = _running_count(g_eff, ones, m, cap)
    pos = incl - 1  # 0-based slot
    slot_ok = use_valid & (pos < Emax) & (pos >= 0)
    flat = jnp.where(slot_ok, g_eff * Emax + pos, m * Emax)

    if use_perm is None:
        src = cv
    else:
        src = ColumnVector(
            cv.data[use_perm],
            cv.validity[use_perm],
            None if cv.lengths is None else cv.lengths[use_perm],
            cv.dtype,
            tuple(c.take(use_perm) for c in cv.children),
        )

    def scatter(arr, fill=0):
        out_shape = (m * Emax + 1,) + arr.shape[1:]
        out = jnp.full(out_shape, fill, arr.dtype)
        out = out.at[flat].set(arr, mode="drop")
        return out[: m * Emax].reshape((m, Emax) + arr.shape[1:])

    elem = ColumnVector(
        scatter(src.data),
        scatter(src.validity.astype(bool), False),
        None if src.lengths is None else scatter(src.lengths),
        cv.dtype,
        tuple(
            ColumnVector(scatter(c.data), scatter(c.validity, False),
                         None if c.lengths is None else scatter(c.lengths), c.dtype)
            for c in src.children
        ),
    )
    lens = _seg_sum(slot_ok.astype(jnp.int32), g_eff, m)
    out_dtype = T.list_(cv.dtype, Emax)
    return [ColumnVector(lens, group_mask, None, out_dtype, (elem,))]


def _running_count(seg_sorted, ones, m, cap):
    """Inclusive running count of ones within each segment (rows sorted by
    segment): cumsum minus the segment's base offset."""
    c = jnp.cumsum(ones)
    base_per_seg = _seg_min(jnp.where(ones > 0, c - ones, np.iinfo(np.int32).max), seg_sorted, m)
    base_per_seg = jnp.concatenate([base_per_seg, jnp.zeros(1, base_per_seg.dtype)])
    base = jnp.take(base_per_seg, jnp.minimum(seg_sorted, m))
    return c - base


# -------------------------------------------------------------------------------------
# exact percentile / median
# -------------------------------------------------------------------------------------


def percentile_agg(
    a: E.AggExpr,
    cv: ColumnVector,
    valid: jax.Array,
    perm,
    seg,
    m: int,
    group_mask,
) -> List[ColumnVector]:
    """Spark exact percentile: linear interpolation at rank (n-1)*p.
    median(x) = percentile(x, 0.5)."""
    if a.func == E.AggFunc.MEDIAN:
        ps, is_array = [0.5], False
    else:
        lit = a.extra[0]
        assert isinstance(lit, E.Literal), "percentile percentage must be literal"
        is_array = isinstance(lit.value, (list, tuple))
        ps = [float(v) for v in lit.value] if is_array else [float(lit.value)]
    cap = valid.shape[0]
    gor = _group_of_row(perm, seg, cap)
    limbs = [jnp.where(valid, gor, m).astype(jnp.int64)] + sortkeys.column_limbs(cv)
    perm2 = sortkeys.lexsort(limbs)
    sv = valid[perm2]
    g2 = jnp.where(sv, gor[perm2], m)
    x2 = cv.data[perm2].astype(jnp.float64)
    n = _seg_sum(sv.astype(jnp.int32), g2, m)
    # rank of each sorted row within its group
    rank = _running_count(g2, sv.astype(jnp.int32), m, cap) - 1
    def value_at(k):  # (m,) k per group → value of that rank
        k_per_row = jnp.take(jnp.concatenate([k, jnp.zeros(1, k.dtype)]), jnp.minimum(g2, m))
        hit = sv & (rank == k_per_row)
        contrib = jnp.where(hit, x2, 0.0)
        return _seg_sum(contrib, g2, m)

    per_p = []
    for p in ps:
        target = (n.astype(jnp.float64) - 1.0) * p
        lo = jnp.floor(target).astype(jnp.int32)
        hi = jnp.ceil(target).astype(jnp.int32)
        frac = target - lo.astype(jnp.float64)
        per_p.append(value_at(lo) + (value_at(hi) - value_at(lo)) * frac)
    has = (n > 0) & group_mask
    if not is_array:
        return [ColumnVector(per_p[0], has, None, T.FLOAT64)]
    # percentile(x, array(p1..pk)) → ARRAY<double> result (Spark semantics)
    elem = ColumnVector(jnp.stack(per_p, axis=1),
                        jnp.broadcast_to(has[:, None], (m, len(ps))),
                        None, T.FLOAT64)
    return [ColumnVector(jnp.full(m, len(ps), jnp.int32), has, None,
                         T.list_(T.FLOAT64, len(ps)), (elem,))]


# -------------------------------------------------------------------------------------
# HLL++ approx_count_distinct
# -------------------------------------------------------------------------------------

_HLL_P = 9  # 512 registers ≈ Spark default rsd 0.05


def hll_agg(
    a: E.AggExpr,
    cv: ColumnVector,
    valid: jax.Array,
    perm,
    seg,
    m: int,
    group_mask,
) -> List[ColumnVector]:
    """Dense HLL++ (reference: agg_funcs/hll_plus_plus.rs). xxhash64 values,
    top-p bits pick a register, rank = leading-zeros-of-rest + 1, registers
    combine by max; standard bias-corrected estimate + linear counting for
    the small range. Deviation (documented): Spark's empirical bias-table
    correction is omitted — both are approximations within rsd."""
    from datafusion_comet_tpu.exec.evaluator import _xxhash64_column

    P = _HLL_P
    M = 1 << P
    cap = valid.shape[0]
    gor = _group_of_row(perm, seg, cap)
    h = _xxhash64_column(cv, jnp.int64(42))
    reg = jnp.right_shift(h, np.int64(64 - P)) & np.int64(M - 1)
    rest = h << np.int64(P)
    # leading zeros of a 64-bit value via float trick-free bit scan
    lz = _clz64(rest)
    rank = jnp.minimum(lz + 1, 64 - P + 1).astype(jnp.int32)
    flat = jnp.where(valid, gor.astype(jnp.int64) * M + reg, np.int64(m) * M)
    regs = (
        jnp.zeros(m * M + 1, jnp.int32).at[flat].max(rank, mode="drop")[: m * M]
    ).reshape(m, M)
    alpha = 0.7213 / (1.0 + 1.079 / M)
    z = jnp.sum(jnp.exp2(-regs.astype(jnp.float64)), axis=1)
    est = alpha * M * M / z
    zeros = jnp.sum(regs == 0, axis=1).astype(jnp.float64)
    lin = M * jnp.log(M / jnp.maximum(zeros, 1.0))
    use_lin = (est <= 2.5 * M) & (zeros > 0)
    est = jnp.where(use_lin, lin, est)
    vsorted = valid if perm is None else valid[perm]
    has = _seg_max(vsorted, seg, m) & group_mask
    return [ColumnVector(jnp.round(est).astype(jnp.int64), has, None, T.INT64)]


def _clz64(x: jax.Array) -> jax.Array:
    """Count leading zeros of int64 (bit-parallel, no 64-bit float casts)."""
    n = jnp.zeros(x.shape, jnp.int32)
    y = x
    for shift in (32, 16, 8, 4, 2, 1):
        mask = y >> np.int64(64 - shift) == 0
        n = jnp.where(mask, n + shift, n)
        y = jnp.where(mask, y << np.int64(shift), y)
    return jnp.where(x == 0, 64, n)


# -------------------------------------------------------------------------------------
# bloom filter aggregate + might_contain
# -------------------------------------------------------------------------------------


def bloom_num_hash_functions(num_bits: int, num_items: int) -> int:
    """Spark BloomFilter.optimalNumOfHashFunctions(n, m) = max(1, round(m/n ln2))."""
    return max(1, int(round(num_bits / max(num_items, 1) * math.log(2))))


def _bloom_hashes(cv: ColumnVector):
    from datafusion_comet_tpu.exec.evaluator import (
        murmur3_hash_bytes,
        murmur3_hash_i64,
    )

    if cv.dtype.is_binary:
        cv = cv.decode()  # dict codes → raw bytes (hash parity needs bytes)
        h1 = murmur3_hash_bytes(cv.data, cv.lengths, jnp.int32(0), cv.dtype.byte_width)
        h2 = murmur3_hash_bytes(cv.data, cv.lengths, h1, cv.dtype.byte_width)
    else:
        x = cv.data.astype(jnp.int64)
        h1 = murmur3_hash_i64(x, jnp.int32(0))
        h2 = murmur3_hash_i64(x, h1)
    return h1, h2


def _bloom_bit_indices(cv: ColumnVector, k: int, num_bits: int):
    """k bit indices per row — Spark BloomFilterImpl.putLong combined-hash
    scheme: combined = h1 + i*h2 (i32 wraparound), ~x when negative,
    % bitSize."""
    h1, h2 = _bloom_hashes(cv)
    idxs = []
    for i in range(1, k + 1):
        combined = h1 + jnp.int32(i) * h2
        combined = jnp.where(combined < 0, ~combined, combined)
        idxs.append(combined.astype(jnp.int64) % np.int64(num_bits))
    return idxs


def bloom_agg(
    a: E.AggExpr,
    cv: ColumnVector,
    valid: jax.Array,
    perm,
    seg,
    m: int,
    group_mask,
) -> List[ColumnVector]:
    num_bits = a.num_bits
    assert num_bits % 64 == 0
    k = bloom_num_hash_functions(num_bits, getattr(a, "num_items", 1000000) or 1000000)
    # Spark caps by expected items; allow explicit override via extra literal
    if a.extra:
        k = bloom_num_hash_functions(num_bits, int(a.extra[0].value))
    cap = valid.shape[0]
    gor = _group_of_row(perm, seg, cap)
    bits = jnp.zeros(m * num_bits + 1, jnp.uint8)
    base = jnp.where(valid, gor.astype(jnp.int64) * num_bits, np.int64(m) * num_bits)
    for idx in _bloom_bit_indices(cv, k, num_bits):
        bits = bits.at[jnp.where(valid, base + idx, np.int64(m) * num_bits)].max(
            np.uint8(1), mode="drop"
        )
    bit_mat = bits[: m * num_bits].reshape(m, num_bits)
    W = num_bits // 64
    # pack to Java-serialized layout: per long, big-endian bytes; bit j of a
    # long is (1L << j) → BE byte b holds bits 56-8b .. 63-8b of the long
    bytes_out = jnp.zeros((m, W, 8), jnp.uint8)
    for b in range(8):
        acc = jnp.zeros((m, W), jnp.uint8)
        for t in range(8):
            p = 56 - 8 * b + t
            acc = acc | (bit_mat[:, p::64].astype(jnp.uint8) << t)
        bytes_out = bytes_out.at[:, :, b].set(acc)
    body = bytes_out.reshape(m, W * 8)
    header = np.zeros(12, np.uint8)
    header[0:4] = np.frombuffer(np.int32(1).byteswap().tobytes(), np.uint8)  # V1
    header[4:8] = np.frombuffer(np.int32(k).byteswap().tobytes(), np.uint8)
    header[8:12] = np.frombuffer(np.int32(W).byteswap().tobytes(), np.uint8)
    hdr = jnp.broadcast_to(jnp.asarray(header)[None, :], (m, 12))
    data = jnp.concatenate([hdr, body], axis=1)
    total = 12 + W * 8
    vsorted = valid if perm is None else valid[perm]
    has = _seg_max(vsorted, seg, m) & group_mask
    out_dtype = T.binary(total)
    return [
        ColumnVector(data, has, jnp.full(m, total, jnp.int32), out_dtype)
    ]


def parse_bloom_bytes(buf: bytes):
    """Host-side parse of the Spark serialized filter → (k, bits bool array)."""
    version = int.from_bytes(buf[0:4], "big", signed=True)
    assert version == 1, f"unsupported bloom version {version}"
    k = int.from_bytes(buf[4:8], "big", signed=True)
    w = int.from_bytes(buf[8:12], "big", signed=True)
    words = np.frombuffer(buf[12 : 12 + w * 8], dtype=">i8").astype(np.int64)
    num_bits = w * 64
    j = np.arange(num_bits)
    bits = (words[j >> 6] >> (j & 63)) & 1
    return k, bits.astype(bool)


def bloom_might_contain(filter_bytes: Optional[bytes], cv: ColumnVector) -> ColumnVector:
    cap = cv.capacity
    if filter_bytes is None:
        return ColumnVector(jnp.zeros(cap, bool), jnp.zeros(cap, bool), None, T.BOOL)
    k, bits = parse_bloom_bytes(filter_bytes)
    num_bits = bits.shape[0]
    table = jnp.asarray(bits)
    ok = jnp.ones(cap, bool)
    for idx in _bloom_bit_indices(cv, k, num_bits):
        ok = ok & jnp.take(table, idx)
    return ColumnVector(ok, cv.validity, None, T.BOOL)


# -------------------------------------------------------------------------------------
# approx_percentile (reference: agg_funcs/approx_percentile — QuantileSummaries)
# -------------------------------------------------------------------------------------
# TPU-first redesign: instead of Greenwald-Khanna's sequential sample pruning,
# the combinable state is K equi-rank samples per group (+ row count) — built
# with one (group, value) sort and merged by weighted-rank selection over
# cumulative-weight scans. Rank error ~ n/(2K) per compression (documented
# deviation: Spark's accuracy argument is validated but the sketch size is
# comet.exec.agg.approxPercentile.sketchSize). SINGLE mode skips the sketch
# and returns the exact element at Spark's target rank ceil(p*n).
# Samples are stored as (f32 value, f32 residual) pairs — the TPU X64 rewrite
# has no f64 bitcast, and the pair recovers ~48 mantissa bits.


def _pct_params(a: E.AggExpr) -> float:
    lit = a.extra[0]
    assert isinstance(lit, E.Literal), "approx_percentile percentage must be literal"
    p = float(lit.value)
    if not (0.0 <= p <= 1.0):
        raise ValueError(f"approx_percentile percentage {p} not in [0, 1]")
    if len(a.extra) > 1 and isinstance(a.extra[1], E.Literal):
        acc = int(a.extra[1].value)
        if acc <= 0:
            raise ValueError(f"approx_percentile accuracy must be positive, got {acc}")
    return p


def _sketch_k() -> int:
    from datafusion_comet_tpu.conf import APPROX_PCT_SKETCH, CONF

    return int(CONF.get(APPROX_PCT_SKETCH))


def _encode_sketch(samples: jax.Array) -> jax.Array:
    """(m, K) f64 → (m, 8K) uint8 as (f32 value, f32 residual) pairs."""
    hi = samples.astype(jnp.float32)
    lo = (samples - hi.astype(jnp.float64)).astype(jnp.float32)
    pair = jnp.stack([hi, lo], axis=-1)  # (m, K, 2)
    b = jax.lax.bitcast_convert_type(pair, jnp.uint8)  # (m, K, 2, 4)
    return b.reshape(samples.shape[0], -1)


def _decode_sketch(data: jax.Array, k: int) -> jax.Array:
    """(cap, 8K) uint8 → (cap, K) f64."""
    b = data.reshape(data.shape[0], k, 2, 4)
    pair = jax.lax.bitcast_convert_type(b, jnp.float32)  # (cap, K, 2)
    return pair[..., 0].astype(jnp.float64) + pair[..., 1].astype(jnp.float64)


def _to_result(val: jax.Array, rt: T.DataType) -> jax.Array:
    if rt.is_integer:
        return jnp.rint(val).astype(rt.np_dtype()) if val.dtype == jnp.float64 else val.astype(rt.np_dtype())
    return val.astype(rt.np_dtype())


def approx_percentile_exact(
    a: E.AggExpr, cv: ColumnVector, valid, perm, seg, m: int, group_mask
) -> List[ColumnVector]:
    """SINGLE mode: the exact element at rank ceil(p*n) (1-indexed) — error 0
    satisfies any QuantileSummaries accuracy bound."""
    p = _pct_params(a)
    if cv.dtype.is_binary or cv.dtype.is_nested or getattr(cv, "is_wide_storage", False):
        raise NotImplementedError("approx_percentile over non-numeric input")
    cap = valid.shape[0]
    gor = _group_of_row(perm, seg, cap)
    cvd = cv.decode() if cv.is_dict else cv
    limbs = [jnp.where(valid, gor, m).astype(jnp.int64)] + sortkeys.column_limbs(cvd)
    perm2 = sortkeys.lexsort(limbs)
    sv = valid[perm2]
    g2 = jnp.where(sv, gor[perm2], m)
    x2 = cvd.data[perm2]
    n = _seg_sum(sv.astype(jnp.int32), g2, m)
    rank = _running_count(g2, sv.astype(jnp.int32), m, cap) - 1  # 0-indexed
    k = jnp.clip(jnp.ceil(p * n.astype(jnp.float64)).astype(jnp.int32) - 1,
                 0, jnp.maximum(n - 1, 0))
    k_per_row = jnp.take(jnp.concatenate([k, jnp.zeros(1, k.dtype)]), jnp.minimum(g2, m))
    hit = sv & (rank == k_per_row)
    res = _seg_sum(jnp.where(hit, x2, jnp.zeros_like(x2)), g2, m)
    rt = a.result_dtype()
    return [ColumnVector(_to_result(res, rt), (n > 0) & group_mask, None, rt)]


def approx_percentile_partial(
    a: E.AggExpr, cv: ColumnVector, valid, perm, seg, m: int, group_mask
) -> List[ColumnVector]:
    """PARTIAL mode: per-group K equi-rank samples + count (state columns)."""
    _pct_params(a)  # validate literals early
    K = _sketch_k()
    if cv.dtype.is_binary or cv.dtype.is_nested or getattr(cv, "is_wide_storage", False):
        raise NotImplementedError("approx_percentile over non-numeric input")
    cap = valid.shape[0]
    gor = _group_of_row(perm, seg, cap)
    cvd = cv.decode() if cv.is_dict else cv
    xf = cvd.data.astype(jnp.float64)
    limbs = [jnp.where(valid, gor, m).astype(jnp.int64)] + sortkeys._float_orderable(
        jnp.where(valid, xf, 0.0))
    perm2 = sortkeys.lexsort(limbs)
    sv = valid[perm2]
    g2 = jnp.where(sv, gor[perm2], m)
    x2 = xf[perm2]
    n = _seg_sum(sv.astype(jnp.int32), g2, m)  # (m,) valid rows per group
    gstart = jnp.concatenate(
        [jnp.zeros(1, jnp.int64), jnp.cumsum(n.astype(jnp.int64))[:-1]])
    t = jnp.arange(K, dtype=jnp.float64)
    # equi-rank sample index within group: floor((t+0.5)/K * n), clipped
    within = jnp.minimum(((t[None, :] + 0.5) * n[:, None].astype(jnp.float64)
                          / K).astype(jnp.int64), jnp.maximum(n[:, None] - 1, 0))
    idx = jnp.clip(gstart[:, None] + within, 0, cap - 1)
    samples = x2[idx.reshape(-1)].reshape(m, K)
    sk = _encode_sketch(samples)
    return [
        ColumnVector(sk, group_mask, jnp.full(m, 8 * K, jnp.int32), T.binary(8 * K)),
        ColumnVector(n.astype(jnp.int64), group_mask, None, T.INT64),
    ]


def approx_percentile_merge(
    a: E.AggExpr, sketch_cv: ColumnVector, cnt_cv: ColumnVector, live,
    seg, m: int, group_mask, finalize: bool,
) -> List[ColumnVector]:
    """FINAL: weighted-rank query over all partial sketches of each group.
    PARTIAL_MERGE: recompress the union of sketches back to K samples.

    Each partial's K samples carry weight count/K; one (group, value) sort +
    segmented cumulative-weight scan places every sample on the merged rank
    axis — the query/recompression then needs no sequential pruning."""
    p = _pct_params(a)
    K = sketch_cv.dtype.byte_width // 8
    cap = live.shape[0]
    v = _decode_sketch(sketch_cv.data, K)  # (cap, K)
    ok = live & cnt_cv.validity & (cnt_cv.data > 0) & sketch_cv.validity
    cnt = jnp.where(ok, cnt_cv.data, 0)  # (cap,) int64
    w_row = cnt.astype(jnp.float64) / K
    nn = cap * K
    gv = jnp.repeat(jnp.where(cnt > 0, seg, m), K)
    vv = v.reshape(-1)
    wv = jnp.repeat(w_row, K)
    limbs = [gv.astype(jnp.int64)] + sortkeys._float_orderable(
        jnp.where(wv > 0, vv, 0.0))
    pv = sortkeys.lexsort(limbs)
    g3, v3, w3 = gv[pv], vv[pv], wv[pv]
    cw = jnp.cumsum(w3)
    cw_excl = cw - w3
    newg = jnp.concatenate([jnp.ones(1, bool), g3[1:] != g3[:-1]])
    base = jax.lax.cummax(jnp.where(newg, cw_excl, 0.0))
    cwl, cwl_excl = cw - base, cw_excl - base
    ntot = _seg_sum(cnt, seg, m)  # (m,) int64
    rt = a.result_dtype()
    if finalize:
        tgt = jnp.maximum(p * ntot.astype(jnp.float64), 1e-9)
        cwl_max = _seg_max(jnp.where(w3 > 0, cwl, 0.0), g3, m)
        tgt = jnp.minimum(tgt, cwl_max)  # roundoff guard at p→1
        t_row = jnp.take(jnp.concatenate([tgt, jnp.zeros(1)]), jnp.minimum(g3, m))
        hit = (w3 > 0) & (cwl >= t_row) & (cwl_excl < t_row)
        val = _seg_sum(jnp.where(hit, v3, 0.0), g3, m)
        return [ColumnVector(_to_result(val, rt), (ntot > 0) & group_mask, None, rt)]
    # PARTIAL_MERGE: slot t of the merged sketch takes the first sample whose
    # cumulative weight reaches (t+0.5)/K * N — scatter each sample to the
    # first slot its weight interval covers, then a per-group cummax fill
    # propagates it across the rest of its interval
    pos = jnp.arange(nn, dtype=jnp.int32)
    n_row = jnp.take(jnp.concatenate(
        [jnp.maximum(ntot.astype(jnp.float64), 1.0), jnp.ones(1)]),
        jnp.minimum(g3, m))
    tf = (jnp.floor(K * cwl_excl / n_row - 0.5) + 1.0).astype(jnp.int32)
    tf = jnp.clip(tf, 0, K - 1)
    slot = jnp.where((w3 > 0) & (g3 < m), g3 * K + tf, m * K)
    filled = jnp.zeros(m * K + 1, jnp.int32).at[slot].max(pos + 1, mode="drop")[: m * K]
    filled = jax.lax.cummax(filled.reshape(m, K), axis=1).reshape(-1)
    src = jnp.clip(filled - 1, 0, nn - 1)
    samples = v3[src].reshape(m, K)
    sk = _encode_sketch(samples)
    return [
        ColumnVector(sk, group_mask, jnp.full(m, 8 * K, jnp.int32), T.binary(8 * K)),
        ColumnVector(ntot, group_mask, None, T.INT64),
    ]
