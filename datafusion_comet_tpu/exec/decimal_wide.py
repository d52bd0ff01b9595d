"""Wide-decimal (precision > 18) column kernels over two-limb i128 storage.

A DECIMAL(p>18) ColumnVector stores ``data`` as a (rows, 2) int64 matrix of
[hi, lo] two's-complement 128-bit limbs (types.py is_wide_decimal). This
module adapts utils/int128's elementwise i128 emulation to column shapes and
implements the arithmetic / compare / cast / aggregation decompositions the
evaluator and aggregate operators dispatch to.

Reference surface: native/spark-expr/src/agg_funcs (sum/avg decimal with
i256 state), math_funcs/wide_decimal_binary_expr.rs, conversion_funcs/
cast.rs decimal matrix. The TPU formulation avoids per-row loops entirely:
multiplies are 32-bit partial products, divisions restoring-shift
fori_loops, and aggregation sums decompose each i128 into four 32-bit lanes
whose int64 cumsums cannot overflow for < 2^31 rows, recombined with carries
only at group boundaries (see seg-sum decomposition below).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import ColumnVector
from datafusion_comet_tpu.utils import int128 as i128

Pair = Tuple[jax.Array, jax.Array]

_M32 = (1 << 32) - 1


def pair(cv_data: jax.Array) -> Pair:
    """(rows, 2) limb matrix -> (hi, lo) arrays."""
    return cv_data[:, 0].astype(jnp.int64), cv_data[:, 1].astype(jnp.int64)


def pack(p: Pair) -> jax.Array:
    return jnp.stack([p[0], p[1]], axis=1)


def pack_np_int(values, cap: int) -> np.ndarray:
    """Host helper: iterable of Python ints/None -> (cap, 2) int64 limbs."""
    buf = np.zeros((cap, 2), np.int64)
    m64 = (1 << 64) - 1
    for idx, x in enumerate(values):
        if x is None:
            continue
        u = int(x) & ((1 << 128) - 1)
        buf[idx, 0] = np.uint64((u >> 64) & m64).astype(np.int64)
        buf[idx, 1] = np.uint64(u & m64).astype(np.int64)
    return buf


def lift(cv: ColumnVector, k: int = 0) -> Pair:
    """Column (narrow 1-D i64 decimal/int OR two-limb) -> i128, ×10^k."""
    if cv.is_wide_storage:
        p = pair(cv.data)
    else:
        p = i128.from_i64(cv.data.astype(jnp.int64))
    return i128.mul_pow10_i128(p, k) if k > 0 else p


def widen_cv(cv: ColumnVector) -> ColumnVector:
    """Force a decimal column to two-limb storage (no-op if already wide).
    Used where a stable storage layout matters more than the narrow fast
    path (streaming state accumulation, mixed-storage concatenation)."""
    if cv.is_wide_storage or not cv.dtype.is_decimal:
        return cv
    p = i128.from_i64(cv.data.astype(jnp.int64))
    return ColumnVector(pack(p), cv.validity, cv.lengths, cv.dtype, cv.children)


def fits_i64(p: Pair) -> jax.Array:
    """True where the i128 value fits a signed 64-bit."""
    return p[0] == (p[1] >> 63)


def compare(a: Pair, b: Pair) -> Tuple[jax.Array, jax.Array]:
    """(eq, lt) under signed 128-bit order."""
    eq = (a[0] == b[0]) & (a[1] == b[1])
    lt = (a[0] < b[0]) | ((a[0] == b[0]) & i128._u64_lt(a[1], b[1]))
    return eq, lt


def order_limbs(cv_data: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Sort-key limbs: (hi signed, lo bias-flipped to signed) — the
    lexicographic signed order of the two limbs equals i128 order."""
    hi, lo = pair(cv_data)
    return hi, lo ^ jnp.int64(-0x8000000000000000)


def rescale(p: Pair, k: int) -> Pair:
    """Scale by 10^k: up is exact (overflow by typing), down HALF_UP."""
    if k == 0:
        return p
    if k > 0:
        return i128.mul_pow10_i128(p, k)
    return i128.div_pow10_i128_half_up(p, -k)


def rescale_trunc(p: Pair, k: int) -> Pair:
    """Scale by 10^k with truncation toward zero for k < 0 (decimal→int
    cast; Spark truncates the fraction rather than rounding)."""
    if k == 0:
        return p
    if k > 0:
        return i128.mul_pow10_i128(p, k)
    return i128.div_pow10_i128_trunc(p, -k)


def overflow_check(p: Pair, precision: int) -> jax.Array:
    """True where |value| >= 10^precision (Spark decimal overflow)."""
    bound = 10**precision
    m64 = (1 << 64) - 1
    b = (
        jnp.asarray(np.uint64((bound >> 64) & m64).astype(np.int64)),
        jnp.asarray(np.uint64(bound & m64).astype(np.int64)),
    )
    ua = i128.abs_(p)
    bb = (jnp.broadcast_to(b[0], ua[0].shape), jnp.broadcast_to(b[1], ua[1].shape))
    return i128.cmp_ge_u(ua, bb)


def arith(
    op: str,
    l: ColumnVector,
    r: ColumnVector,
    lt: T.DataType,
    rt: T.DataType,
    out: T.DataType,
) -> Tuple[Pair, jax.Array]:
    """add/sub/mul/div/mod over i128; returns (value_pair, invalid_mask)
    where invalid marks div/mod-by-zero rows (caller owns ANSI handling)."""
    s1, s2, so = lt.scale, rt.scale, out.scale
    zero_div = jnp.zeros(l.capacity, bool)
    if op in ("add", "sub"):
        a = lift(l, so - s1)
        b = lift(r, so - s2)
        res = i128.add(a, b) if op == "add" else i128.sub(a, b)
    elif op == "mul":
        raw = s1 + s2
        if not l.is_wide_storage and not r.is_wide_storage:
            # i64 × i64 ≤ 2^126: always exact in i128
            res = i128.mul_i64(l.data.astype(jnp.int64), r.data.astype(jnp.int64))
            if raw != so:
                res = rescale(res, so - raw)
        else:
            # Exact wide multiply through a u256 intermediate with fused
            # /10^k HALF_UP (matches Spark's BigDecimal result for every
            # representable output; the reference widens to i256 the same
            # way — spark-expr agg_funcs, DataFusion decimal mul). Rows
            # whose quotient exceeds i128 come back saturated to 10^38 so
            # the precision overflow check below nulls them.
            a, b = lift(l), lift(r)
            res, over_m = i128.mul_i128_i128_scaled(a, b, max(raw - so, 0))
            if so > raw:  # unusual: output scale above the raw product scale
                big = jnp.abs(i128.to_f64(res)) * (10.0 ** (so - raw)) >= 1e38
                up = i128.mul_pow10_i128(res, so - raw)
                sat = i128._const_u128(10**38, res[0].shape)
                bad = over_m | big
                res = (jnp.where(bad, sat[0], up[0]), jnp.where(bad, sat[1], up[1]))
    elif op == "div":
        k = so - s1 + s2
        num = lift(l, max(k, 0))
        if k < 0:
            num = rescale(num, k)
        if r.is_wide_storage:
            den = lift(r)
            zero_div = (den[0] == 0) & (den[1] == 0)
            safe = (den[0], jnp.where(zero_div, jnp.ones_like(den[1]), den[1]))
            res = i128.div_i128_i128_half_up(num, safe)
        else:
            den = r.data.astype(jnp.int64)
            zero_div = den == 0
            safe = jnp.where(zero_div, jnp.ones_like(den), den)
            res = _div_i128_i64_full(num, safe)
    elif op in ("mod", "pmod"):
        s = max(s1, s2)
        a = lift(l, s - s1)
        b = lift(r, s - s2)
        zero_div = (b[0] == 0) & (b[1] == 0)
        safe = (b[0], jnp.where(zero_div, jnp.ones_like(b[1]), b[1]))
        q, rem = i128.divmod_u128_u128(i128.abs_(a), i128.abs_(safe))
        rneg = i128.neg(rem)
        m = (
            jnp.where(a[0] < 0, rneg[0], rem[0]),
            jnp.where(a[0] < 0, rneg[1], rem[1]),
        )
        if op == "pmod":
            babs = i128.abs_(safe)
            madj = i128.add(m, babs)
            is_neg = i128.is_negative(m)
            m = (jnp.where(is_neg, madj[0], m[0]), jnp.where(is_neg, madj[1], m[1]))
        res = rescale(m, so - s)
    else:
        raise NotImplementedError(op)
    return res, zero_div


def _div_i128_i64_full(num: Pair, den: jax.Array) -> Pair:
    """Signed i128 / i64 HALF_UP with full i128 quotient."""
    sign_neg = i128.is_negative(num) ^ (den < 0)
    ua = i128.abs_(num)
    uden = jnp.where(den < 0, -den, den)
    q, r = i128.divmod_u128_u64(ua[0], ua[1], uden)
    round_up = ~i128._u64_lt(r * 2, uden)
    q = i128.add(q, (jnp.zeros_like(q[0]), round_up.astype(jnp.int64)))
    n = i128.neg(q)
    return (jnp.where(sign_neg, n[0], q[0]), jnp.where(sign_neg, n[1], q[1]))


def _f64_to_i128(x: jax.Array) -> Pair:
    """Approximate float64 -> i128 (last-resort path for >i128 products)."""
    neg_m = x < 0
    ax = jnp.abs(x)
    hi_f = jnp.floor(ax / 2.0**64)
    lo_f = ax - hi_f * 2.0**64
    # lo in [0, 2^64): map to two 32-bit halves to avoid i64 overflow
    lo_hi = jnp.floor(lo_f / 2.0**32)
    lo_lo = lo_f - lo_hi * 2.0**32
    lo = (lo_hi.astype(jnp.int64) << 32) | lo_lo.astype(jnp.int64)
    p = (hi_f.astype(jnp.int64), lo)
    n = i128.neg(p)
    return (jnp.where(neg_m, n[0], p[0]), jnp.where(neg_m, n[1], p[1]))


def to_f64(cv_data: jax.Array, scale: int) -> jax.Array:
    return i128.to_f64(pair(cv_data)) / (10.0**scale)


# ---------------------------------------------------------------------------
# digits (for wide decimal -> string)
# ---------------------------------------------------------------------------


def digits_39(p: Pair) -> Tuple[jax.Array, jax.Array]:
    """abs(i128) -> (digits little-endian (rows, 39) int32, negative mask).
    Two 128/10^18 divmods split the magnitude into three <=10^18 chunks."""
    neg_m = i128.is_negative(p)
    ua = i128.abs_(p)
    P18 = jnp.asarray(10**18, jnp.int64)
    q1, r1 = i128.divmod_u128_u64(ua[0], ua[1], P18)  # low 18 digits in r1
    q2, r2 = i128.divmod_u128_u64(q1[0], q1[1], P18)  # middle 18 in r2
    top = q2[1]  # < 10^3 for 39-digit magnitudes
    digs = []
    x = r1
    for _ in range(18):
        digs.append((x % 10).astype(jnp.int32))
        x = x // 10
    x = r2
    for _ in range(18):
        digs.append((x % 10).astype(jnp.int32))
        x = x // 10
    x = top
    for _ in range(3):
        digs.append((x % 10).astype(jnp.int32))
        x = x // 10
    return jnp.stack(digs, axis=1), neg_m


# ---------------------------------------------------------------------------
# aggregation decomposition: i128 -> four 32-bit lanes and back
# ---------------------------------------------------------------------------


def decompose4(p: Pair) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """i128 -> four int64 lanes holding 32-bit limbs (l0..l2 unsigned in
    [0, 2^32), l3 the signed top limb). Summing each lane over n < 2^31 rows
    cannot overflow int64, so segment sums reduce per-lane and recombine."""
    hi, lo = p
    l0 = lo & _M32
    l1 = (lo >> 32) & _M32
    l2 = hi & _M32
    l3 = hi >> 32  # arithmetic: keeps the sign
    return l0, l1, l2, l3


def recombine4(s0: jax.Array, s1: jax.Array, s2: jax.Array, s3: jax.Array) -> Pair:
    """Inverse of decompose4 after per-lane summation (sums may exceed 32
    bits; carries fold mod 2^128, exact while the true total fits i128)."""
    t0 = i128.from_i64(s0)
    t1 = i128.shl_bits(i128.from_i64(s1), 32)
    t2 = i128.shl_bits(i128.from_i64(s2), 64)
    t3 = i128.shl_bits(i128.from_i64(s3), 96)
    return i128.add(i128.add(t0, t1), i128.add(t2, t3))


def seg_sum_wide(
    cv_data: jax.Array,
    active: jax.Array,
    seg_sum_1d: Callable[[jax.Array], jax.Array],
) -> jax.Array:
    """Segment-sum a wide column: decompose, run the caller's 1-D int64
    segment-sum over each lane, recombine. ``seg_sum_1d`` maps a (rows,)
    int64 lane -> (groups,) int64 sums (dense or cumsum backend)."""
    lanes = decompose4(pair(cv_data))
    sums = [seg_sum_1d(jnp.where(active, lane, 0)) for lane in lanes]
    return pack(recombine4(*sums))


def wide_avg(sum_pair: Pair, count: jax.Array, sum_scale: int, out: T.DataType) -> jax.Array:
    """avg = sum / count at the output scale, HALF_UP (Spark decimal avg)."""
    k = out.scale - sum_scale
    num = rescale(sum_pair, k) if k >= 0 else rescale(sum_pair, k)
    safe = jnp.where(count == 0, jnp.ones_like(count), count)
    q = _div_i128_i64_full(num, safe.astype(jnp.int64))
    return pack(q)
