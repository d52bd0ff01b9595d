"""Vectorized 128-bit integer emulation on top of int64 lanes.

TPU has no native 64×64→128 multiply, and Spark decimal semantics
(reference: native/spark-expr/src/math_funcs — Rust kernels use i128)
require exact wide arithmetic for decimal multiply/divide/rescale. We
emulate i128 as a (hi: int64, lo: int64) pair where ``lo`` holds the low 64
bits interpreted as unsigned. All functions are elementwise over arrays and
jit-compatible (VPU-friendly: shifts, masks, adds only).

Representation invariant: value = hi * 2^64 + (lo as u64), two's complement.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

I64 = jnp.int64
_MASK32 = (1 << 32) - 1


def from_i64(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Sign-extend an int64 to i128."""
    x = x.astype(I64)
    return (x >> 63, x)


def _u64_add_carry(a: jax.Array, b: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Unsigned add of two u64 (stored in int64) returning (sum, carry)."""
    s = a + b  # wraps mod 2^64 (int64 overflow wraps in XLA)
    # carry iff unsigned sum overflowed: s <u a  (unsigned compare)
    carry = _u64_lt(s, a).astype(I64)
    return s, carry


def _u64_lt(a: jax.Array, b: jax.Array) -> jax.Array:
    """Unsigned less-than for u64 stored in int64."""
    # flip sign bit to map unsigned order onto signed order
    bias = jnp.asarray(jnp.uint64(1) << jnp.uint64(63)).astype(I64)
    return (a ^ bias) < (b ^ bias)


def add(a: Tuple[jax.Array, jax.Array], b: Tuple[jax.Array, jax.Array]):
    lo, carry = _u64_add_carry(a[1], b[1])
    hi = a[0] + b[0] + carry
    return (hi, lo)


def neg(a: Tuple[jax.Array, jax.Array]):
    lo = ~a[1]
    hi = ~a[0]
    lo2, carry = _u64_add_carry(lo, jnp.ones_like(lo))
    return (hi + carry, lo2)


def is_negative(a) -> jax.Array:
    return a[0] < 0


def abs_(a):
    n = neg(a)
    m = is_negative(a)
    return (jnp.where(m, n[0], a[0]), jnp.where(m, n[1], a[1]))


def _lshr32(x: jax.Array) -> jax.Array:
    """Logical (unsigned) right shift by 32 of a u64 stored in int64."""
    return (x >> 32) & _MASK32


def mul_i64(x: jax.Array, y: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Exact signed 64×64→128 multiply via 32-bit limbs."""
    x = x.astype(I64)
    y = y.astype(I64)
    sx, sy = x < 0, y < 0
    ux = jnp.where(sx, -x, x)  # |min| wraps but that value never appears in decimals
    uy = jnp.where(sy, -y, y)
    x0 = ux & _MASK32
    x1 = (ux >> 32) & _MASK32
    y0 = uy & _MASK32
    y1 = (uy >> 32) & _MASK32
    p00 = x0 * y0  # may exceed 2^63 and wrap negative; treat as u64
    p01 = x0 * y1
    p10 = x1 * y0
    p11 = x1 * y1
    mid = _lshr32(p00) + (p01 & _MASK32) + (p10 & _MASK32)
    lo = (p00 & _MASK32) | ((mid & _MASK32) << 32)
    hi = p11 + (p01 >> 32) + (p10 >> 32) + (mid >> 32)
    res = (hi, lo)
    negate = sx ^ sy
    n = neg(res)
    return (jnp.where(negate, n[0], res[0]), jnp.where(negate, n[1], res[1]))


def shl1(a):
    """Left shift by one bit."""
    hi = (a[0] << 1) | ((a[1] >> 63) & 1)
    lo = a[1] << 1
    return (hi, lo)


def cmp_ge_u(a, b) -> jax.Array:
    """Unsigned 128-bit a >= b."""
    hi_gt = _u64_lt(b[0], a[0])
    hi_eq = a[0] == b[0]
    lo_ge = ~_u64_lt(a[1], b[1])
    return hi_gt | (hi_eq & lo_ge)


def sub(a, b):
    return add(a, neg(b))


def divmod_u128_u64(num_hi: jax.Array, num_lo: jax.Array, den: jax.Array):
    """Unsigned 128/64 → (quotient 128, remainder 64) by restoring division.

    128 fori_loop iterations of shift/compare/subtract — pure VPU work,
    used only on decimal divide/rescale paths.
    """
    zero = jnp.zeros_like(num_lo)

    def body(i, state):
        q_hi, q_lo, r, n_hi, n_lo = state
        # shift remainder left, bring in top bit of numerator
        top = (n_hi >> 63) & 1
        r2 = (r << 1) | top
        n_hi2 = (n_hi << 1) | ((n_lo >> 63) & 1)
        n_lo2 = n_lo << 1
        ge = ~_u64_lt(r2, den)  # r2 >= den unsigned  (r2 < 2^64 guaranteed: den < 2^63 in our use)
        r3 = jnp.where(ge, r2 - den, r2)
        bit = ge.astype(I64)
        q_hi2 = (q_hi << 1) | ((q_lo >> 63) & 1)
        q_lo2 = (q_lo << 1) | bit
        return (q_hi2, q_lo2, r3, n_hi2, n_lo2)

    q_hi, q_lo, r, _, _ = jax.lax.fori_loop(
        0, 128, body, (zero, zero, zero, num_hi, num_lo)
    )
    return (q_hi, q_lo), r


def div_i128_i64_half_up(a, den: jax.Array) -> jax.Array:
    """Signed i128 / i64 with HALF_UP rounding, result truncated to i64.

    This is the decimal-division primitive (Spark rounds HALF_UP on scale
    reduction). ``den`` must be positive and < 2^62.
    """
    sign_neg = is_negative(a) ^ (den < 0)
    ua = abs_(a)
    uden = jnp.where(den < 0, -den, den)
    (q_hi, q_lo), r = divmod_u128_u64(ua[0], ua[1], uden)
    # half-up: round away from zero when 2*r >= den
    round_up = ~_u64_lt(r * 2, uden)
    q_lo = q_lo + round_up.astype(I64)
    q = jnp.where(sign_neg, -q_lo, q_lo)
    return q


def to_i64(a) -> jax.Array:
    """Truncate i128 to i64 (caller must know it fits)."""
    return a[1]


def cmp(a, b) -> jax.Array:
    """Signed compare: returns -1, 0, 1."""
    d = sub(a, b)
    neg_m = is_negative(d)
    zero_m = (d[0] == 0) & (d[1] == 0)
    return jnp.where(zero_m, 0, jnp.where(neg_m, -1, 1))


def _mul_ulimb(limb: jax.Array, y: jax.Array):
    """Unsigned 64-bit limb (stored as signed i64 bits) × nonnegative i64
    → u128 pair. mul_i64 reads a top-bit-set limb as negative; the true
    unsigned value is 2^64 larger, so add y to the high limb there."""
    p = mul_i64(limb, y)
    return (p[0] + jnp.where(limb < 0, y, jnp.zeros_like(y)), p[1])


def mul_i128_i64(a, y: jax.Array):
    """Signed i128 × i64 → i128 (mod 2^128; exact when the true product
    fits — decimal typing guarantees ≤38 digits)."""
    y = y.astype(I64)
    sign_neg = is_negative(a) ^ (y < 0)
    ua = abs_(a)
    uy = jnp.where(y < 0, -y, y)
    lo_prod = _mul_ulimb(ua[1], uy)  # lo limb is unsigned
    hi = lo_prod[0] + ua[0] * uy  # hi limb contributions mod 2^64
    res = (hi, lo_prod[1])
    n = neg(res)
    return (jnp.where(sign_neg, n[0], res[0]), jnp.where(sign_neg, n[1], res[1]))


def divmod_u128_u128(num, den):
    """Unsigned 128/128 → (quotient, remainder), restoring division over
    128 fori_loop steps (VPU-only; decimal divide by wide divisors)."""
    zero = jnp.zeros_like(num[1])

    def body(i, state):
        q_hi, q_lo, r_hi, r_lo, n_hi, n_lo = state
        top = (n_hi >> 63) & 1
        r_hi2 = (r_hi << 1) | ((r_lo >> 63) & 1)
        r_lo2 = (r_lo << 1) | top
        n_hi2 = (n_hi << 1) | ((n_lo >> 63) & 1)
        n_lo2 = n_lo << 1
        ge = cmp_ge_u((r_hi2, r_lo2), den)
        d = sub((r_hi2, r_lo2), den)
        r_hi3 = jnp.where(ge, d[0], r_hi2)
        r_lo3 = jnp.where(ge, d[1], r_lo2)
        q_hi2 = (q_hi << 1) | ((q_lo >> 63) & 1)
        q_lo2 = (q_lo << 1) | ge.astype(I64)
        return (q_hi2, q_lo2, r_hi3, r_lo3, n_hi2, n_lo2)

    q_hi, q_lo, r_hi, r_lo, _, _ = jax.lax.fori_loop(
        0, 128, body, (zero, zero, zero, zero, num[0], num[1])
    )
    return (q_hi, q_lo), (r_hi, r_lo)


def div_i128_i128_half_up(a, b):
    """Signed i128 / i128 with HALF_UP rounding → i128."""
    sign_neg = is_negative(a) ^ is_negative(b)
    ua, ub = abs_(a), abs_(b)
    q, r = divmod_u128_u128(ua, ub)
    r2 = shl1(r)
    round_up = cmp_ge_u(r2, ub)
    q = add(q, (jnp.zeros_like(q[0]), round_up.astype(I64)))
    n = neg(q)
    return (jnp.where(sign_neg, n[0], q[0]), jnp.where(sign_neg, n[1], q[1]))


def shl_bits(a, k: int):
    """Logical left shift of an i128 by a constant 0 <= k < 128 (mod 2^128)."""
    if k == 0:
        return a
    if k >= 64:
        return (a[1] << (k - 64) if k > 64 else a[1], jnp.zeros_like(a[1]))
    hi = (a[0] << k) | ((a[1] >> (64 - k)) & ((1 << k) - 1))
    return (hi, a[1] << k)


def to_f64(a) -> jax.Array:
    """Approximate i128 → float64 (for overflow screening / float casts)."""
    neg_m = is_negative(a)
    ua = abs_(a)
    lo_u = jnp.where(ua[1] < 0, ua[1].astype(jnp.float64) + 2.0**64, ua[1].astype(jnp.float64))
    mag = ua[0].astype(jnp.float64) * 2.0**64 + lo_u
    return jnp.where(neg_m, -mag, mag)


POW10_I64 = tuple(10**i for i in range(19))


def mul_pow10_i64(x: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """x * 10^k as i128 (k <= 38)."""
    a = from_i64(x)
    while k > 0:
        step = min(k, 18)
        a = mul_i64_i128_by_small(a, POW10_I64[step])
        k -= step
    return a


def mul_pow10_i128(a, k: int):
    """i128 × 10^k (k <= 38), exact while the result fits i128."""
    while k > 0:
        step = min(k, 18)
        a = mul_i64_i128_by_small(a, POW10_I64[step])
        k -= step
    return a


def div_pow10_i128_half_up(a, k: int):
    """i128 / 10^k with HALF_UP rounding → i128 (decimal downscale)."""
    sign_neg = is_negative(a)
    ua = abs_(a)
    if k <= 18:
        den = jnp.asarray(POW10_I64[k], I64)
        q, r = divmod_u128_u64(ua[0], ua[1], den)
        round_up = ~_u64_lt(r * 2, den)
    else:  # 10^k needs two limbs: exact one-shot 128/128 division
        p = 10**k
        den = (
            jnp.broadcast_to(jnp.asarray((p >> 64) & ((1 << 64) - 1), jnp.uint64).astype(I64), ua[0].shape),
            jnp.broadcast_to(jnp.asarray(p & ((1 << 64) - 1), jnp.uint64).astype(I64), ua[1].shape),
        )
        q, r = divmod_u128_u128(ua, den)
        round_up = cmp_ge_u(shl1(r), den)
    q = add(q, (jnp.zeros_like(q[0]), round_up.astype(I64)))
    n = neg(q)
    return (jnp.where(sign_neg, n[0], q[0]), jnp.where(sign_neg, n[1], q[1]))


def _u128_digits32(p) -> list:
    """u128 pair (nonnegative magnitude) → four unsigned 32-bit digits
    little-endian, each held in an int64."""
    hi, lo = p
    return [lo & _MASK32, _lshr32(lo), hi & _MASK32, _lshr32(hi)]


def mul_i128_i128_scaled(a, b, k: int):
    """Exact (a × b) / 10^k with HALF_UP rounding via a u256 intermediate
    (the reference widens to i256 the same way — spark-expr agg_funcs,
    DataFusion decimal mul). k = (s1+s2) − out_scale ≥ 0.

    Returns (i128 pair, overflow mask). Overflowed rows (quotient ≥ 2^127)
    are saturated to 10^38 so the caller's precision check nulls them.

    Formulation: 32-bit-digit school multiplication (each step < 2^64, so
    int64 two's-complement arithmetic is bit-exact), then long division by
    10^9-sized chunks — remainder < 2^31 keeps every (rem<<32 | digit)
    below 2^63. All steps are row-parallel on the VPU; no per-row loops."""
    sign_neg = is_negative(a) ^ is_negative(b)
    ua, ub = abs_(a), abs_(b)
    al = _u128_digits32(ua)
    bl = _u128_digits32(ub)
    zero = jnp.zeros_like(al[0])
    r = [zero] * 8
    for i in range(4):
        carry = zero
        for j in range(4):
            cur = r[i + j] + al[i] * bl[j] + carry  # < 2^64: exact mod 2^64
            r[i + j] = cur & _MASK32
            carry = _lshr32(cur)
        r[i + 4] = carry
    # divide the u256 by 10^k in ≤2^31 chunks, accumulating the true
    # remainder (each term rem·10^shift < 10^k ≤ 10^38 fits i128)
    rem_total = (zero, zero)  # as u128
    shift = 0
    kk = k
    while kk > 0:
        step = min(kk, 9)
        d = np.int64(10**step)
        rem = zero
        for idx in range(7, -1, -1):
            acc = (rem << 32) | r[idx]  # rem < 10^9 < 2^31 → acc < 2^63
            q = acc // d
            rem = acc - q * d
            r[idx] = q
        rem_total = add(rem_total, mul_pow10_i128(from_i64(rem), shift))
        shift += step
        kk -= step
    over = (r[4] | r[5] | r[6] | r[7]) != 0
    q128 = ((r[3] << 32) | r[2], (r[1] << 32) | r[0])
    over = over | (q128[0] < 0)  # quotient ≥ 2^127
    if k > 0:
        half = cmp_ge_u(shl1(rem_total), _const_u128(10**k, zero.shape))
        q128 = add(q128, (jnp.zeros_like(zero), half.astype(I64)))
    sat = _const_u128(10**38, zero.shape)
    q128 = (jnp.where(over, sat[0], q128[0]), jnp.where(over, sat[1], q128[1]))
    n = neg(q128)
    return (
        jnp.where(sign_neg, n[0], q128[0]),
        jnp.where(sign_neg, n[1], q128[1]),
    ), over


def _const_u128(v: int, shape):
    m64 = (1 << 64) - 1
    return (
        jnp.broadcast_to(jnp.asarray(np.uint64((v >> 64) & m64).astype(np.int64)), shape),
        jnp.broadcast_to(jnp.asarray(np.uint64(v & m64).astype(np.int64)), shape),
    )


def div_pow10_i128_trunc(a, k: int):
    """i128 / 10^k truncated toward zero (decimal -> int cast semantics)."""
    sign_neg = is_negative(a)
    ua = abs_(a)
    if k <= 18:
        den = jnp.asarray(POW10_I64[k], I64)
        q, _ = divmod_u128_u64(ua[0], ua[1], den)
    else:
        p = 10**k
        den = (
            jnp.broadcast_to(jnp.asarray((p >> 64) & ((1 << 64) - 1), jnp.uint64).astype(I64), ua[0].shape),
            jnp.broadcast_to(jnp.asarray(p & ((1 << 64) - 1), jnp.uint64).astype(I64), ua[1].shape),
        )
        q, _ = divmod_u128_u128(ua, den)
    n = neg(q)
    return (jnp.where(sign_neg, n[0], q[0]), jnp.where(sign_neg, n[1], q[1]))


def mul_i64_i128_by_small(a, m: int):
    """i128 * small positive i64 (m < 2^62), exact as long as result fits i128."""
    m_arr = jnp.asarray(m, I64)
    sign_neg = is_negative(a)
    ua = abs_(a)
    lo_prod = _mul_ulimb(ua[1], jnp.broadcast_to(m_arr, ua[1].shape))
    hi_prod_lo = ua[0] * m_arr  # low 64 bits of hi*m
    hi = lo_prod[0] + hi_prod_lo
    res = (hi, lo_prod[1])
    n = neg(res)
    return (jnp.where(sign_neg, n[0], res[0]), jnp.where(sign_neg, n[1], res[1]))
