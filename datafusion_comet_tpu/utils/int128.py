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


POW10_I64 = tuple(10**i for i in range(19))


def mul_pow10_i64(x: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """x * 10^k as i128 (k <= 38)."""
    a = from_i64(x)
    while k > 0:
        step = min(k, 18)
        a = mul_i64_i128_by_small(a, POW10_I64[step])
        k -= step
    return a


def mul_i64_i128_by_small(a, m: int):
    """i128 * small positive i64 (m < 2^62), exact as long as result fits i128."""
    m_arr = jnp.asarray(m, I64)
    sign_neg = is_negative(a)
    ua = abs_(a)
    lo_prod = mul_i64(ua[1], jnp.broadcast_to(m_arr, ua[1].shape))
    hi_prod_lo = ua[0] * m_arr  # low 64 bits of hi*m
    hi = lo_prod[0] + hi_prod_lo
    res = (hi, lo_prod[1])
    n = neg(res)
    return (jnp.where(sign_neg, n[0], res[0]), jnp.where(sign_neg, n[1], res[1]))
