"""Spark-exact rand()/randn(): XORShift generator + Marsaglia polar method.

Reference behavior: native/spark-expr/src/nondetermenistic_funcs/{rand,randn}.rs
— per-partition XORShiftRandom seeded with murmur3(seed+partition) (two
32-bit murmur rounds over the big-endian seed bytes, scala array seed
0x3c074a61), next(bits) taking the LOW bits of the xorshift state,
nextDouble = (next(26) << 27 + next(27)) * 2^-53, and nextGaussian as the
polar method with the cached second value.

TPU formulation: the generator is inherently sequential per partition (each
row's state chains from the previous), so the column is a ``lax.scan`` over
batch slots carrying the 64-bit state; DEAD slots do not advance the state,
making the live-row sequence equal to Spark's per-evaluated-row sequence on
front-packed batches. The gaussian's rejection loop is a bounded
``lax.while_loop`` inside the scan body. int64 shifts are emulated on TPU —
this is the rare engine kernel that trades throughput for bit-exactness
(the reference computes it row-by-row natively for the same reason).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import ColumnVector

__all__ = ["rand_column", "randn_column", "init_seed_host"]

_DOUBLE_UNIT = 1.1102230246251565e-16
_ARRAY_SEED = 0x3C074A61
_M64 = (1 << 64) - 1


def _m3_mix(h: int, k: int) -> int:
    k = (k * 0xCC9E2D51) & 0xFFFFFFFF
    k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
    k = (k * 0x1B873593) & 0xFFFFFFFF
    h ^= k
    h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
    return (h * 5 + 0xE6546B64) & 0xFFFFFFFF


def _m3_fmix(h: int, length: int) -> int:
    h ^= length
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def _murmur3_8bytes(value: int, seed: int) -> int:
    """Spark murmur3 over the 8 big-endian bytes of ``value`` (two 4-byte
    little-endian words — Murmur3_x86_32.hashUnsafeBytes block order)."""
    b = (value & _M64).to_bytes(8, "big")
    h = seed & 0xFFFFFFFF
    for off in (0, 4):
        k = int.from_bytes(b[off:off + 4], "little")
        h = _m3_mix(h, k)
    return _m3_fmix(h, 8)


def init_seed_host(seed: int, partition: int = 0) -> int:
    """XORShiftRandom.hashSeed(seed + partition) -> signed 64-bit state."""
    v = seed + partition
    lo = _murmur3_8bytes(v, _ARRAY_SEED)
    hi = _murmur3_8bytes(v, lo)
    s = ((hi << 32) | lo) & _M64
    return s - (1 << 64) if s >= (1 << 63) else s


def _xorshift_next(seed: jnp.ndarray) -> jnp.ndarray:
    s = seed ^ (seed << jnp.int64(21))
    s = s ^ jax.lax.shift_right_logical(s, jnp.int64(35))
    s = s ^ (s << jnp.int64(4))
    return s


def _next_bits(seed, bits: int):
    s = _xorshift_next(seed)
    return s, (s & jnp.int64((1 << bits) - 1))


def _next_f64(seed):
    seed, a = _next_bits(seed, 26)
    seed, b = _next_bits(seed, 27)
    return seed, ((a << jnp.int64(27)) + b).astype(jnp.float64) * _DOUBLE_UNIT


def rand_column(seed0: int, row_mask: jnp.ndarray) -> ColumnVector:
    cap = row_mask.shape[0]

    def step(state, live):
        nstate, v = _next_f64(state)
        state = jnp.where(live, nstate, state)
        return state, jnp.where(live, v, 0.0)

    _, vals = jax.lax.scan(step, jnp.int64(seed0), row_mask)
    return ColumnVector(vals, jnp.ones(cap, bool), None, T.FLOAT64)


def randn_column(seed0: int, row_mask: jnp.ndarray) -> ColumnVector:
    cap = row_mask.shape[0]

    def draw_pair(carry):
        state, _, _, _ = carry
        state, u1 = _next_f64(state)
        state, u2 = _next_f64(state)
        v1 = 2.0 * u1 - 1.0
        v2 = 2.0 * u2 - 1.0
        return (state, v1, v2, v1 * v1 + v2 * v2)

    def reject(carry):
        _, _, _, s = carry
        return ~((s < 1.0) & (s != 0.0))

    def step(carry, live):
        state, cached, has = carry

        def use_cached(_):
            return state, cached, jnp.float64(0.0), jnp.bool_(False)

        def fresh(_):
            st, v1, v2, s = jax.lax.while_loop(
                reject, draw_pair, draw_pair((state, 0.0, 0.0, 2.0)))
            mult = jnp.sqrt(-2.0 * jnp.log(s) / s)
            return st, v1 * mult, v2 * mult, jnp.bool_(True)

        nstate, value, ncached, nhas = jax.lax.cond(has, use_cached, fresh, None)
        state = jnp.where(live, nstate, state)
        cached = jnp.where(live, ncached, cached)
        has = jnp.where(live, nhas, has)
        return (state, cached, has), jnp.where(live, value, 0.0)

    carry0 = (jnp.int64(seed0), jnp.float64(0.0), jnp.bool_(False))
    _, vals = jax.lax.scan(step, carry0, row_mask)
    return ColumnVector(vals, jnp.ones(cap, bool), None, T.FLOAT64)
