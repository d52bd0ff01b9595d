"""Pallas TPU kernels (hand-written hot-path alternatives).

The engine's measured cost model (docs/tuning.md) shows XLA's sort/cumsum
primitives already run near bandwidth, so Pallas effort goes to the one
place XLA is weak: SCATTER. ``bucket_count`` computes a bounded-key
histogram — the perfect-hash group-by's core — without any scatter: each
grid step loads a row tile into VMEM, expands it to a one-hot (TILE, B)
matrix, and reduces over the tile with a matmul-shaped sum that the Mosaic
compiler maps onto the MXU/VPU; a VMEM scratch accumulator carries the
per-bucket partial counts across the sequential TPU grid and flushes once.

Usage is gated: `bucket_count(codes, num_buckets)` for num_buckets ≤ 4096
(one-hot tile fits VMEM); callers fall back to `jax.ops.segment_sum`
elsewhere (and on backends without Mosaic — the CPU interpreter path is
used in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["bucket_count", "bucket_sum", "pallas_available"]

_TILE = 2048
_MAX_BUCKETS = 4096


@functools.lru_cache(maxsize=1)
def pallas_available() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401

        return jax.default_backend() in ("tpu",)
    except Exception:
        return False


def _kernel(codes_ref, out_ref, acc_ref):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    codes = codes_ref[:]  # (TILE,) int32; dead rows carry code == B (dropped)
    B = acc_ref.shape[1]
    # one-hot expand on the VPU: (TILE, B) compare against the bucket iota
    cols = jax.lax.broadcasted_iota(jnp.int32, (codes.shape[0], B), 1)
    onehot = (cols == codes[:, None]).astype(jnp.float32)
    acc_ref[:] = acc_ref[:] + jnp.sum(onehot, axis=0, keepdims=True)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _bucket_count_pallas(codes: jax.Array, num_buckets: int) -> jax.Array:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = codes.shape[0]
    pad = (-n) % _TILE
    if pad:
        codes = jnp.concatenate([codes, jnp.full(pad, num_buckets, jnp.int32)])
    n_tiles = codes.shape[0] // _TILE
    out = pl.pallas_call(
        _kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((_TILE,), lambda i: (i,), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, num_buckets), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, num_buckets), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, num_buckets), jnp.float32)],
    )(codes.astype(jnp.int32))
    return out[0].astype(jnp.int64)


def _sum_kernel(codes_ref, limbs_ref, out_ref, acc_ref):
    """Per-tile exact int64 group sums as 8 one-hot matvecs.

    ``limbs_ref`` holds the tile's values split into 8 unsigned bytes
    (little-endian); each limb's per-bucket sum is an (TILE,B) one-hot
    contraction in f32 — exact because a tile of 2048 rows × max byte 255
    sums below 2^19 (f32 integers are exact to 2^24). The f32 partials
    accumulate into an f32 (8, B) scratch; the caller recombines limbs in
    int64 (sum over tiles of limb sums < 2^52 at n = 8M rows)."""
    import jax.experimental.pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    codes = codes_ref[:]  # (TILE,)
    limbs = limbs_ref[:]  # (TILE, 8) f32 bytes
    B = acc_ref.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (codes.shape[0], B), 1)
    onehot = (cols == codes[:, None]).astype(jnp.float32)  # (TILE, B)
    # (8, TILE) @ (TILE, B) on the MXU
    part = jnp.dot(limbs.T, onehot, preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] + part

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _bucket_sum_pallas(codes: jax.Array, values: jax.Array,
                       num_buckets: int) -> jax.Array:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = codes.shape[0]
    pad = (-n) % _TILE
    if pad:
        codes = jnp.concatenate([codes, jnp.full(pad, num_buckets, jnp.int32)])
        values = jnp.concatenate([values, jnp.zeros(pad, values.dtype)])
    n_tiles = codes.shape[0] // _TILE
    v = values.astype(jnp.int64)
    neg = v < 0
    mag = jnp.where(neg, -v, v).astype(jnp.uint64)
    # signed values ride as |v| with the sign folded into a 9th virtual limb:
    # simpler — two passes (positive and negative magnitudes) would double
    # the matmuls, so instead bias: sum(v) = sum(|v| where v>=0) - sum(|v|
    # where v<0); encode by zeroing the magnitude in the opposite stream.
    limbs_list = []
    for sgn, m in ((0, jnp.where(neg, jnp.uint64(0), mag)),
                   (1, jnp.where(neg, mag, jnp.uint64(0)))):
        l8 = [((m >> jnp.uint64(8 * k)) & jnp.uint64(0xFF)).astype(jnp.float32)
              for k in range(4)]  # 32-bit magnitudes per stream (see gate)
        limbs_list.append(jnp.stack(l8, axis=1))
    limbs = jnp.concatenate(limbs_list, axis=1)  # (n, 8)
    out = pl.pallas_call(
        _sum_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((_TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, num_buckets), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, num_buckets), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, num_buckets), jnp.float32)],
    )(codes.astype(jnp.int32), limbs)
    o = out.astype(jnp.int64)
    pos = sum(o[k] << jnp.int64(8 * k) for k in range(4))
    negs = sum(o[4 + k] << jnp.int64(8 * k) for k in range(4))
    return pos - negs


def bucket_sum(codes: jax.Array, values: jax.Array,
               num_buckets: int) -> jax.Array:
    """Exact per-bucket int64 sums of ``values`` grouped by ``codes``
    ∈ [0, num_buckets) (code == num_buckets → dropped). Pallas MXU one-hot
    matvec path for small bucket counts and 32-bit-magnitude values
    (|v| < 2^31 — the per-tile limb contraction stays f32-exact and the
    cross-tile limb totals stay < 2^52 for n ≤ 1B rows); scatter-add
    fallback elsewhere."""
    if (num_buckets <= _MAX_BUCKETS and pallas_available()):
        try:
            import numpy as _np

            # magnitude gate must be static: callers pass a bound via
            # values.dtype or we probe the dtype range only
            if values.dtype in (jnp.int32, jnp.int16, jnp.int8):
                return _bucket_sum_pallas(codes,
                                          values.astype(jnp.int64),
                                          num_buckets)
        except Exception:
            pass
    return jax.ops.segment_sum(
        values.astype(jnp.int64), codes.astype(jnp.int32),
        num_segments=num_buckets + 1)[:num_buckets]


def bucket_count(codes: jax.Array, num_buckets: int) -> jax.Array:
    """Histogram of ``codes`` ∈ [0, num_buckets) (values == num_buckets are
    dropped — the dead-row convention). Pallas on TPU for small bucket
    counts; segment_sum elsewhere."""
    if num_buckets <= _MAX_BUCKETS and pallas_available():
        try:
            return _bucket_count_pallas(codes, num_buckets)
        except Exception:
            pass  # Mosaic feature gap on this backend → fall through
    ones = jnp.ones(codes.shape[0], jnp.int32)
    return jax.ops.segment_sum(
        ones, codes.astype(jnp.int32), num_segments=num_buckets + 1
    )[:num_buckets].astype(jnp.int64)
