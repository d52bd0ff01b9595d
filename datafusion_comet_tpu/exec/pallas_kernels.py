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

__all__ = ["bucket_count", "pallas_available"]

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
