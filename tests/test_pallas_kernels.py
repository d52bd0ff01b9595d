"""Pallas bucket-count kernel: correctness vs numpy (interpreter on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from datafusion_comet_tpu.exec import pallas_kernels as PK


def test_fallback_matches_numpy():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 100, 5000).astype(np.int32)
    got = np.asarray(PK.bucket_count(jnp.asarray(codes), 100))
    expect = np.bincount(codes, minlength=100)
    np.testing.assert_array_equal(got, expect)


def test_dead_rows_dropped():
    codes = jnp.asarray(np.array([0, 1, 1, 5, 5, 5], np.int32))
    got = np.asarray(PK.bucket_count(codes, 5))  # code 5 == num_buckets → dead
    np.testing.assert_array_equal(got, [1, 2, 0, 0, 0])


def test_pallas_interpreter_path():
    """Run the Pallas kernel itself under the interpreter (backend-neutral)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(1)
    B = 128
    codes = rng.integers(0, B, PK._TILE * 3).astype(np.int32)
    n_tiles = len(codes) // PK._TILE
    out = pl.pallas_call(
        PK._kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((PK._TILE,), lambda i: (i,))],
        out_specs=pl.BlockSpec((1, B), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, B), jnp.float32)],
        interpret=True,
    )(jnp.asarray(codes))
    np.testing.assert_array_equal(out[0].astype(np.int64), np.bincount(codes, minlength=B))


def test_bucket_sum_fallback_matches_numpy():
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 64, 4000).astype(np.int32)
    vals = rng.integers(-1000, 1000, 4000).astype(np.int64)
    got = np.asarray(PK.bucket_sum(jnp.asarray(codes), jnp.asarray(vals), 64))
    want = np.zeros(64, np.int64)
    np.testing.assert_array_equal(got,
                                  np.add.at(want, codes, vals) or want)


def test_bucket_sum_pallas_interpreter():
    """Drive the limb-matvec kernel under the Pallas interpreter."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(5)
    n, B = 4096, 32
    codes = rng.integers(0, B + 1, n).astype(np.int32)  # incl. dead rows
    vals = rng.integers(-(2**30), 2**30, n).astype(np.int64)

    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    pl.pallas_call = interp
    try:
        got = np.asarray(PK._bucket_sum_pallas(
            jnp.asarray(codes), jnp.asarray(vals), B))
    finally:
        pl.pallas_call = orig
    want = np.zeros(B, np.int64)
    live = codes < B
    np.add.at(want, codes[live], vals[live])
    np.testing.assert_array_equal(got, want)
