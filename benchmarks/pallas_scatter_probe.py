#!/usr/bin/env python
"""Pallas counting-sort partition scatter probe (VERDICT r4 item 5).

The engine's backbone is latency-bound: lax.sort runs at 2.7-4.2 GB/s and
gathers/scatters at ~1-1.5 GB/s on the v5e (kernels-tpu-v5e-r4.json) vs the
819 GB/s roofline. The reference's shuffle partitioner is a counting-sort
scatter (multi_partition.rs:36-99). This probe measures a Mosaic kernel for
the same shape:

  tile-local counting sort as ONE MXU matmul: each grid step loads a row
  tile (TILE, C) + its partition codes, computes every row's in-tile
  destination (partition-major stable order) with dense VPU math (one-hot
  cumsums — no scatter), builds the (TILE, TILE) permutation one-hot, and
  applies it as perm @ rows on the MXU. Values ride as 16-bit limb planes
  in f32 (exact: one-hot rows have a single 1, so each output element is a
  single f32-representable 16-bit value). Output: tile-sorted rows + per
  (tile, partition) counts — the same two-level layout the reference's
  partitioned_batch_iterator walks (per-partition row runs + offsets).

Compared against: jax.lax.sort by partition id with the value columns as
payload (the engine's current partition path), and a post-sort gather.

Writes ONE JSON line per shape; commit the result either way — a ≥5x win
justifies wiring under exec/grace.py / parallel/shuffle.py _bucketize, a
loss is the documented negative result.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def tile_partition_sort_pallas(codes: jax.Array, limbs: jax.Array,
                               K: int, tile: int):
    """codes: (N,) int32 in [0, K); limbs: (N, L) f32 (16-bit-limb planes).
    Returns (sorted_limbs (N, L), counts (N//tile, K)).

    The codes ride as an extra f32 column of the limb matrix: Mosaic
    rejects a separate 1-D s32 operand (XLA lays s32[N] out with a
    (1024) tile that no per-grid-step block matches), while a 2-D block
    whose last dim equals the array's is always legal — and the code
    column then permutes with its rows for free."""
    from jax.experimental import pallas as pl

    N, L = limbs.shape
    T = N // tile
    KP = 128  # counts ride an (8, 128) block per grid step (Mosaic tiling)
    assert K <= KP
    both = jnp.concatenate([limbs, codes.astype(jnp.float32)[:, None]],
                           axis=1)  # (N, L+1)

    def kernel(limbs_ref, out_ref, counts_ref):
        rows = limbs_ref[:]  # (tile, L+1); last column = partition code
        c = rows[:, L].astype(jnp.int32)  # (tile,)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tile, KP), 1)
        onehot = (cols == c[:, None]).astype(jnp.float32)  # (tile, KP)
        # stable in-tile counting sort destinations:
        #   dst[j] = starts[c[j]] + rank_within_code[j]
        # Mosaic has no cumsum lowering — prefix sums are triangular
        # matmuls, which is MXU work anyway.
        counts = jnp.sum(onehot, axis=0)  # (KP,)
        i0 = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
        i1 = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
        tri = (i0 > i1).astype(jnp.float32)  # strictly-lower: exclusive
        csum = jnp.dot(tri, onehot, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)  # (tile, KP)
        k0 = jax.lax.broadcasted_iota(jnp.int32, (KP, KP), 0)
        k1 = jax.lax.broadcasted_iota(jnp.int32, (KP, KP), 1)
        ut = (k0 < k1).astype(jnp.float32)  # strictly-upper
        starts = jnp.dot(counts[None, :], ut, precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)  # (1, KP)
        rank = jnp.sum(csum * onehot, axis=1)  # (tile,)
        base = jnp.sum(starts * onehot, axis=1)
        dst = (base + rank).astype(jnp.int32)  # (tile,)
        # permutation one-hot: perm[d, j] = (dst[j] == d)
        drows = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
        perm = (drows == dst[None, :]).astype(jnp.float32)
        out_ref[:] = jnp.dot(perm, rows, precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
        row0 = jax.lax.broadcasted_iota(jnp.int32, (8, KP), 0) == 0
        counts_ref[:] = jnp.where(row0, counts[None, :], 0.0)

    out, counts8 = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[pl.BlockSpec((tile, L + 1), lambda t: (t, 0))],
        out_specs=[pl.BlockSpec((tile, L + 1), lambda t: (t, 0)),
                   pl.BlockSpec((8, KP), lambda t: (t, 0))],
        out_shape=[jax.ShapeDtypeStruct((N, L + 1), jnp.float32),
                   jax.ShapeDtypeStruct((T * 8, KP), jnp.float32)],
        interpret=(jax.default_backend() != "tpu"),
    )(both)
    return out[:, :L], counts8.reshape(T, 8, KP)[:, 0, :K]


def pack_limbs(vals: np.ndarray) -> np.ndarray:
    """(N,) int64 -> (N, 4) f32 of 16-bit limbs (exact in f32)."""
    u = vals.astype(np.uint64)
    out = np.empty((len(vals), 4), np.float32)
    for i in range(4):
        out[:, i] = ((u >> (16 * i)) & 0xFFFF).astype(np.float32)
    return out


def _sync(out):
    """Force completion via a 1-element host transfer: under the axon
    tunnel block_until_ready can return before the remote execution
    lands (timings read 2000+ GB/s, above the HBM roofline); a
    device->host copy of any output buffer genuinely waits."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def bench(fn, *args, reps=5):
    out = fn(*args)
    _sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 23)
    ap.add_argument("--cols", type=int, default=4, help="int64 value columns")
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    try:
        os_mk = os = None
        import os
        os.makedirs("/tmp/jax_cache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass

    rng = np.random.default_rng(7)
    N, C, K = args.n, args.cols, args.k
    codes = jnp.asarray(rng.integers(0, K, N).astype(np.int32))
    vals64 = [rng.integers(0, 1 << 62, N).astype(np.int64) for _ in range(C)]
    payload = [jnp.asarray(v) for v in vals64]
    limbs = jnp.asarray(np.concatenate([pack_limbs(v) for v in vals64], axis=1))

    # baseline 1: payload-riding lax.sort (the compact_batch shape)
    @jax.jit
    def ref_sort(codes, *pay):
        out = jax.lax.sort((codes,) + pay, num_keys=1, is_stable=True)
        return out[1:]

    t_sort = bench(ref_sort, codes, *payload)

    # baseline 2: canonical perm sort + per-column gathers (the grace shape)
    @jax.jit
    def ref_perm_gather(codes, *pay):
        iota = jnp.arange(codes.shape[0], dtype=jnp.int32)
        _, perm = jax.lax.sort((codes, iota), num_keys=1, is_stable=True)
        return tuple(jnp.take(p, perm) for p in pay)

    t_pg = bench(ref_perm_gather, codes, *payload)

    # pallas tile-local partition sort (two-level layout)
    jitted = jax.jit(functools.partial(
        tile_partition_sort_pallas, K=K, tile=args.tile))
    try:
        t_pal = bench(jitted, codes, limbs)
        err = None
        # correctness: within each tile, rows grouped by code, stable
        s_limbs, counts = jitted(codes, limbs)
        h_codes = np.asarray(codes[: args.tile])
        order = np.argsort(h_codes, kind="stable")
        expect = np.asarray(limbs[: args.tile])[order]
        got = np.asarray(s_limbs[: args.tile])
        if not np.array_equal(expect, got):
            err = "tile 0 mismatch"
    except Exception as e:  # Mosaic lowering/backend failure
        t_pal = None
        err = f"{type(e).__name__}: {e}"

    bytes_moved = N * C * 8 * 2  # read + write of the payload
    doc = {
        "n": N, "cols": C, "k": K, "tile": args.tile,
        "backend": jax.default_backend(),
        "lax_sort_payload_s": round(t_sort, 5),
        "perm_sort_gather_s": round(t_pg, 5),
        "pallas_tile_sort_s": round(t_pal, 5) if t_pal else None,
        "pallas_error": err,
        "lax_sort_gbps": round(bytes_moved / t_sort / 1e9, 2),
        "perm_gather_gbps": round(bytes_moved / t_pg / 1e9, 2),
        "pallas_gbps": (round(bytes_moved / t_pal / 1e9, 2) if t_pal else None),
        "speedup_vs_lax_sort": (round(t_sort / t_pal, 2) if t_pal else None),
    }
    line = json.dumps(doc)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
