"""Shared operator utilities: compaction, segment math, multi-limb binary search.

All helpers are jit-compatible and static-shape: they operate on batches with
a fixed capacity and a live-row mask (the selection-vector design from
exec/batch.py). The multi-limb lexicographic binary search is the probe-side
primitive of the hash join (reference analog: DataFusion's hash table probe,
planner.rs:2161 HashJoin) reformulated for sorted keys, which is the
XLA-friendly shape: no pointer chasing, just `fori_loop` of vector compares.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from datafusion_comet_tpu.exec.batch import Batch, ColumnVector

__all__ = [
    "compaction_perm",
    "compact",
    "segment_starts",
    "lex_lower_bound",
    "lex_upper_bound",
]


def compaction_perm(row_mask: jax.Array) -> jax.Array:
    """Stable permutation putting live rows first (original order preserved)."""
    return jnp.argsort(~row_mask, stable=True)


def compact(batch: Batch) -> Batch:
    """Front-pack live rows; mask becomes a prefix."""
    perm = compaction_perm(batch.row_mask)
    n = batch.num_rows()
    mask = jnp.arange(batch.capacity) < n
    return batch.take(perm, mask)


def segment_starts(seg_change: jax.Array) -> jax.Array:
    """seg_change (n,) bool with True at each segment start → seg ids (n,)."""
    return jnp.cumsum(seg_change.astype(jnp.int32)) - 1


def _lex_lt(
    a: Sequence[jax.Array], ai: jax.Array, b: Sequence[jax.Array]
) -> jax.Array:
    """a[ai] < b lexicographically; a limbs are sorted arrays, b query rows.

    Both are signed-i64 limb lists, most significant first (see sortkeys)."""
    lt = jnp.zeros(b[0].shape, bool)
    eq = jnp.ones(b[0].shape, bool)
    for la, lb in zip(a, b):
        va = la[ai]
        lt = lt | (eq & (va < lb))
        eq = eq & (va == lb)
    return lt


def _lex_le(a: Sequence[jax.Array], ai: jax.Array, b: Sequence[jax.Array]) -> jax.Array:
    lt = jnp.zeros(b[0].shape, bool)
    eq = jnp.ones(b[0].shape, bool)
    for la, lb in zip(a, b):
        va = la[ai]
        lt = lt | (eq & (va < lb))
        eq = eq & (va == lb)
    return lt | eq


def _lex_search(
    sorted_limbs: Sequence[jax.Array],
    query_limbs: Sequence[jax.Array],
    n_valid: jax.Array,
    le: bool,
) -> jax.Array:
    """Vectorized branchless binary search over the first ``n_valid`` rows of
    ``sorted_limbs``. Returns, per query row, the count of sorted rows that are
    < query (lower bound) or <= query (upper bound)."""
    cap = sorted_limbs[0].shape[0]
    nq = query_limbs[0].shape[0]
    steps = max(cap.bit_length(), 1)
    lo = jnp.zeros(nq, jnp.int32)
    hi = jnp.broadcast_to(n_valid.astype(jnp.int32), (nq,))

    cmp = _lex_le if le else _lex_lt

    def body(_, state):
        lo, hi = state
        mid = (lo + hi) // 2
        midc = jnp.clip(mid, 0, cap - 1)
        # sorted[mid] < q (or <= q) → search right half
        go_right = cmp(sorted_limbs, midc, query_limbs) & (mid < hi)
        lo2 = jnp.where(go_right, mid + 1, lo)
        hi2 = jnp.where(go_right, hi, mid)
        keep = lo < hi
        return (jnp.where(keep, lo2, lo), jnp.where(keep, hi2, hi))

    lo, hi = jax.lax.fori_loop(0, steps + 1, body, (lo, hi))
    return lo


def lex_lower_bound(sorted_limbs, query_limbs, n_valid) -> jax.Array:
    """Index of first sorted row >= query (within the first n_valid rows)."""
    return _lex_search(sorted_limbs, query_limbs, n_valid, le=False)


def lex_upper_bound(sorted_limbs, query_limbs, n_valid) -> jax.Array:
    """Index of first sorted row > query (within the first n_valid rows)."""
    return _lex_search(sorted_limbs, query_limbs, n_valid, le=True)
