"""Orderable sort-key limbs: map any column to int64 limb arrays whose
lexicographic signed-int order equals the column's SQL order.

This is the TPU-native analog of arrow-rs's Row format used by the reference
for range partitioning and SMJ comparisons (reference:
native/shuffle/src/comet_partitioning.rs Range via RowConverter;
planner.rs:2095 SMJ). Fixed-width limbs keep everything static-shape and
VPU-friendly; multi-limb lexsort composes stable argsorts.

Ordering contracts implemented (Spark semantics):
- NaN sorts greater than all floats; -0.0 == 0.0 (reference:
  CometExecRule.scala:548 normalization);
- nulls first/last per SortOrder (reference: operator.proto SortOrder);
- strings compare as unsigned bytes, shorter-prefix first.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import Batch, ColumnVector

__all__ = ["column_limbs", "order_limbs", "lexsort", "grouping_limbs"]

_SIGN64 = np.int64(np.uint64(1) << np.uint64(63)).view(np.int64) if False else None
_SIGN_BIT = jnp.int64(-0x8000000000000000)


def _float_orderable(data: jax.Array) -> jax.Array:
    """Map float bits to int64 whose signed order equals Spark float order
    (NaN canonicalized greatest, -0.0 == 0.0)."""
    d = data.astype(jnp.float64)
    d = jnp.where(d == 0.0, 0.0, d)  # -0.0 -> +0.0
    d = jnp.where(jnp.isnan(d), jnp.inf * 2 if False else jnp.nan, d)
    bits = jax.lax.bitcast_convert_type(d, jnp.int64)
    # canonical NaN: replace any NaN bit pattern with +inf+1 (greater than inf)
    inf_bits = jax.lax.bitcast_convert_type(jnp.asarray(jnp.inf, jnp.float64), jnp.int64)
    bits = jnp.where(jnp.isnan(d), inf_bits + 1, bits)
    # IEEE-754 total order trick: negative floats need bit flip
    flipped = jnp.where(bits < 0, _SIGN_BIT - bits, bits)
    return flipped


def _string_limbs(cv: ColumnVector) -> List[jax.Array]:
    """Pack padded bytes big-endian into i64 limbs; flip sign bit so signed
    compare == unsigned byte compare. Zero padding encodes prefix order."""
    mat = cv.data
    cap, w = mat.shape
    n_limbs = (w + 7) // 8
    padded_w = n_limbs * 8
    if padded_w != w:
        mat = jnp.pad(mat, ((0, 0), (0, padded_w - w)))
    m = mat.astype(jnp.int64).reshape(cap, n_limbs, 8)
    shifts = jnp.asarray([56, 48, 40, 32, 24, 16, 8, 0], jnp.int64)
    limbs_mat = jnp.sum(m << shifts[None, None, :], axis=2)
    return [(limbs_mat[:, i] ^ _SIGN_BIT) for i in range(n_limbs)]


def column_limbs(cv: ColumnVector) -> List[jax.Array]:
    """Value limbs (no null handling): signed-i64 arrays, most significant
    first, whose lexicographic order equals the column's value order."""
    dt = cv.dtype
    if dt.is_binary:
        return _string_limbs(cv)
    if dt.is_floating:
        return [_float_orderable(cv.data)]
    if dt.is_boolean:
        return [cv.data.astype(jnp.int64)]
    # ints, decimals (scaled i64), dates, timestamps
    return [cv.data.astype(jnp.int64)]


def order_limbs(
    cv: ColumnVector,
    ascending: bool,
    nulls_first: bool,
    row_mask: jax.Array,
) -> List[jax.Array]:
    """Limbs for ORDER BY semantics: a null limb then (possibly negated)
    value limbs. Inactive rows sort last regardless (callers prepend an
    activity limb when needed)."""
    vals = column_limbs(cv)
    if not ascending:
        # descending: bitwise-not (= -v-1) reverses signed order limb-wise,
        # which reverses the lexicographic order of the limb sequence.
        vals = [~v for v in vals]
    null_rank = jnp.where(cv.validity, 1, 0 if nulls_first else 2).astype(jnp.int64)
    return [null_rank] + vals


def grouping_limbs(cols: Sequence[ColumnVector]) -> List[jax.Array]:
    """Limbs for GROUP BY / join keys: equality-correct (null == null forms
    its own group)."""
    out: List[jax.Array] = []
    for cv in cols:
        out.append((~cv.validity).astype(jnp.int64))
        vals = column_limbs(cv)
        # neutralize null rows' values so all nulls land in one group
        out.extend([jnp.where(cv.validity, v, 0) for v in vals])
    return out


def lexsort(limbs: Sequence[jax.Array]) -> jax.Array:
    """Stable lexicographic argsort, most-significant limb first."""
    n = limbs[0].shape[0]
    perm = jnp.arange(n)
    for limb in reversed(list(limbs)):
        order = jnp.argsort(limb[perm], stable=True)
        perm = perm[order]
    return perm
