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


def _f32_orderable(f32: jax.Array) -> jax.Array:
    """float32 → int32 whose signed order equals float order (finite values;
    callers handle NaN). Native on TPU: one bitcast + flip."""
    bits = jax.lax.bitcast_convert_type(f32, jnp.int32)
    return jnp.where(bits < 0, jnp.int32(-0x80000000) - bits, bits)


def f64_decompose(d: jax.Array):
    """Exact (exponent, 52-bit mantissa) of |d| via arithmetic only — the TPU
    X64-rewrite has no f64 bitcast at all, so bits are reconstructed with
    power-of-two scaling (every step multiplies by an exact 2^±k, so the
    normalized value a ∈ [1,2) is bit-exact).

    Returns (e, m52) as (int32, float64-integer) with a == (1 + m52/2^52),
    d == ±a·2^e. Caller handles 0/NaN/Inf.

    Known deviation: XLA enables flush-to-zero/denormals-are-zero, so
    subnormal doubles compare equal to 0.0 and are classified as zero by
    callers — consistent with every other arithmetic op in the engine, but
    different from Spark-on-CPU for |x| < 2.23e-308 (documented, analogous
    to the reference's allowIncompatible expressions)."""
    a = jnp.abs(d)
    e = jnp.zeros(d.shape, jnp.int32)
    # scale down: bring a < 2
    for k in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        big = a >= np.float64(2.0) ** k
        a = jnp.where(big, a * np.float64(2.0) ** (-k), a)
        e = e + jnp.where(big, k, 0)
    # scale up: bring a >= 1 (subnormals included; exact multiplies).
    # 512 appears twice: one greedy pass covers a deficit of at most the sum
    # of remaining steps, and subnormals need up to 2^1074 (> 1023).
    for k in (512, 512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        small = a < np.float64(2.0) ** (1 - k)
        a = jnp.where(small, a * np.float64(2.0) ** k, a)
        e = e - jnp.where(small, k, 0)
    m52 = (a - 1.0) * np.float64(2.0**52)  # exact integer in [0, 2^52)
    return e, m52


def _float_orderable(data: jax.Array) -> List[jax.Array]:
    """Map floats to int32 limbs whose lexicographic signed order equals
    Spark float order (NaN canonicalized greatest, -0.0 == 0.0). float64 uses
    the arithmetic decomposition above: limbs (class, ±e, ±m_hi, ±m_lo)."""
    nan = jnp.isnan(data)
    if data.dtype == jnp.float32:
        d = jnp.where(data == 0.0, jnp.float32(0.0), data)
        d = jnp.where(nan, jnp.float32(jnp.inf), d)
        limb = _f32_orderable(d) + nan.astype(jnp.int32)  # NaN > +inf
        return [limb]
    d = data.astype(jnp.float64)
    zero = d == 0.0
    inf = jnp.isinf(d)
    neg = (d < 0.0) & ~nan
    finite = ~zero & ~inf & ~nan
    e, m52 = f64_decompose(jnp.where(finite, d, 1.0))
    mhi = jnp.floor(m52 * np.float64(2.0**-26)).astype(jnp.int32)
    mlo = (m52 - mhi.astype(jnp.float64) * np.float64(2.0**26)).astype(jnp.int32)
    BIGE = jnp.int32(5000)
    e = jnp.where(zero, -BIGE, jnp.where(inf, BIGE, jnp.where(nan, BIGE + 1, e)))
    mhi = jnp.where(finite, mhi, 0)
    mlo = jnp.where(finite, mlo, 0)
    # sign class first; within negatives all magnitude limbs reverse
    l0 = jnp.where(nan, jnp.int32(2), jnp.where(zero, 0, jnp.where(neg, -1, 1)))
    l1 = jnp.where(neg, -e, e)
    l2 = jnp.where(neg, -mhi, mhi)
    l3 = jnp.where(neg, -mlo, mlo)
    return [l0, l1, l2, l3]


def _string_limbs(cv: ColumnVector) -> List[jax.Array]:
    """Pack padded bytes big-endian into i64 limbs; flip sign bit so signed
    compare == unsigned byte compare. Zero padding encodes prefix order."""
    mat = cv.data
    cap, w = mat.shape
    if w <= 4:
        # short strings: one native int32 limb (big-endian pack + sign flip)
        m = jnp.zeros(cap, jnp.int32)
        for i in range(4):
            b = mat[:, i].astype(jnp.int32) if i < w else jnp.zeros(cap, jnp.int32)
            m = (m << 8) | b
        return [m ^ jnp.int32(-0x80000000)]
    n_limbs = (w + 7) // 8
    padded_w = n_limbs * 8
    if padded_w != w:
        mat = jnp.pad(mat, ((0, 0), (0, padded_w - w)))
    m = mat.astype(jnp.int64).reshape(cap, n_limbs, 8)
    shifts = jnp.asarray([56, 48, 40, 32, 24, 16, 8, 0], jnp.int64)
    limbs_mat = jnp.sum(m << shifts[None, None, :], axis=2)
    return [(limbs_mat[:, i] ^ _SIGN_BIT) for i in range(n_limbs)]


def column_limbs(cv: ColumnVector) -> List[jax.Array]:
    """Value limbs (no null handling): signed int arrays, most significant
    first, whose lexicographic order equals the column's value order.

    Limbs are int32 whenever the type fits (TPU-native; int64 is emulated
    on TPU) and int64 only for 64-bit payloads."""
    dt = cv.dtype
    if dt.is_binary:
        if cv.is_dict:
            # sorted dictionary ⇒ codes are order-isomorphic to string
            # order: ONE int32 limb replaces width/8 packed byte limbs
            return [cv.data.astype(jnp.int32)]
        return _string_limbs(cv)
    if dt.is_floating:
        limbs = _float_orderable(cv.data)
        return [l.astype(jnp.int32) for l in limbs]
    if dt.is_boolean:
        return [cv.data.astype(jnp.int32)]
    if dt.type_id in ("INT8", "INT16", "INT32", "DATE"):
        return [cv.data.astype(jnp.int32)]
    if dt.is_decimal and cv.data.ndim == 2:
        # two-limb i128 decimal: (hi signed, lo bias-flipped to signed) —
        # the lexicographic signed limb order equals i128 value order
        hi = cv.data[:, 0].astype(jnp.int64)
        lo = cv.data[:, 1].astype(jnp.int64) ^ jnp.int64(-0x8000000000000000)
        return [hi, lo]
    # int64, narrow decimals (scaled i64), timestamps
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
    null_rank = jnp.where(cv.validity, 1, 0 if nulls_first else 2).astype(jnp.int32)
    return [null_rank] + vals


def grouping_limbs(cols: Sequence[ColumnVector]) -> List[jax.Array]:
    """Limbs for GROUP BY / join keys: equality-correct (null == null forms
    its own group)."""
    out: List[jax.Array] = []
    for cv in cols:
        out.append((~cv.validity).astype(jnp.int32))
        vals = column_limbs(cv)
        # neutralize null rows' values so all nulls land in one group
        out.extend([jnp.where(cv.validity, v, 0) for v in vals])
    return out


def lexsort(limbs: Sequence[jax.Array]) -> jax.Array:
    """Stable lexicographic argsort, most-significant limb first.

    Lowered as ONE variadic `lax.sort` (XLA sorts all operands by the first
    ``num_keys`` lexicographically) instead of k chained stable argsorts —
    the single most important sort optimization on TPU."""
    n = limbs[0].shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    ops = tuple(limbs) + (iota,)
    out = jax.lax.sort(ops, num_keys=len(limbs), is_stable=True)
    return out[-1]
