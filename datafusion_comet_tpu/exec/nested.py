"""Nested-type expression kernels: LIST / STRUCT / MAP.

TPU-native analog of the reference's array/struct/map function crates
(reference: native/spark-expr/src/{array_funcs,struct_funcs,map_funcs}/).
The design premise: a LIST column carries a fixed per-row element capacity
``E`` (types.py list_), so every array function vectorizes as dense ops over
``(cap, E)`` (or ``(cap, E, L)`` for string elements) arrays on the VPU —
no per-row loops, no dynamic shapes. Compaction (distinct/remove/except)
is a stable argsort over drop flags along the element axis; membership is a
broadcasted pairwise-equality reduction.

Null semantics follow Spark:
- a null array/map input → null output;
- ``array_contains`` returns null (not false) when no match but the array
  contains a null element (likewise ``arrays_overlap``);
- equality used by membership functions is *ordering* equality — NaN equals
  NaN (Spark TypeUtils.getInterpretedOrdering), unlike ``=``.

MAP columns are entry lists (STRUCT<key,value> elements) deduplicated
keep-last (Spark's LAST_WIN map-key dedup policy; the default EXCEPTION
policy's duplicate-key error is recorded on the ANSI side channel by map()).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import Batch, ColumnVector
from datafusion_comet_tpu.ir import expr as E

__all__ = ["ev_nested", "ev_hof"]


# -------------------------------------------------------------------------------------
# small helpers
# -------------------------------------------------------------------------------------


def _present(arr: ColumnVector) -> jax.Array:
    """(cap, E) bool: slot occupied (pos < per-row length)."""
    E_ = arr.children[0].validity.shape[1]
    pos = jnp.arange(E_, dtype=jnp.int32)[None, :]
    return pos < arr.data[:, None]


def _pad_last(mat: jax.Array, w: int) -> jax.Array:
    if mat.shape[-1] == w:
        return mat
    pad = [(0, 0)] * (mat.ndim - 1) + [(0, w - mat.shape[-1])]
    return jnp.pad(mat, pad)


def _eq_data(a_data, a_len, b_data, b_len, dtype: T.DataType) -> jax.Array:
    """Ordering equality of two broadcast-compatible element buffers.
    String buffers carry a trailing byte axis; lengths compare first."""
    if dtype.is_binary:
        w = max(a_data.shape[-1], b_data.shape[-1])
        byte_eq = jnp.all(_pad_last(a_data, w) == _pad_last(b_data, w), axis=-1)
        return byte_eq & (a_len == b_len)
    if dtype.is_floating:
        return (a_data == b_data) | (jnp.isnan(a_data) & jnp.isnan(b_data))
    return a_data == b_data


def _elem_vs_scalar_eq(elem: ColumnVector, scalar: ColumnVector, dtype: T.DataType) -> jax.Array:
    """(cap, E) equality of list items vs a per-row scalar."""
    if dtype.is_binary:
        return _eq_data(elem.data, elem.lengths, scalar.data[:, None, :], scalar.lengths[:, None], dtype)
    return _eq_data(elem.data, None, scalar.data[:, None], None, dtype)


def _pairwise_eq(a: ColumnVector, b: ColumnVector, dtype: T.DataType) -> jax.Array:
    """(cap, Ea, Eb) equality between items of two list element CVs."""
    if dtype.is_binary:
        return _eq_data(
            a.data[:, :, None, :], a.lengths[:, :, None],
            b.data[:, None, :, :], b.lengths[:, None, :], dtype,
        )
    return _eq_data(a.data[:, :, None], None, b.data[:, None, :], None, dtype)


def _compact(keep: jax.Array, elem: ColumnVector) -> Tuple[jax.Array, ColumnVector]:
    """Stable left-compaction of kept items; returns (new_lens, new elem CV)."""
    order = jnp.argsort(~keep, axis=1, stable=True)

    def g(a):
        if a is None:
            return None
        idx = order.reshape(order.shape + (1,) * (a.ndim - 2))
        return jnp.take_along_axis(a, jnp.broadcast_to(idx, order.shape + a.shape[2:]), axis=1)

    new_lens = jnp.sum(keep, axis=1).astype(jnp.int32)
    kept_sorted = jnp.take_along_axis(keep, order, axis=1)
    out = _map_elem(elem, g)
    out = out.with_validity(out.validity & kept_sorted)
    return new_lens, out


def _map_elem(cv: ColumnVector, g: Callable) -> ColumnVector:
    return ColumnVector(
        g(cv.data), g(cv.validity), g(cv.lengths), cv.dtype,
        tuple(_map_elem(c, g) for c in cv.children),
    )


def _list_cv(lens, validity, elem: ColumnVector, dtype: T.DataType) -> ColumnVector:
    return ColumnVector(lens.astype(jnp.int32), validity, None, dtype, (elem,))


def _scalar_to_elem(cv: ColumnVector, E_: int) -> ColumnVector:
    """Broadcast a per-row scalar CV to an (cap, E) element CV."""

    def g(a):
        if a is None:
            return None
        return jnp.broadcast_to(a[:, None, ...], (a.shape[0], E_) + a.shape[1:])

    return _map_elem(cv, g)


def _set_item(elem: ColumnVector, at: jax.Array, value: ColumnVector) -> ColumnVector:
    """Write per-row scalar ``value`` into element slot ``at`` (cap,)."""
    E_ = elem.validity.shape[1]
    pos = jnp.arange(E_, dtype=jnp.int32)[None, :]
    hit = pos == at[:, None]

    def combine(ed, vd):
        if ed is None:
            return None
        h = hit.reshape(hit.shape + (1,) * (ed.ndim - 2))
        return jnp.where(h, vd[:, None, ...], ed)

    out = ColumnVector(
        combine(elem.data, value.data),
        jnp.where(hit, value.validity[:, None], elem.validity),
        combine(elem.lengths, value.lengths),
        elem.dtype,
        tuple(_set_item(c, at, vc) for c, vc in zip(elem.children, value.children)),
    )
    return out


def _gather_item(elem: ColumnVector, idx: jax.Array) -> ColumnVector:
    """Gather one element per row by (cap,) index along the element axis."""

    def g(a):
        if a is None:
            return None
        i = idx.reshape(idx.shape + (1,) * (a.ndim - 1))
        return jnp.take_along_axis(a, jnp.broadcast_to(i, (a.shape[0], 1) + a.shape[2:]), axis=1)[:, 0]

    return _map_elem(elem, g)


def _stack_scalars(cvs, dtype: T.DataType) -> ColumnVector:
    """Stack N per-row scalar CVs into an (cap, N) element CV."""

    def pick(field):
        parts = [getattr(c, field) for c in cvs]
        if any(p is None for p in parts):
            return None
        if dtype.is_binary and field == "data":
            w = max(p.shape[-1] for p in parts)
            parts = [_pad_last(p, w) for p in parts]
        return jnp.stack(parts, axis=1)

    kids = ()
    if cvs[0].children:
        kids = tuple(
            _stack_scalars([c.children[i] for c in cvs], cvs[0].children[i].dtype)
            for i in range(len(cvs[0].children))
        )
    return ColumnVector(pick("data"), pick("validity"), pick("lengths"), dtype, kids)


def _orderable_key(elem: ColumnVector) -> jax.Array:
    """Exact per-item int64 total-order key with Spark ordering (NaN greatest,
    -0.0 < +0.0). Floats use the IEEE sign-flip trick; f64 bits come from the
    TPU-safe reconstruction (no 64-bit bitcast — evaluator._f64_bits_i64).
    Non-nested, non-string elements only."""
    dt = elem.dtype
    d = elem.data
    if dt.type_id == "FLOAT":
        bits = jax.lax.bitcast_convert_type(d, jnp.int32)
        key32 = jnp.where(bits < 0, (~bits) ^ jnp.int32(-0x80000000), bits)
        return key32.astype(jnp.int64)
    if dt.type_id == "DOUBLE":
        from datafusion_comet_tpu.exec.evaluator import _f64_bits_i64

        bits = _f64_bits_i64(d)
        return jnp.where(bits < 0, (~bits) ^ jnp.int64(-0x8000000000000000), bits)
    return d.astype(jnp.int64)


# -------------------------------------------------------------------------------------
# dispatch
# -------------------------------------------------------------------------------------


def ev_nested(e: E.Expr, b: Batch, ctx, ev: Callable) -> ColumnVector:
    if isinstance(e, E.StructExpr):
        kids = tuple(ev(a, b, ctx) for a in e.args)
        cap = b.capacity
        return ColumnVector(
            jnp.zeros(cap, jnp.int8), jnp.ones(cap, bool), None, e.dtype, kids
        )
    if isinstance(e, E.GetStructField):
        c = ev(e.child, b, ctx)
        out = c.children[e.field]
        return out.with_validity(out.validity & c.validity)
    if isinstance(e, E.ArrayExpr):
        return _ev_array(e, b, ctx, ev)
    if isinstance(e, E.MapExpr):
        return _ev_map(e, b, ctx, ev)
    raise NotImplementedError(type(e).__name__)


def _coerced(ev, a: E.Expr, b, ctx, to: T.DataType) -> ColumnVector:
    from datafusion_comet_tpu.exec import evaluator as EV

    return EV._coerce(ev(a, b, ctx), to, ctx)


def _ev_array(e: E.ArrayExpr, b: Batch, ctx, ev: Callable) -> ColumnVector:
    f = e.func
    cap = b.capacity
    if f == "array":
        et = e.dtype.element
        vals = [_coerced(ev, a, b, ctx, et) for a in e.args]
        elem = _stack_scalars(vals, et)
        lens = jnp.full(cap, len(vals), jnp.int32)
        return _list_cv(lens, jnp.ones(cap, bool), elem, e.dtype)

    arr = ev(e.args[0], b, ctx)

    if f == "size":
        return ColumnVector(arr.data.astype(jnp.int32), arr.validity, None, T.INT32)

    if f in ("array_contains", "array_position"):
        et = arr.dtype.element
        val = _coerced(ev, e.args[1], b, ctx, et)
        pres = _present(arr)
        eq = _elem_vs_scalar_eq(arr.children[0], val, et)
        hit = pres & arr.children[0].validity & eq
        any_hit = jnp.any(hit, axis=1)
        valid = arr.validity & val.validity
        if f == "array_position":
            first = jnp.argmax(hit, axis=1).astype(jnp.int64) + 1
            data = jnp.where(any_hit, first, jnp.int64(0))
            return ColumnVector(data, valid, None, T.INT64)
        has_null_item = jnp.any(pres & ~arr.children[0].validity, axis=1)
        valid = valid & (any_hit | ~has_null_item)
        return ColumnVector(any_hit, valid, None, T.BOOL)

    if f in ("element_at", "get_array_item"):
        idx_cv = _coerced(ev, e.args[1], b, ctx, T.INT32)
        lens = arr.data
        if f == "element_at":  # 1-based; negative counts from the end
            i = idx_cv.data
            zero_err = i == 0
            if zero_err is not None:
                ctx.record_error(idx_cv.validity & zero_err & b.row_mask,
                                 "SQL array indices start at 1")
            idx0 = jnp.where(i > 0, i - 1, lens + i)
        else:  # 0-based
            idx0 = idx_cv.data
        in_range = (idx0 >= 0) & (idx0 < lens)
        item = _gather_item(arr.children[0], jnp.clip(idx0, 0, arr.children[0].validity.shape[1] - 1))
        valid = arr.validity & idx_cv.validity & in_range & item.validity
        return item.with_validity(valid)

    if f in ("array_min", "array_max"):
        pres = _present(arr)
        elem = arr.children[0]
        ok = pres & elem.validity
        key = _orderable_key(elem)
        imax, imin = jnp.iinfo(jnp.int64).max, jnp.iinfo(jnp.int64).min
        masked = jnp.where(ok, key, imax if f == "array_min" else imin)
        sel = jnp.argmin(masked, axis=1) if f == "array_min" else jnp.argmax(masked, axis=1)
        item = _gather_item(elem, sel)
        return item.with_validity(arr.validity & jnp.any(ok, axis=1))

    if f == "sort_array":
        asc = True
        if len(e.args) > 1:
            a1 = e.args[1]
            asc = bool(a1.value) if isinstance(a1, E.Literal) else True
        elem = arr.children[0]
        pres = _present(arr)
        key = _orderable_key(elem)
        # Spark: nulls first when ascending, nulls last when descending;
        # absent slots always sort to the very end. Two exact int keys
        # (rank, key) — descending negates via bitwise-not (no overflow).
        rank = jnp.where(~pres, jnp.int32(3), jnp.where(elem.validity, 1, 0 if asc else 2))
        k = key if asc else ~key
        E_ = pres.shape[1]
        iota = jnp.broadcast_to(jnp.arange(E_, dtype=jnp.int32)[None, :], pres.shape)
        order = jax.lax.sort((rank, k, iota), dimension=1, is_stable=True, num_keys=2)[2]

        def g(a):
            if a is None:
                return None
            i = order.reshape(order.shape + (1,) * (a.ndim - 2))
            return jnp.take_along_axis(a, jnp.broadcast_to(i, order.shape + a.shape[2:]), axis=1)

        return _list_cv(arr.data, arr.validity, _map_elem(elem, g), e.dtype)

    if f in ("array_distinct", "array_compact", "array_remove"):
        elem = arr.children[0]
        pres = _present(arr)
        if f == "array_compact":
            keep = pres & elem.validity
        elif f == "array_remove":
            et = arr.dtype.element
            val = _coerced(ev, e.args[1], b, ctx, et)
            eq = _elem_vs_scalar_eq(elem, val, et)
            keep = pres & ~(eq & elem.validity & val.validity[:, None])
        else:  # distinct: keep first occurrence (incl. one null)
            pe = _pairwise_eq(elem, elem, arr.dtype.element)
            both_valid = elem.validity[:, :, None] & elem.validity[:, None, :]
            both_null = ~elem.validity[:, :, None] & ~elem.validity[:, None, :]
            same = (pe & both_valid) | both_null
            earlier = jnp.tril(jnp.ones(same.shape[1:], bool), k=-1)[None]
            dup = jnp.any(same & earlier & pres[:, None, :], axis=2)
            keep = pres & ~dup
        lens, out = _compact(keep, elem)
        return _list_cv(lens, arr.validity, out, e.dtype)

    if f == "array_reverse":
        elem = arr.children[0]
        E_ = elem.validity.shape[1]
        pos = jnp.arange(E_, dtype=jnp.int32)[None, :]
        src = jnp.where(pos < arr.data[:, None], arr.data[:, None] - 1 - pos, pos)

        def g(a):
            if a is None:
                return None
            i = src.reshape(src.shape + (1,) * (a.ndim - 2))
            return jnp.take_along_axis(a, jnp.broadcast_to(i, src.shape + a.shape[2:]), axis=1)

        return _list_cv(arr.data, arr.validity, _map_elem(elem, g), e.dtype)

    if f in ("array_append", "array_prepend"):
        et = arr.dtype.element
        val = _coerced(ev, e.args[1], b, ctx, et)
        elem = arr.children[0]
        E_ = elem.validity.shape[1]

        def widen(a):
            if a is None:
                return None
            pad = [(0, 0), (0, 1)] + [(0, 0)] * (a.ndim - 2)
            return jnp.pad(a, pad)

        wid = _map_elem(elem, widen)
        if f == "array_append":
            out = _set_item(wid, arr.data, val)
        else:
            rolled = _map_elem(wid, lambda a: None if a is None else jnp.roll(a, 1, axis=1))
            out = _set_item(rolled, jnp.zeros(cap, jnp.int32), val)
        return _list_cv(arr.data + 1, arr.validity, out, e.dtype)

    if f == "array_repeat":
        # args: (value, count) — arr bound above is the VALUE, not a list
        val = arr
        cnt = _coerced(ev, e.args[1], b, ctx, T.INT32)
        E_ = e.dtype.max_elems
        elem = _scalar_to_elem(val, E_)
        lens = jnp.clip(cnt.data, 0, E_)
        return _list_cv(lens, cnt.validity, elem, e.dtype)

    if f == "arrays_overlap":
        other = ev(e.args[1], b, ctx)
        ea, eb = arr.children[0], other.children[0]
        pa, pb = _present(arr), _present(other)
        pe = _pairwise_eq(ea, eb, arr.dtype.element)
        ok = pe & (pa & ea.validity)[:, :, None] & (pb & eb.validity)[:, None, :]
        any_hit = jnp.any(ok, axis=(1, 2))
        has_null = jnp.any(pa & ~ea.validity, axis=1) | jnp.any(pb & ~eb.validity, axis=1)
        non_empty = (arr.data > 0) & (other.data > 0)
        valid = arr.validity & other.validity & (any_hit | ~(has_null & non_empty))
        return ColumnVector(any_hit, valid, None, T.BOOL)

    if f == "array_insert":
        # Spark array_insert(arr, pos, val): 1-based; pos beyond the end
        # pads with nulls; negative pos counts from the end (Spark 3.4+)
        arr = ev(e.args[0], b, ctx)
        elem = arr.children[0]
        ne_in = elem.validity.shape[1]
        val = _coerced(ev, e.args[2], b, ctx, e.dtype.element)
        pos_cv = ev(e.args[1], b, ctx)
        pos = pos_cv.data.astype(jnp.int32)
        lens = arr.data.astype(jnp.int32)
        at = jnp.where(pos > 0, pos - 1, lens + pos + 1)  # 0-based slot
        at = jnp.clip(at, 0, ne_in)  # ne_in == new last slot index
        new_e = ne_in + 1
        # widen planes by one slot, then shift items at >= `at` right by one
        wide = _map_elem(elem, lambda a: None if a is None else jnp.pad(
            a, [(0, 0), (0, 1)] + [(0, 0)] * (a.ndim - 2)))
        slot = jnp.arange(new_e, dtype=jnp.int32)[None, :]
        src = jnp.where(slot > at[:, None], slot - 1, slot)

        def shift(a):
            if a is None:
                return None
            i = src.reshape(src.shape + (1,) * (a.ndim - 2))
            return jnp.take_along_axis(
                a, jnp.broadcast_to(i, src.shape + a.shape[2:]), axis=1)

        shifted = _map_elem(wide, shift)
        ins = _scalar_to_elem(val, new_e)
        hit = slot == at[:, None]

        def put(sd, vd):
            if sd is None:
                return None
            h = hit.reshape(hit.shape + (1,) * (sd.ndim - 2))
            return jnp.where(h, vd, sd)

        out_elem = ColumnVector(
            put(shifted.data, ins.data),
            jnp.where(hit, ins.validity, shifted.validity),
            put(shifted.lengths, ins.lengths), shifted.dtype,
            tuple(ColumnVector(put(sc.data, ic.data),
                               jnp.where(hit, ic.validity, sc.validity),
                               put(sc.lengths, ic.lengths), sc.dtype)
                  for sc, ic in zip(shifted.children, ins.children)),
        )
        new_lens = jnp.maximum(lens + 1, at + 1)
        ok = arr.validity & pos_cv.validity & (pos != 0)
        ctx.record_error(pos_cv.validity & (pos == 0) & b.row_mask,
                         "array_insert position 0 is invalid")
        return _list_cv(jnp.minimum(new_lens, new_e), ok, out_elem, e.dtype)

    if f == "arrays_zip":
        arrs = [ev(a, b, ctx) for a in e.args]
        w = max(a.children[0].validity.shape[1] for a in arrs)
        valid = arrs[0].validity
        kids = []
        for a in arrs:
            el = a.children[0]
            n_ = el.validity.shape[1]
            el = _map_elem(el, lambda x: None if x is None else jnp.pad(
                x, [(0, 0), (0, w - n_)] + [(0, 0)] * (x.ndim - 2)))
            # slots past this array's length are null fields (Spark pads)
            within = _present(a)
            within = jnp.pad(within, ((0, 0), (0, w - within.shape[1])))
            kids.append(el.with_validity(el.validity & within))
            valid = valid & a.validity
        struct_elem = ColumnVector(
            jnp.zeros((cap, w), jnp.int8), jnp.ones((cap, w), bool), None,
            e.dtype.element, tuple(kids))
        lens = arrs[0].data
        for a in arrs[1:]:
            lens = jnp.maximum(lens, a.data)
        return _list_cv(lens, valid, struct_elem, e.dtype)

    if f == "get_array_struct_field":
        arr = ev(e.args[0], b, ctx)
        idx = int(e.args[1].value)
        field = arr.children[0].children[idx]
        field = field.with_validity(field.validity & arr.children[0].validity)
        return _list_cv(arr.data, arr.validity, field, e.dtype)

    if f == "slice":
        start = _coerced(ev, e.args[1], b, ctx, T.INT32)
        length = _coerced(ev, e.args[2], b, ctx, T.INT32)
        ctx.record_error(start.validity & (start.data == 0) & b.row_mask,
                         "Unexpected value for start in function slice: SQL array indices start at 1")
        ctx.record_error(length.validity & (length.data < 0) & b.row_mask,
                         "Unexpected value for length in function slice: length must be greater than or equal to 0")
        lens = arr.data
        st0 = jnp.where(start.data > 0, start.data - 1, lens + start.data)
        elem = arr.children[0]
        E_ = elem.validity.shape[1]
        pos = jnp.arange(E_, dtype=jnp.int32)[None, :]
        src = st0[:, None] + pos
        new_pres = (pos < length.data[:, None]) & (src >= 0) & (src < lens[:, None])
        srcc = jnp.clip(src, 0, E_ - 1)

        def g(a):
            if a is None:
                return None
            i = srcc.reshape(srcc.shape + (1,) * (a.ndim - 2))
            return jnp.take_along_axis(a, jnp.broadcast_to(i, srcc.shape + a.shape[2:]), axis=1)

        new_lens = jnp.sum(new_pres, axis=1).astype(jnp.int32)
        # slots beyond the slice end must be compact already (they are:
        # new_pres is a prefix whenever src stays in range)
        out = _map_elem(elem, g)
        out = out.with_validity(out.validity & new_pres)
        valid = arr.validity & start.validity & length.validity & ((st0 >= 0) & (st0 <= lens) | (lens == 0))
        return _list_cv(new_lens, valid, out, e.dtype)

    if f in ("array_union", "array_intersect", "array_except"):
        other = ev(e.args[1], b, ctx)
        et = e.dtype.element
        ea = _coerce_elem(arr.children[0], et, ctx)
        eb = _coerce_elem(other.children[0], et, ctx)
        pa, pb = _present(arr), _present(other)
        pe = _pairwise_eq(ea, eb, et)
        bv = ea.validity[:, :, None] & eb.validity[:, None, :]
        bn = ~ea.validity[:, :, None] & ~eb.validity[:, None, :]
        same = (pe & bv) | bn
        in_b = jnp.any(same & pb[:, None, :], axis=2)
        if f == "array_union":
            # concat a|b then distinct
            cat_elem = _concat_elems(ea, eb, et)
            cat_lens_mask = jnp.concatenate([pa, pb], axis=1)
            cat = _list_cv(jnp.sum(cat_lens_mask, axis=1), arr.validity & other.validity,
                           cat_elem.with_validity(cat_elem.validity & cat_lens_mask), e.dtype)
            # compact occupied slots to a prefix, then distinct
            lens1, elem1 = _compact(cat_lens_mask, cat_elem)
            tmp = _list_cv(lens1, cat.validity, elem1, e.dtype)
            return _ev_distinct(tmp, e.dtype)
        if f == "array_intersect":
            keep = pa & in_b
        else:  # except
            keep = pa & ~in_b
        tmp_lens, tmp_elem = _compact(keep, ea)
        tmp = _list_cv(tmp_lens, arr.validity & other.validity, tmp_elem, e.dtype)
        return _ev_distinct(tmp, e.dtype)

    if f == "array_join":
        sep = ev(e.args[1], b, ctx)
        null_repl = ev(e.args[2], b, ctx) if len(e.args) > 2 else None
        return _array_join(arr, sep, null_repl, e.dtype, cap)

    if f == "flatten":
        inner = arr.children[0]  # LIST elements: lens in inner.data (cap, Ea)
        sub = inner.children[0]  # (cap, Ea, Eb, ...)
        Ea = inner.validity.shape[1]
        Eb = sub.validity.shape[2]
        pa = _present(arr)
        pos_b = jnp.arange(Eb, dtype=jnp.int32)[None, None, :]
        pres2 = pa[:, :, None] & inner.validity[:, :, None] & (pos_b < inner.data[:, :, None])
        flat_pres = pres2.reshape(cap, Ea * Eb)

        def g(a):
            if a is None:
                return None
            return a.reshape((cap, Ea * Eb) + a.shape[3:])

        flat_elem = _map_elem(sub, g)
        lens, out = _compact(flat_pres, flat_elem.with_validity(flat_elem.validity & flat_pres))
        # null inner list → whole result null (Spark)
        has_null_inner = jnp.any(pa & ~inner.validity, axis=1)
        return _list_cv(lens, arr.validity & ~has_null_inner, out, e.dtype)

    raise NotImplementedError(f"array func {f}")


def _coerce_elem(elem: ColumnVector, to: T.DataType, ctx) -> ColumnVector:
    if elem.dtype == to:
        return elem
    from datafusion_comet_tpu.exec import evaluator as EV

    shape = elem.validity.shape  # (cap, E)

    def flat(a):
        return None if a is None else a.reshape((shape[0] * shape[1],) + a.shape[2:])

    flat_cv = ColumnVector(flat(elem.data), flat(elem.validity), flat(elem.lengths), elem.dtype,
                           tuple(_map_elem(c, flat) for c in elem.children))
    out = EV._coerce(flat_cv, to, ctx)

    def unflat(a):
        return None if a is None else a.reshape(shape + a.shape[1:])

    return _map_elem(out, unflat)


def _concat_elems(a: ColumnVector, b: ColumnVector, dtype: T.DataType) -> ColumnVector:
    def cat(field):
        x, y = getattr(a, field), getattr(b, field)
        if x is None or y is None:
            return None
        if dtype.is_binary and field == "data":
            w = max(x.shape[-1], y.shape[-1])
            x, y = _pad_last(x, w), _pad_last(y, w)
        return jnp.concatenate([x, y], axis=1)

    kids = tuple(
        _concat_elems(ca, cb, ca.dtype) for ca, cb in zip(a.children, b.children)
    )
    return ColumnVector(cat("data"), cat("validity"), cat("lengths"), dtype, kids)


def _ev_distinct(arr: ColumnVector, out_dtype: T.DataType) -> ColumnVector:
    elem = arr.children[0]
    pres = _present(arr)
    pe = _pairwise_eq(elem, elem, out_dtype.element)
    both_valid = elem.validity[:, :, None] & elem.validity[:, None, :]
    both_null = ~elem.validity[:, :, None] & ~elem.validity[:, None, :]
    same = (pe & both_valid) | both_null
    earlier = jnp.tril(jnp.ones(same.shape[1:], bool), k=-1)[None]
    dup = jnp.any(same & earlier & pres[:, None, :], axis=2)
    keep = pres & ~dup
    lens, out = _compact(keep, elem)
    return _list_cv(lens, arr.validity, out, out_dtype)


def _array_join(arr: ColumnVector, sep: ColumnVector, null_repl, out_dtype: T.DataType, cap: int) -> ColumnVector:
    """Concatenate string list items with a separator. Null items are skipped
    (or replaced when nullReplacement given) — Spark array_join."""
    elem = arr.children[0]
    pres = _present(arr)
    E_ = elem.validity.shape[1]
    L = elem.data.shape[2]
    W = out_dtype.byte_width
    use = pres & (elem.validity if null_repl is None else jnp.ones_like(pres))
    repl_len = null_repl.lengths if null_repl is not None else None
    item_len = jnp.where(
        elem.validity, elem.lengths,
        (repl_len[:, None] if null_repl is not None else jnp.zeros((cap, 1), jnp.int32)),
    )
    item_len = jnp.where(use, item_len, 0)
    n_used = jnp.sum(use, axis=1)
    sep_counted = jnp.where(use, 1, 0)
    # separator before every used item except the first used one
    used_rank = jnp.cumsum(sep_counted, axis=1)
    sep_before = use & (used_rank > 1)
    piece_len = item_len + jnp.where(sep_before, sep.lengths[:, None], 0)
    starts = jnp.cumsum(piece_len, axis=1) - piece_len  # start offset of each piece
    total = jnp.sum(piece_len, axis=1)

    out_pos = jnp.arange(W, dtype=jnp.int32)[None, :]
    # which piece covers output byte j: count pieces whose end <= j
    ends = starts + piece_len
    piece_idx = jnp.sum(out_pos[:, :, None] >= ends[:, None, :], axis=2)
    piece_idx = jnp.clip(piece_idx, 0, E_ - 1)
    off_in_piece = out_pos - jnp.take_along_axis(starts, piece_idx, axis=1)
    sep_len_b = jnp.take_along_axis(jnp.where(sep_before, sep.lengths[:, None], 0), piece_idx, axis=1)
    in_sep = off_in_piece < sep_len_b
    item_off = off_in_piece - sep_len_b
    # gather item bytes: data (cap, E, L) → (cap, W)
    gathered_rows = jnp.take_along_axis(
        elem.data, piece_idx[:, :, None].repeat(L, axis=2), axis=1
    )  # (cap, W, L)
    item_byte = jnp.take_along_axis(
        gathered_rows, jnp.clip(item_off, 0, L - 1)[:, :, None], axis=2
    )[:, :, 0]
    if null_repl is not None:
        item_valid = jnp.take_along_axis(elem.validity, piece_idx, axis=1)
        RL = null_repl.data.shape[1]
        repl_byte = jnp.take_along_axis(
            null_repl.data, jnp.clip(item_off, 0, RL - 1), axis=1
        )
        item_byte = jnp.where(item_valid, item_byte, repl_byte)
    SL = sep.data.shape[1]
    sep_byte = jnp.take_along_axis(sep.data, jnp.clip(off_in_piece, 0, SL - 1), axis=1)
    byte = jnp.where(in_sep, sep_byte, item_byte)
    byte = jnp.where(out_pos < total[:, None], byte, 0).astype(jnp.uint8)
    valid = arr.validity & sep.validity
    return ColumnVector(byte, valid, total.astype(jnp.int32), out_dtype)


# -------------------------------------------------------------------------------------
# maps
# -------------------------------------------------------------------------------------


def _dedup_keys_keep_last(entries: ColumnVector, pres: jax.Array, key_t: T.DataType):
    key_cv = entries.children[0]
    pe = _pairwise_eq(key_cv, key_cv, key_t)
    later = jnp.triu(jnp.ones(pe.shape[1:], bool), k=1)[None]
    dup = jnp.any(pe & later & pres[:, None, :], axis=2)  # a LATER equal key exists
    keep = pres & ~dup
    return _compact(keep, entries)


def _ev_map(e: E.MapExpr, b: Batch, ctx, ev: Callable) -> ColumnVector:
    f = e.func
    cap = b.capacity
    if f == "map":
        kt, vt = e.dtype.key_type, e.dtype.value_type
        ks = [_coerced(ev, a, b, ctx, kt) for a in e.args[0::2]]
        vs = [_coerced(ev, a, b, ctx, vt) for a in e.args[1::2]]
        for k in ks:
            ctx.record_error(~k.validity & b.row_mask, "Cannot use null as map key")
        key_elem = _stack_scalars(ks, kt)
        val_elem = _stack_scalars(vs, vt)
        entries = ColumnVector(
            jnp.zeros((cap, len(ks)), jnp.int8),
            key_elem.validity & jnp.ones((cap, len(ks)), bool),
            None, e.dtype.element, (key_elem, val_elem),
        )
        pres = jnp.ones((cap, len(ks)), bool)
        lens, ded = _dedup_keys_keep_last(entries, pres, kt)
        return _list_cv(lens, jnp.ones(cap, bool), ded, e.dtype)

    if f == "map_from_arrays":
        karr = ev(e.args[0], b, ctx)
        varr = ev(e.args[1], b, ctx)
        kt = e.dtype.key_type
        key_elem, val_elem = karr.children[0], varr.children[0]
        pres = _present(karr)
        ctx.record_error(jnp.any(pres & ~key_elem.validity, axis=1) & b.row_mask,
                         "Cannot use null as map key")
        entries = ColumnVector(
            jnp.zeros(pres.shape, jnp.int8), pres, None, e.dtype.element,
            (key_elem, val_elem),
        )
        lens, ded = _dedup_keys_keep_last(entries, pres, kt)
        return _list_cv(lens, karr.validity & varr.validity, ded, e.dtype)

    if f == "map_concat":
        # entries of every input concatenated along the element axis, then
        # LAST_WIN key dedup (later maps override earlier — Spark's
        # LAST_WIN policy; the default EXCEPTION policy's duplicate error
        # is the documented deviation, module docstring)
        ms = [ev(a, b, ctx) for a in e.args]
        kt = e.dtype.key_type
        entries = ms[0].children[0]
        pres = _present(ms[0])
        valid = ms[0].validity
        for mm in ms[1:]:
            entries = _concat_elems(entries, mm.children[0], e.dtype.element)
            pres = jnp.concatenate([pres, _present(mm)], axis=1)
            valid = valid & mm.validity
        lens, ded = _dedup_keys_keep_last(entries, pres, kt)
        return _list_cv(lens, valid, ded, e.dtype)

    if f == "map_from_entries":
        arr = ev(e.args[0], b, ctx)
        kt = e.dtype.key_type
        entries = arr.children[0]
        pres = _present(arr)
        ctx.record_error(
            jnp.any(pres & ~entries.children[0].validity, axis=1) & b.row_mask,
            "Cannot use null as map key")
        lens, ded = _dedup_keys_keep_last(entries, pres, kt)
        return _list_cv(lens, arr.validity, ded, e.dtype)

    m = ev(e.args[0], b, ctx)
    if f == "size":
        return ColumnVector(m.data.astype(jnp.int32), m.validity, None, T.INT32)
    if f in ("map_keys", "map_values"):
        child = m.children[0].children[0 if f == "map_keys" else 1]
        return _list_cv(m.data, m.validity, child, e.dtype)
    if f == "map_entries":
        return _list_cv(m.data, m.validity, m.children[0], e.dtype)
    if f in ("element_at", "map_contains_key"):
        kt = m.dtype.key_type
        key = _coerced(ev, e.args[1], b, ctx, kt)
        pres = _present(m)
        eq = _elem_vs_scalar_eq(m.children[0].children[0], key, kt)
        hit = pres & eq & m.children[0].children[0].validity
        any_hit = jnp.any(hit, axis=1)
        if f == "map_contains_key":
            return ColumnVector(any_hit, m.validity & key.validity, None, T.BOOL)
        sel = jnp.argmax(hit, axis=1)
        val = _gather_item(m.children[0].children[1], sel)
        return val.with_validity(m.validity & key.validity & any_hit & val.validity)
    raise NotImplementedError(f"map func {f}")


# -------------------------------------------------------------------------------------
# Higher-order functions (reference: array_funcs ArrayTransform/Filter/
# Exists/ForAll/Aggregate/ZipWith/ArraySort)
# -------------------------------------------------------------------------------------
# TPU formulation: a scalar lambda over array elements is the SAME fused
# expression evaluated over the flattened (rows*E,) element plane — outer
# column captures broadcast per element with a reshape (layout-only, no
# gather); `aggregate` folds sequentially over the static element axis (E
# masked steps). No per-row loops anywhere.


def _flatten_elem(elem: ColumnVector, pres: jax.Array) -> ColumnVector:
    def g(a):
        if a is None:
            return None
        return a.reshape((-1,) + a.shape[2:])

    out = _map_elem(elem, g)
    return out.with_validity(out.validity & pres.reshape(-1))


def _unflatten(cv: ColumnVector, cap: int, ne: int) -> ColumnVector:
    def g(a):
        if a is None:
            return None
        return a.reshape((cap, ne) + a.shape[1:])

    return _map_elem(cv, g)


def _expand_batch(b: Batch, ne: int) -> Batch:
    """Repeat every row E times via broadcast+reshape (pure layout; XLA
    prunes columns the lambda body never touches)."""
    from datafusion_comet_tpu.exec.operators.join import _repeat_cv

    cols = tuple(_repeat_cv(c, ne) for c in b.columns)
    mask = jnp.broadcast_to(b.row_mask[:, None], (b.capacity, ne)).reshape(-1)
    return Batch(cols, mask, b.schema)


def _body_ctx(ctx, env):
    import dataclasses as _dc

    return _dc.replace(ctx, lambda_env=env, errors=ctx.errors,
                       overflow_flags=ctx.overflow_flags)


def ev_hof(e: E.HigherOrderFunc, b: Batch, ctx, ev: Callable) -> ColumnVector:
    f = e.func
    cap = b.capacity
    arr = ev(e.args[0], b, ctx)
    pres = _present(arr)
    elem = arr.children[0]
    ne = elem.validity.shape[1]

    if f in ("transform_keys", "transform_values", "map_filter"):
        # map lambdas: (key, value) planes flatten exactly like array
        # elements; keys stay deduplicated (only values/membership change,
        # and transform_keys re-dedups LAST_WIN per the module policy)
        keys, vals = elem.children[0], elem.children[1]
        xb = _expand_batch(b, ne)
        env = {e.params[0]: _flatten_elem(keys, pres),
               e.params[1]: _flatten_elem(vals, pres)}
        body = ev(e.body, xb, _body_ctx(ctx, env))
        if f == "map_filter":
            keep = (body.data.astype(bool) & body.validity).reshape(cap, ne) & pres
            lens, ded = _compact(keep, elem)
            return _list_cv(lens, arr.validity, ded, e.dtype)
        new_plane = _unflatten(body, cap, ne)
        if f == "transform_values":
            entries = ColumnVector(elem.data, elem.validity, None,
                                   e.dtype.element, (keys, new_plane))
            return _list_cv(arr.data, arr.validity, entries, e.dtype)
        entries = ColumnVector(elem.data, elem.validity, None,
                               e.dtype.element, (new_plane, vals))
        lens, ded = _dedup_keys_keep_last(entries, pres, e.dtype.key_type)
        return _list_cv(lens, arr.validity, ded, e.dtype)

    if f == "array_sort":
        # default comparator: ascending, null elements last (before padding)
        key = _orderable_key(elem)
        cls = jnp.where(~pres, 2, jnp.where(~elem.validity, 1, 0)).astype(jnp.int32)
        order = jnp.argsort(key, axis=1, stable=True)
        cls_s = jnp.take_along_axis(cls, order, axis=1)
        order = jnp.take_along_axis(order, jnp.argsort(cls_s, axis=1, stable=True), axis=1)

        def g(a):
            if a is None:
                return None
            idx = order.reshape(order.shape + (1,) * (a.ndim - 2))
            return jnp.take_along_axis(a, jnp.broadcast_to(idx, order.shape + a.shape[2:]), axis=1)

        return _list_cv(arr.data, arr.validity, _map_elem(elem, g), e.dtype)

    if f == "aggregate":
        # fold over the static element axis: acc starts at init, each step
        # applies the merge lambda where slot i is present
        acc = ev(e.args[1], b, ctx)
        acc_name, x_name = e.params[0], e.params[1]
        for i in range(ne):
            xi = _map_elem(elem, lambda a, _i=i: None if a is None else a[:, _i])
            env = {acc_name: acc, x_name: xi}
            stepped = ev(e.body, b, _body_ctx(ctx, env))
            take = pres[:, i]
            acc = ColumnVector(
                jnp.where(take, stepped.data, acc.data)
                if stepped.data.ndim == acc.data.ndim else stepped.data,
                jnp.where(take, stepped.validity, acc.validity),
                acc.lengths, acc.dtype, acc.children)
        return acc.with_validity(acc.validity & arr.validity)

    if f == "zip_with":
        arr2 = ev(e.args[1], b, ctx)
        pres2 = _present(arr2)
        elem2 = arr2.children[0]
        ne2 = elem2.validity.shape[1]
        w = max(ne, ne2)

        def widen(el, n):
            if n == w:
                return el
            return _map_elem(el, lambda a: None if a is None else jnp.pad(
                a, [(0, 0), (0, w - n)] + [(0, 0)] * (a.ndim - 2)))

        elem = widen(elem, ne)
        elem2 = widen(elem2, ne2)
        presw = jnp.pad(pres, ((0, 0), (0, w - ne)))
        pres2w = jnp.pad(pres2, ((0, 0), (0, w - ne2)))
        xb = _expand_batch(b, w)
        env = {
            e.params[0]: _flatten_elem(elem, presw),
            e.params[1]: _flatten_elem(elem2, pres2w),
        }
        body = ev(e.body, xb, _body_ctx(ctx, env))
        out_elem = _unflatten(body, cap, w)
        lens = jnp.maximum(jnp.where(arr.validity, arr.data, 0),
                           jnp.where(arr2.validity, arr2.data, 0)).astype(jnp.int32)
        return _list_cv(lens, arr.validity & arr2.validity, out_elem, e.dtype)

    # transform / filter / exists / forall share the flattened-body shape
    xb = _expand_batch(b, ne)
    env = {e.params[0]: _flatten_elem(elem, pres)}
    if len(e.params) > 1:  # (x, index) form
        idx = jnp.broadcast_to(jnp.arange(ne, dtype=jnp.int32)[None, :],
                               (cap, ne)).reshape(-1)
        env[e.params[1]] = ColumnVector(idx, jnp.ones(cap * ne, bool), None, T.INT32)
    body = ev(e.body, xb, _body_ctx(ctx, env))

    if f == "transform":
        return _list_cv(arr.data, arr.validity, _unflatten(body, cap, ne), e.dtype)
    if f == "filter":
        keep = (body.data.astype(bool) & body.validity).reshape(cap, ne) & pres
        lens, out_elem = _compact(keep, elem)
        return _list_cv(lens, arr.validity, out_elem, e.dtype)
    # exists / forall with Spark three-valued logic: a null lambda result
    # neither satisfies nor refutes
    val = body.data.astype(bool).reshape(cap, ne)
    ok = body.validity.reshape(cap, ne)
    if f == "exists":
        any_true = jnp.any(val & ok & pres, axis=1)
        any_null = jnp.any(~ok & pres, axis=1)
        return ColumnVector(any_true, arr.validity & (any_true | ~any_null),
                            None, T.BOOL)
    if f == "forall":
        any_false = jnp.any(~val & ok & pres, axis=1)
        any_null = jnp.any(~ok & pres, axis=1)
        return ColumnVector(~any_false,
                            arr.validity & (any_false | ~any_null), None, T.BOOL)
    raise NotImplementedError(f"higher-order func {f}")
