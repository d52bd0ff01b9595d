"""Columnar batch ABI: Arrow-style struct-of-arrays batches resident in HBM.

This is the engine's data plane — the TPU-native analog of the reference's
Arrow ``RecordBatch`` exchanged over the C Data Interface (reference:
native/core/src/execution/operators/scan.rs:46, jni_api.rs:669
``prepare_output``). Design rules that make it XLA-friendly:

- Every batch has a **static capacity** (power-of-two row count); the number
  of live rows is carried as a traced boolean ``row_mask`` (+ derived count).
  Filters flip mask bits instead of producing dynamic shapes; compaction is
  an explicit operator used only where physically profitable.
- Nullability is a per-column boolean ``validity`` vector (True = non-null),
  the dense-mask analog of Arrow validity bitmaps.
- Strings/binary are fixed-width padded ``uint8`` matrices ``(cap, max_len)``
  plus an int32 ``lengths`` vector. This is the "var-length data in a
  fixed-shape world" decision from SURVEY.md §7: all string compute
  (compare/LIKE/substring/hash) vectorizes over the byte matrix on the VPU.

Batches are registered pytrees, so whole operator pipelines (scan → filter →
project → partial-agg) jit/fuse into a single XLA computation, and pjit can
shard them over a device mesh (leading row axis = data-parallel axis).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from datafusion_comet_tpu import types as T

__all__ = [
    "ColumnVector",
    "Batch",
    "pad_capacity",
    "from_numpy",
    "to_numpy",
    "nested_from_py",
    "nested_to_py",
]


def quantize_bound(mx: int) -> int:
    """Round a magnitude bound up to all-nines (10^k - 1): ≤38 distinct
    values keeps jit cache keys stable across batches."""
    b = 9
    while b < mx:
        b = b * 10 + 9
    return b


def pad_capacity(n: int, minimum: int = 8) -> int:
    """Round row count up to the next power of two (stable jit cache keys)."""
    cap = max(minimum, 1)
    while cap < n:
        cap *= 2
    return cap


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "validity", "lengths", "children"],
    meta_fields=["dtype", "dictionary", "mag_bound"],
)
@dataclasses.dataclass
class ColumnVector:
    """One column: data buffer + validity mask (+ lengths for var-len types).

    data:     (cap,) for fixed-width types; (cap, max_len) uint8 for STRING/BYTES;
              (cap,) int32 per-row element counts for LIST/MAP; (cap,) int8
              placeholder for STRUCT; (cap,) int32 dictionary codes when
              ``dictionary`` is set.
    validity: (cap,) bool, True = non-null.
    lengths:  (cap,) int32 for STRING/BYTES else None (None for dict codes).
    children: nested children (static-shape analog of Arrow child arrays):
              LIST/MAP → one element CV whose buffers carry an extra
              ``max_elems`` axis after the row axis (data (cap, E, ...),
              validity (cap, E)); STRUCT → one CV per field, row-shaped.
    dictionary: optional StringDict (host-side constant, a pytree META
              field); when set, ``data`` holds int32 codes that are
              order-isomorphic to the string order (sorted dictionary).
              The analog of Arrow dictionary arrays kept end-to-end
              (reference unpacks them at scan.rs:100; we don't — codes ride
              sorts/joins/shuffles at 4 bytes/row).
    """

    data: jax.Array
    validity: jax.Array
    lengths: Optional[jax.Array]
    dtype: T.DataType
    children: Tuple["ColumnVector", ...] = ()
    dictionary: Optional["StringDict"] = None  # noqa: F821
    # For DECIMAL(p>18) columns: a sound host-side upper bound on
    # max |unscaled value|, quantized to all-nines (10^k - 1) so trace cache
    # keys stay stable. When the bound fits int64, the column keeps NARROW
    # 1-D int64 storage (fast path: sorts/joins/aggs ride one limb); wide
    # (cap, 2) [hi, lo] i128 limb storage is used only when values may
    # exceed int64 (reference stores Arrow Decimal128 unconditionally —
    # spark-expr agg_funcs wide decimal; we narrow when provably safe).
    mag_bound: Optional[int] = None

    @property
    def capacity(self) -> int:
        return self.data.shape[0]

    @property
    def is_wide_storage(self) -> bool:
        """True when this decimal column is physically two-limb (cap, 2)."""
        return self.dtype.is_decimal and self.data.ndim == 2

    @property
    def is_dict(self) -> bool:
        return self.dictionary is not None

    def with_validity(self, validity: jax.Array) -> "ColumnVector":
        return ColumnVector(self.data, validity, self.lengths, self.dtype,
                            self.children, self.dictionary, self.mag_bound)

    def decode(self) -> "ColumnVector":
        """Materialize a dictionary column into padded (mat, lens) form.
        No-op for non-dict columns. One small-table gather — consumers that
        need raw bytes call this; everything else stays on codes."""
        if self.dictionary is None:
            return self
        mat, lens = self.dictionary.decode_arrays(
            self.data, target_width=self.dtype.byte_width
        )
        return ColumnVector(mat, self.validity, lens, self.dtype)

    def unify_encoding(self, *others: "ColumnVector"):
        """For ops that merge rows from several columns (union, expand
        branches, join tails): keep dictionary codes only when every column
        shares the SAME dictionary; otherwise decode the dict-encoded ones."""
        cvs = (self,) + others
        dicts = {cv.dictionary for cv in cvs if cv.dictionary is not None}
        if len(dicts) == 1 and all(cv.is_dict for cv in cvs):
            return list(cvs)
        return [cv.decode() for cv in cvs]

    def take(self, indices: jax.Array, fill_invalid: bool = False) -> "ColumnVector":
        """Gather rows by index. Indices must be in-range; callers mask
        out-of-range gathers by clipping and passing fill_invalid."""
        data = jnp.take(self.data, indices, axis=0)
        validity = jnp.take(self.validity, indices, axis=0)
        lengths = None if self.lengths is None else jnp.take(self.lengths, indices, axis=0)
        children = tuple(c.take(indices) for c in self.children)
        return ColumnVector(data, validity, lengths, self.dtype, children, self.dictionary)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["columns", "row_mask"],
    meta_fields=["schema"],
)
@dataclasses.dataclass
class Batch:
    """A struct-of-arrays batch: tuple of columns + live-row mask."""

    columns: Tuple[ColumnVector, ...]
    row_mask: jax.Array  # (cap,) bool
    schema: T.Schema

    @property
    def capacity(self) -> int:
        return self.row_mask.shape[0]

    def num_rows(self) -> jax.Array:
        return jnp.sum(self.row_mask.astype(jnp.int32))

    def column(self, name: str) -> ColumnVector:
        return self.columns[self.schema.index_of(name)]

    def with_mask(self, mask: jax.Array) -> "Batch":
        return Batch(self.columns, mask, self.schema)

    def select(self, indices: Sequence[int], schema: T.Schema) -> "Batch":
        return Batch(tuple(self.columns[i] for i in indices), self.row_mask, schema)

    def take(self, indices: jax.Array, mask: jax.Array, schema: Optional[T.Schema] = None) -> "Batch":
        cols = tuple(c.take(indices) for c in self.columns)
        return Batch(cols, mask, schema or self.schema)

    def decode_dicts(self) -> "Batch":
        """Materialize all dictionary-encoded columns to padded byte form
        (for host edges whose layout assumes (cap, w)+lengths buffers)."""
        if not any(c.is_dict for c in self.columns):
            return self
        return Batch(tuple(c.decode() for c in self.columns), self.row_mask, self.schema)


# -------------------------------------------------------------------------------------
# Host <-> device conversion
# -------------------------------------------------------------------------------------


def _reshape_cv(cv: ColumnVector, lead: Tuple[int, ...]) -> ColumnVector:
    """Recursively reshape a CV's row axis (cap*E, ...) -> (cap, E, ...)."""

    def rs(a):
        return None if a is None else jnp.reshape(a, lead + a.shape[1:])

    return ColumnVector(
        rs(cv.data), rs(cv.validity), rs(cv.lengths), cv.dtype,
        tuple(_reshape_cv(c, lead) for c in cv.children),
    )


def nested_from_py(values, dtype: T.DataType, cap: int) -> ColumnVector:
    """Build a (possibly nested) ColumnVector from a length-n Python sequence,
    padded to ``cap`` rows. Accepts None (null), lists (LIST), dicts (MAP or
    STRUCT by name), tuples (STRUCT by position), and scalars."""
    n = len(values)
    valid = np.zeros(cap, bool)
    valid[:n] = [v is not None for v in values]
    if dtype.is_list or dtype.is_map:
        E = dtype.max_elems
        lens = np.zeros(cap, np.int32)
        flat = []
        for i, v in enumerate(values):
            if dtype.is_map and isinstance(v, dict):
                v = sorted(v.items())  # map normalization: entries sorted by key
            items = list(v) if v is not None else []
            if len(items) > E:
                raise ValueError(f"list of {len(items)} items exceeds max_elems={E}")
            lens[i] = len(items)
            flat.extend(items + [None] * (E - len(items)))
        flat.extend([None] * ((cap - n) * E))
        elem = nested_from_py(flat, dtype.element, cap * E)
        elem = _reshape_cv(elem, (cap, E))
        return ColumnVector(jnp.asarray(lens), jnp.asarray(valid), None, dtype, (elem,))
    if dtype.is_struct:
        kids = []
        for j, f in enumerate(dtype.struct_fields):
            fv = [
                (None if v is None else (v.get(f.name) if isinstance(v, dict) else v[j]))
                for v in values
            ]
            kids.append(nested_from_py(fv, f.dtype, cap))
        return ColumnVector(
            jnp.zeros(cap, jnp.int8), jnp.asarray(valid), None, dtype, tuple(kids)
        )
    if dtype.is_binary:
        max_len = dtype.byte_width
        mat, lens = _pad_strings_np(np.array(values, dtype=object), max_len)
        mat_pad = np.zeros((cap, max_len), np.uint8)
        mat_pad[:n] = mat
        lens_pad = np.zeros(cap, np.int32)
        lens_pad[:n] = lens
        return ColumnVector(jnp.asarray(mat_pad), jnp.asarray(valid), jnp.asarray(lens_pad), dtype)
    phys = dtype.np_dtype()
    buf = np.zeros(cap, phys)
    scale = 10 ** dtype.scale if dtype.is_decimal else 1
    for i, v in enumerate(values):
        if v is not None:
            buf[i] = round(v * scale) if dtype.is_decimal and isinstance(v, float) else v
    return ColumnVector(jnp.asarray(buf), jnp.asarray(valid), None, dtype)


def nested_to_py(cv: ColumnVector, idx=None):
    """Pull a (possibly nested) CV back to host Python values (row-major list).
    ``idx``: optional row indices (numpy) selecting live rows."""
    valid = np.asarray(cv.validity)
    data = np.asarray(cv.data)
    if idx is None:
        idx = np.arange(valid.shape[0])
    dt = cv.dtype
    if dt.is_list or dt.is_map:
        elem = cv.children[0]
        out = []
        for i in idx:
            if not valid[i]:
                out.append(None)
                continue
            row_elem = ColumnVector(
                elem.data[i], elem.validity[i],
                None if elem.lengths is None else elem.lengths[i],
                dt.element, tuple(_index_child(c, i) for c in elem.children),
            )
            items = nested_to_py(row_elem, np.arange(int(data[i])))
            if dt.is_map:
                out.append({it["key"]: it["value"] for it in items})
            else:
                out.append(items)
        return out
    if dt.is_struct:
        kids = [nested_to_py(c, idx) for c in cv.children]
        names = [f.name for f in dt.struct_fields]
        return [
            ({n: k[j] for n, k in zip(names, kids)} if valid[i] else None)
            for j, i in enumerate(idx)
        ]
    if dt.is_binary:
        raw = dt.type_id == "BYTES"
        if cv.is_dict:  # host-side decode: dict values live in host numpy
            d = cv.dictionary
            codes = np.clip(data, 0, max(d.size - 1, 0))
            return [
                (
                    (d.value_of(int(codes[i])) if raw
                     else d.value_of(int(codes[i])).decode("utf-8", "replace"))
                    if valid[i] and d.size
                    else None
                )
                for i in idx
            ]
        lens = np.asarray(cv.lengths)
        return [
            (
                bytes(data[i, : lens[i]])
                if raw
                else bytes(data[i, : lens[i]]).decode("utf-8", "replace")
            )
            if valid[i]
            else None
            for i in idx
        ]
    if dt.is_decimal and dt.scale:
        return [int(data[i]) / 10**dt.scale if valid[i] else None for i in idx]
    return [data[i].item() if valid[i] else None for i in idx]


def _index_child(cv: ColumnVector, i) -> ColumnVector:
    return ColumnVector(
        cv.data[i], cv.validity[i],
        None if cv.lengths is None else cv.lengths[i],
        cv.dtype, tuple(_index_child(c, i) for c in cv.children),
    )


def _pad_strings_np(values: np.ndarray, max_len: int) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized ragged->padded conversion for an object/str numpy array."""
    n = len(values)
    if n == 0:
        return np.zeros((0, max_len), np.uint8), np.zeros((0,), np.int32)
    encoded = [
        (v.encode("utf-8") if isinstance(v, str) else (bytes(v) if v is not None else b""))
        for v in values
    ]
    lens = np.fromiter((len(e) for e in encoded), dtype=np.int32, count=n)
    if lens.max(initial=0) > max_len:
        raise ValueError(f"string longer than max_len={max_len}")
    flat = np.frombuffer(b"".join(encoded), dtype=np.uint8)
    offsets = np.zeros(n, np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    pos = np.arange(max_len, dtype=np.int64)
    idx = np.minimum(offsets[:, None] + pos[None, :], max(len(flat) - 1, 0))
    mat = np.zeros((n, max_len), np.uint8)
    if len(flat):
        mat = np.where(pos[None, :] < lens[:, None], flat[idx], 0).astype(np.uint8)
    return mat, lens


def from_numpy(
    data: Dict[str, np.ndarray],
    schema: T.Schema,
    capacity: Optional[int] = None,
    validity: Optional[Dict[str, np.ndarray]] = None,
    dictionary: Optional[bool] = None,
    dict_max_size: Optional[int] = None,
) -> Batch:
    """Build a device Batch from host numpy columns, padding to capacity.

    Decimal columns are expected pre-scaled as int64. Strings may be object
    arrays of str/bytes/None. String columns whose cardinality is at most
    ``dict_max_size`` are dictionary-encoded (sorted dict + int32 codes)
    unless ``dictionary=False`` / $COMET_TPU_NO_DICT disables it.
    """
    import os

    if dictionary is None:
        from datafusion_comet_tpu.exec.dictionary import DICT_DISABLE_ENV

        dictionary = DICT_DISABLE_ENV not in os.environ
    if dict_max_size is None:
        from datafusion_comet_tpu.conf import CONF, SCAN_DICT_MAX_SIZE

        dict_max_size = CONF.get(SCAN_DICT_MAX_SIZE)
    names = schema.names
    first = data[names[0]] if names else ()
    n = len(first[0]) if isinstance(first, tuple) else (len(first) if names else 0)
    cap = capacity or pad_capacity(n)
    validity = validity or {}
    cols = []
    for f in schema.fields:
        raw = data[f.name]
        if f.dtype.is_nested:
            cols.append(nested_from_py(list(raw), f.dtype, cap))
            continue
        if isinstance(raw, tuple):  # pre-padded (matrix, lengths)
            v = raw[0]
        else:
            v = np.asarray(raw) if not isinstance(raw, np.ndarray) else raw
        valid_np = validity.get(f.name)
        if valid_np is None:
            if not isinstance(raw, tuple) and v.dtype == object:
                valid_np = np.array([x is not None for x in v], dtype=bool)
            else:
                valid_np = np.ones(n, dtype=bool)
        valid_pad = np.zeros(cap, bool)
        valid_pad[:n] = valid_np
        if f.dtype.is_binary:
            max_len = f.dtype.byte_width
            if isinstance(data[f.name], tuple):
                # pre-padded (matrix, lengths) from the native staging path
                mat, lens = data[f.name]
                if mat.shape[1] != max_len:
                    m2 = np.zeros((len(mat), max_len), np.uint8)
                    w = min(max_len, mat.shape[1])
                    m2[:, :w] = mat[:, :w]
                    mat, lens = m2, np.minimum(lens, max_len)
            else:
                mat, lens = _pad_strings_np(v, max_len)
            enc = None
            if dictionary:
                from datafusion_comet_tpu.exec.dictionary import encode_padded

                enc = encode_padded(np.asarray(mat), np.asarray(lens), dict_max_size)
            if enc is not None:
                codes, sdict = enc
                codes_pad = np.zeros(cap, np.int32)
                codes_pad[:n] = codes
                cols.append(
                    ColumnVector(
                        jnp.asarray(codes_pad), jnp.asarray(valid_pad), None,
                        f.dtype, (), sdict,
                    )
                )
                continue
            mat_pad = np.zeros((cap, max_len), np.uint8)
            mat_pad[:n] = mat
            lens_pad = np.zeros(cap, np.int32)
            lens_pad[:n] = lens
            cols.append(
                ColumnVector(jnp.asarray(mat_pad), jnp.asarray(valid_pad), jnp.asarray(lens_pad), f.dtype)
            )
        elif f.dtype.is_wide_decimal:
            ints = [0 if v[i] is None else int(v[i]) for i in range(n)]
            mx = max((abs(x) for x in ints), default=0)
            if mx < (1 << 62):
                # values fit int64: keep narrow 1-D storage, record the bound
                buf = np.zeros(cap, np.int64)
                buf[:n] = ints
                cols.append(
                    ColumnVector(jnp.asarray(buf), jnp.asarray(valid_pad), None, f.dtype,
                                 mag_bound=quantize_bound(mx))
                )
            else:
                # two-limb i128: (cap, 2) int64 [hi, lo] two's complement
                buf = np.zeros((cap, 2), np.int64)
                m64 = (1 << 64) - 1
                for i, x in enumerate(ints):
                    u = x & ((1 << 128) - 1)
                    buf[i, 0] = np.uint64((u >> 64) & m64).astype(np.int64)
                    buf[i, 1] = np.uint64(u & m64).astype(np.int64)
                cols.append(ColumnVector(jnp.asarray(buf), jnp.asarray(valid_pad), None, f.dtype))
        else:
            phys = f.dtype.np_dtype()
            buf = np.zeros(cap, phys)
            if v.dtype == object:
                vv = np.array([x if x is not None else 0 for x in v])
                buf[:n] = vv.astype(phys)
            else:
                buf[:n] = v.astype(phys)
            bound = None
            if f.dtype.is_decimal:
                # record the actual magnitude so downstream arithmetic can
                # keep provably-int64 intermediates on the narrow fast path
                mx = int(np.abs(buf[:n]).max()) if n else 0
                bound = quantize_bound(mx)
            cols.append(ColumnVector(jnp.asarray(buf), jnp.asarray(valid_pad), None, f.dtype,
                                     mag_bound=bound))
    mask = np.zeros(cap, bool)
    mask[:n] = True
    return Batch(tuple(cols), jnp.asarray(mask), schema)


def to_numpy(batch: Batch) -> Dict[str, np.ndarray]:
    """Pull a batch back to host as compacted numpy columns (None for nulls
    in object output for strings; NaN-preserving for floats; masked ints keep
    their raw value with a parallel ``<name>__valid`` array)."""
    mask = np.asarray(batch.row_mask)
    out: Dict[str, np.ndarray] = {}
    for f, col in zip(batch.schema.fields, batch.columns):
        valid = np.asarray(col.validity)[mask]
        if f.dtype.is_nested:
            idx = np.nonzero(mask)[0]
            vals = np.empty(len(idx), dtype=object)
            for j, v in enumerate(nested_to_py(col, idx)):
                vals[j] = v
            out[f.name] = vals
            out[f.name + "__valid"] = valid
            continue
        if f.dtype.is_binary:
            raw = f.dtype.type_id == "BYTES"
            if col.is_dict:
                codes = np.asarray(col.data)[mask]
                d = col.dictionary
                dvals = np.empty(max(d.size, 1), dtype=object)
                dvals[0] = b"" if raw else ""
                for c in range(d.size):
                    bs = d.value_of(c)
                    dvals[c] = bs if raw else bs.decode("utf-8", "replace")
                vals = dvals[np.clip(codes, 0, max(d.size - 1, 0))]
                vals[~valid] = None
                out[f.name] = vals
                out[f.name + "__valid"] = valid
                continue
            mat = np.asarray(col.data)[mask]
            lens = np.asarray(col.lengths)[mask]
            vals = np.empty(len(mat), dtype=object)
            for i in range(len(mat)):
                if not valid[i]:
                    vals[i] = None
                else:
                    bs = bytes(mat[i, : lens[i]])
                    vals[i] = bs if raw else bs.decode("utf-8", "replace")
            out[f.name] = vals
        elif f.dtype.is_wide_decimal:
            if col.data.ndim == 2:
                limbs = np.asarray(col.data)[mask]
                vals = np.empty(len(limbs), dtype=object)
                m64 = (1 << 64) - 1
                for i in range(len(limbs)):
                    u = ((int(limbs[i, 0]) & m64) << 64) | (int(limbs[i, 1]) & m64)
                    vals[i] = u - (1 << 128) if u >= (1 << 127) else u
                out[f.name] = vals
            else:  # narrow storage: surface as Python ints for uniformity
                nv = np.asarray(col.data)[mask]
                vals = np.empty(len(nv), dtype=object)
                for i in range(len(nv)):
                    vals[i] = int(nv[i])
                out[f.name] = vals
        else:
            out[f.name] = np.asarray(col.data)[mask]
        out[f.name + "__valid"] = valid
    return out
