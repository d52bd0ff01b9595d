"""Loader for the native host library (native/staging.cpp, C ABI via ctypes).

Builds libcomet_host.so on first use with g++ (cached next to the source);
every entry point has a numpy fallback so the engine works without a
toolchain (the reference's COMET_NATIVE_LOAD_REQUIRED=false behavior,
CometSparkSessionExtensions.scala:155)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

__all__ = ["lib", "pad_utf8_arrow", "radix_sort_u64", "crc32", "zlib_compress", "zlib_decompress", "batch_to_unsafe_rows"]

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "staging.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libcomet_host.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-fopenmp",
            os.path.abspath(_SRC), "-o", os.path.abspath(_SO), "-lz",
        ]
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        if r.returncode != 0:
            # retry without OpenMP (not all toolchains ship libgomp)
            cmd.remove("-fopenmp")
            r = subprocess.run(cmd, capture_output=True, timeout=120)
        return r.returncode == 0
    except Exception:
        return False


def lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src_m = os.path.getmtime(_SRC) if os.path.exists(_SRC) else 0
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < src_m:
            if not _build():
                return None
        try:
            L = ctypes.CDLL(os.path.abspath(_SO))
        except OSError:
            return None
        c = ctypes
        L.pad_utf8.restype = c.c_int64
        L.pad_utf8.argtypes = [c.c_void_p, c.c_void_p, c.c_int64, c.c_int64, c.c_void_p, c.c_void_p]
        L.pad_utf8_32.restype = c.c_int64
        L.pad_utf8_32.argtypes = L.pad_utf8.argtypes
        L.radix_sort_u64.restype = None
        L.radix_sort_u64.argtypes = [c.c_void_p, c.c_int64, c.c_void_p]
        L.crc32_buf.restype = c.c_uint32
        L.crc32_buf.argtypes = [c.c_void_p, c.c_int64]
        L.zlib_compress_bound.restype = c.c_int64
        L.zlib_compress_bound.argtypes = [c.c_int64]
        L.zlib_compress_buf.restype = c.c_int64
        L.zlib_compress_buf.argtypes = [c.c_void_p, c.c_int64, c.c_void_p, c.c_int64, c.c_int]
        L.zlib_decompress_buf.restype = c.c_int64
        L.zlib_decompress_buf.argtypes = [c.c_void_p, c.c_int64, c.c_void_p, c.c_int64]
        _lib = L
        return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def pad_utf8_arrow(offsets: np.ndarray, data: np.ndarray, max_len: int) -> Tuple[np.ndarray, np.ndarray]:
    """Arrow (offsets, data buffer) → (padded matrix, lengths). Native when
    available; numpy fallback otherwise."""
    n = len(offsets) - 1
    L = lib()
    out = np.zeros((n, max_len), np.uint8)
    lens = np.zeros(n, np.int32)
    if n == 0:
        return out, lens
    if L is not None:
        offsets = np.ascontiguousarray(offsets)
        data = np.ascontiguousarray(data)
        if offsets.dtype == np.int64:
            L.pad_utf8(_ptr(offsets), _ptr(data), n, max_len, _ptr(out), _ptr(lens))
        else:
            offsets = offsets.astype(np.int32)
            L.pad_utf8_32(_ptr(offsets), _ptr(data), n, max_len, _ptr(out), _ptr(lens))
        return out, lens
    # numpy fallback (vectorized gather)
    offs = offsets.astype(np.int64)
    raw_lens = np.minimum(offs[1:] - offs[:-1], max_len)
    pos = np.arange(max_len, dtype=np.int64)
    idx = np.minimum(offs[:-1, None] + pos[None, :], max(len(data) - 1, 0))
    take = data[idx] if len(data) else np.zeros((n, max_len), np.uint8)
    out = np.where(pos[None, :] < raw_lens[:, None], take, 0).astype(np.uint8)
    return out, raw_lens.astype(np.int32)


def radix_sort_u64(keys: np.ndarray) -> np.ndarray:
    L = lib()
    n = len(keys)
    perm = np.zeros(n, np.int32)
    if L is not None and n:
        keys = np.ascontiguousarray(keys.view(np.uint64) if keys.dtype != np.uint64 else keys)
        L.radix_sort_u64(_ptr(keys), n, _ptr(perm))
        return perm
    return np.argsort(keys, kind="stable").astype(np.int32)


def crc32(buf: bytes) -> int:
    L = lib()
    if L is not None:
        arr = np.frombuffer(buf, np.uint8)
        return int(L.crc32_buf(_ptr(arr), len(arr)))
    import zlib

    return zlib.crc32(buf) & 0xFFFFFFFF


def zlib_compress(buf: bytes, level: int = 1) -> bytes:
    L = lib()
    if L is not None:
        src = np.frombuffer(buf, np.uint8)
        cap = int(L.zlib_compress_bound(len(src)))
        dst = np.zeros(cap, np.uint8)
        n = int(L.zlib_compress_buf(_ptr(src), len(src), _ptr(dst), cap, level))
        if n > 0:
            return dst[:n].tobytes()
    import zlib as z

    return z.compress(buf, level)


def zlib_decompress(buf: bytes, out_len: int) -> bytes:
    L = lib()
    if L is not None:
        src = np.frombuffer(buf, np.uint8)
        dst = np.zeros(out_len, np.uint8)
        n = int(L.zlib_decompress_buf(_ptr(src), len(src), _ptr(dst), out_len))
        if n >= 0:
            return dst[:n].tobytes()
    import zlib as z

    return z.decompress(buf)


# -------------------------------------------------------------------------------------
# zstd / lz4 / snappy block codecs (reference: native/shuffle/src/ipc.rs:24-46 —
# the 4-byte magic SNAP/LZ4_/ZSTD/NONE spill/shuffle codecs; zstd is the
# reference's benchmarked default). zstd rides the bundled `zstandard` module
# (libzstd binding); lz4/snappy bind the system shared libraries directly via
# ctypes — none of the three is toolchain-guaranteed, so each degrades to
# "unavailable" and the spill writer falls back to zlib.
# -------------------------------------------------------------------------------------

_SYS_LIBS: dict = {}


def _sys_lib(name: str):
    if name not in _SYS_LIBS:
        try:
            _SYS_LIBS[name] = ctypes.CDLL(name)
        except OSError:
            _SYS_LIBS[name] = None
    return _SYS_LIBS[name]


def zstd_available() -> bool:
    try:
        import zstandard  # noqa: F401

        return True
    except ImportError:
        return False


def zstd_compress(buf: bytes, level: int = 1) -> bytes:
    import zstandard

    return zstandard.ZstdCompressor(level=level).compress(buf)


def zstd_decompress(buf: bytes, out_len: int) -> bytes:
    import zstandard

    return zstandard.ZstdDecompressor().decompress(buf, max_output_size=out_len)


def lz4_available() -> bool:
    return _sys_lib("liblz4.so.1") is not None


def lz4_compress(buf: bytes) -> bytes:
    L = _sys_lib("liblz4.so.1")
    src = np.frombuffer(buf, np.uint8)
    L.LZ4_compressBound.restype = ctypes.c_int
    cap = int(L.LZ4_compressBound(len(src)))
    dst = np.zeros(max(cap, 1), np.uint8)
    n = int(L.LZ4_compress_default(_ptr(src), _ptr(dst), len(src), cap))
    if n <= 0:
        raise IOError("LZ4_compress_default failed")
    return dst[:n].tobytes()


def lz4_decompress(buf: bytes, out_len: int) -> bytes:
    L = _sys_lib("liblz4.so.1")
    src = np.frombuffer(buf, np.uint8)
    dst = np.zeros(max(out_len, 1), np.uint8)
    n = int(L.LZ4_decompress_safe(_ptr(src), _ptr(dst), len(src), out_len))
    if n < 0:
        raise IOError("LZ4_decompress_safe failed")
    return dst[:n].tobytes()


def snappy_available() -> bool:
    L = _sys_lib("libsnappy.so.1")
    return L is not None and hasattr(L, "snappy_compress")


def snappy_compress(buf: bytes) -> bytes:
    L = _sys_lib("libsnappy.so.1")
    src = np.frombuffer(buf, np.uint8)
    L.snappy_max_compressed_length.restype = ctypes.c_size_t
    L.snappy_max_compressed_length.argtypes = [ctypes.c_size_t]
    cap = int(L.snappy_max_compressed_length(len(src)))
    dst = np.zeros(max(cap, 1), np.uint8)
    out_len = ctypes.c_size_t(cap)
    rc = L.snappy_compress(_ptr(src), ctypes.c_size_t(len(src)), _ptr(dst),
                           ctypes.byref(out_len))
    if rc != 0:
        raise IOError(f"snappy_compress rc={rc}")
    return dst[: out_len.value].tobytes()


def snappy_decompress(buf: bytes, out_len: int) -> bytes:
    L = _sys_lib("libsnappy.so.1")
    src = np.frombuffer(buf, np.uint8)
    dst = np.zeros(max(out_len, 1), np.uint8)
    got = ctypes.c_size_t(out_len)
    rc = L.snappy_uncompress(_ptr(src), ctypes.c_size_t(len(src)), _ptr(dst),
                             ctypes.byref(got))
    if rc != 0:
        raise IOError(f"snappy_uncompress rc={rc}")
    return dst[: got.value].tobytes()


# -------------------------------------------------------------------------------------
# Columnar → Spark UnsafeRow (reference: columnar_to_row.rs:869,
# Native.scala:232 columnarToRowInit/Convert/Close)
# -------------------------------------------------------------------------------------


def _register_unsafe_rows(L) -> None:
    c = ctypes
    if hasattr(L, "_unsafe_registered"):
        return
    L.unsafe_rows_offsets.restype = c.c_int64
    L.unsafe_rows_offsets.argtypes = [
        c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p, c.c_int32, c.c_int64, c.c_void_p,
    ]
    L.unsafe_rows_fill.restype = None
    L.unsafe_rows_fill.argtypes = [
        c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p,
        c.c_int32, c.c_int64, c.c_void_p, c.c_void_p,
    ]
    L._unsafe_registered = True


def _ru8(x):
    """Round up to 8 (scalar or array)."""
    return (x + 7) & ~7 if np.isscalar(x) or isinstance(x, int) else (x + 7) & ~np.int64(7)


def _le_bytes(arr: np.ndarray) -> np.ndarray:
    """(n,) numeric -> (n, itemsize) little-endian uint8."""
    a = np.ascontiguousarray(arr.astype(arr.dtype.newbyteorder("<")))
    return a.view(np.uint8).reshape(arr.shape[0], arr.dtype.itemsize)


def _pack_nullbits(invalid: np.ndarray, words: int) -> np.ndarray:
    """(n, E) bool -> (n, words*8) uint8 little-endian bitset (Spark word layout)."""
    n, e = invalid.shape
    padded = np.zeros((n, words * 64), bool)
    padded[:, :e] = invalid
    return np.packbits(padded, axis=1, bitorder="little")


def _render_flat_values(data: np.ndarray, valid: np.ndarray, counts: np.ndarray,
                        dtype) -> Tuple[np.ndarray, int]:
    """Pack an UnsafeArrayData values region for primitive elements:
    (n, E) data + validity + per-row counts -> (n, E*w) bytes (nulls and
    beyond-count slots zeroed). Returns (bytes, element width)."""
    n, e = valid.shape
    vals = np.ascontiguousarray(data).copy()
    live = valid & (np.arange(e)[None, :] < counts[:, None])
    vals[~live] = 0
    w = vals.dtype.itemsize
    return _le_bytes(vals.reshape(n * e)).reshape(n, e * w), w


def _render_array_data(counts, valid_e, data_e, lens_e, elem_dtype):
    """Spark UnsafeArrayData bytes per row (reference: columnar_to_row.rs
    nested array writer / Spark UnsafeArrayWriter layout):
    [numElements i64][null bitset][values region][var payloads].
    Primitive elements pack at their width; var-len elements use 8-byte
    (offset|len) slots relative to the array base."""
    n, e = valid_e.shape
    words = (e + 63) // 64 if e else 0
    header = 8 + words * 8
    counts = counts.astype(np.int64)
    invalid = (~valid_e) & (np.arange(e)[None, :] < counts[:, None])
    nulls = _pack_nullbits(invalid, max(words, 1))[:, : words * 8]
    if elem_dtype.is_binary:
        # 8-byte slots + 8-aligned payloads after the slot region
        el = lens_e.astype(np.int64)
        live = valid_e & (np.arange(e)[None, :] < counts[:, None])
        pay = np.where(live, _ru8(el), 0)
        starts = (header + counts * 8)[:, None] + np.concatenate(
            [np.zeros((n, 1), np.int64), np.cumsum(pay, axis=1)[:, :-1]], axis=1)
        slot = np.where(live, (starts.astype(np.uint64) << np.uint64(32))
                        | el.astype(np.uint64), np.uint64(0))
        total = header + counts * 8 + pay.sum(axis=1)
        mat = np.zeros((n, int(total.max(initial=header))), np.uint8)
        mat[:, 0:8] = _le_bytes(counts)
        mat[:, 8:header] = nulls
        slot_bytes = _le_bytes(slot.reshape(n * e)).reshape(n, e * 8)
        cols = header + np.arange(e * 8)[None, :]
        keep = np.arange(e)[None, :].repeat(8, 1).reshape(1, -1) < counts[:, None]
        rr, cc = np.nonzero(keep)
        mat[rr, cols[0][cc]] = slot_bytes[rr, cc]
        w_pad = data_e.shape[-1]
        src = np.ascontiguousarray(data_e).reshape(n, e, w_pad)
        for j in range(e):  # few elements per row (static max_elems)
            lj = el[:, j]
            okj = live[:, j] & (lj > 0)
            if not okj.any():
                continue
            ri = np.nonzero(okj)[0]
            for r in ri:
                o = int(starts[r, j])
                mat[r, o:o + int(lj[r])] = src[r, j, : int(lj[r])]
        return mat, total.astype(np.int32)
    body, w = _render_flat_values(data_e, valid_e, counts, elem_dtype)
    total = header + _ru8(counts * w)
    mat = np.zeros((n, header + _ru8(e * w)), np.uint8)
    mat[:, 0:8] = _le_bytes(counts)
    if words:
        mat[:, 8:header] = nulls
    mat[:, header:header + e * w] = body
    return mat, total.astype(np.int32)


def _render_struct_rows(kids, valid_row, dtype):
    """Nested-struct UnsafeRow bytes per row: [null words][8-byte slots]
    [var payloads] with offsets relative to the struct base."""
    f = len(kids)
    n = valid_row.shape[0]
    words = (f + 63) // 64
    fixed = words * 8 + f * 8
    sizes = np.zeros((n, f), np.int64)
    for j, (cv, vj) in enumerate(kids):
        if cv[0].ndim == 2:  # var-len field (padded byte matrix, lengths)
            sizes[:, j] = np.where(vj, _ru8(cv[1].astype(np.int64)), 0)
    starts = fixed + np.concatenate(
        [np.zeros((n, 1), np.int64), np.cumsum(sizes, axis=1)[:, :-1]], axis=1)
    total = fixed + sizes.sum(axis=1)
    mat = np.zeros((n, int(total.max(initial=fixed))), np.uint8)
    invalid = np.stack([~vj for _, vj in kids], axis=1)
    mat[:, : words * 8] = _pack_nullbits(invalid, words)
    for j, ((data, lens), vj) in enumerate(kids):
        off = words * 8 + j * 8
        if data.ndim == 2:
            el = lens.astype(np.int64)
            slot = np.where(vj, (starts[:, j].astype(np.uint64) << np.uint64(32))
                            | el.astype(np.uint64), np.uint64(0))
            mat[:, off:off + 8] = _le_bytes(slot)
            for r in np.nonzero(vj & (el > 0))[0]:
                o = int(starts[r, j])
                mat[r, o:o + int(el[r])] = data[r, : int(el[r])]
        else:
            v = data.copy()
            v[~vj] = 0
            if v.dtype.kind == "i" and v.dtype.itemsize < 8:
                v = v.astype(np.int64)  # sign-extended slot
            elif v.dtype.itemsize < 8:
                v = v.astype(np.uint64)
            mat[:, off:off + 8] = _le_bytes(v.view(
                np.uint64 if v.dtype.kind == "f" and v.dtype.itemsize == 8 else v.dtype))
    return mat, total.astype(np.int32)


def _render_nested_column(cv, mask) -> Tuple[np.ndarray, np.ndarray]:
    """Render a LIST/STRUCT/MAP column's rows as Spark nested UnsafeRow
    payload bytes (reference: columnar_to_row.rs:949 handles nested arrays/
    structs/maps; Spark UnsafeArrayData/UnsafeMapData/UnsafeRow layouts).
    One nesting level with primitive/string leaves — deeper nesting raises."""
    dt = cv.dtype

    def leaf(child, extra_axis):
        d = np.asarray(child.data)[mask]
        v = np.asarray(child.validity)[mask]
        ln = None if child.lengths is None else np.asarray(child.lengths)[mask]
        if child.dtype.is_nested or child.children:
            raise NotImplementedError(
                "UnsafeRow: nesting deeper than one level is not serialized")
        return d, v, ln

    if dt.is_list:
        counts = np.asarray(cv.data)[mask]
        d, v, ln = leaf(cv.children[0], True)
        return _render_array_data(counts, v, d, ln, dt.element)
    if dt.is_map:
        counts = np.asarray(cv.data)[mask].astype(np.int64)
        entry = cv.children[0]
        kd, kv, kl = leaf(entry.children[0], True)
        vd, vv, vl = leaf(entry.children[1], True)
        kmat, klen = _render_array_data(counts, kv, kd, kl, dt.key_type)
        vmat, vlen = _render_array_data(counts, vv, vd, vl, dt.value_type)
        n = counts.shape[0]
        total = 8 + klen.astype(np.int64) + vlen.astype(np.int64)
        mat = np.zeros((n, int(total.max(initial=8))), np.uint8)
        mat[:, 0:8] = _le_bytes(klen.astype(np.int64))
        for r in range(n):
            k = int(klen[r])
            mat[r, 8:8 + k] = kmat[r, :k]
            mat[r, 8 + k:8 + k + int(vlen[r])] = vmat[r, : int(vlen[r])]
        return mat, total.astype(np.int32)
    if dt.is_struct:
        kids = []
        for child in cv.children:
            d, v, ln = leaf(child, False)
            kids.append(((d, ln), v))
        return _render_struct_rows(kids, np.asarray(cv.validity)[mask], dt)
    raise NotImplementedError(f"UnsafeRow: nested type {dt.type_id}")


def batch_to_unsafe_rows(batch) -> Tuple[np.ndarray, np.ndarray]:
    """Serialize a Batch's live rows into Spark UnsafeRow layout.
    Dictionary-encoded columns are decoded first (UnsafeRow stores raw
    UTF8 bytes inline).

    Returns (buffer uint8[total_bytes], offsets int64[n_rows+1]); row r's
    bytes are buffer[offsets[r]:offsets[r+1]]. Decimals travel as their
    scaled int64 (<=18 digits — Spark's compact decimal representation).
    Uses the native kernel when available, numpy fallback otherwise."""
    batch = batch.decode_dicts()
    mask = np.asarray(batch.row_mask)
    n = int(mask.sum())
    cols, widths, var_pad, var_lens, valids, sext = [], [], [], [], [], []
    for cv in batch.columns:
        v = np.ascontiguousarray(np.asarray(cv.validity)[mask].astype(np.uint8))
        valids.append(v)
        if cv.dtype.is_binary:
            data = np.ascontiguousarray(np.asarray(cv.data)[mask])
            lens = np.ascontiguousarray(np.asarray(cv.lengths)[mask].astype(np.int32))
            cols.append(data)
            widths.append(0)
            var_pad.append(data.shape[1] if data.ndim == 2 else 0)
            var_lens.append(lens)
            sext.append(0)
        elif cv.dtype.is_nested:
            # render the Spark nested layout (UnsafeArrayData / nested
            # UnsafeRow / UnsafeMapData) per row, then ride the var-len path
            data, lens = _render_nested_column(cv, mask)
            data = np.ascontiguousarray(data)
            cols.append(data)
            widths.append(0)
            var_pad.append(data.shape[1])
            var_lens.append(np.ascontiguousarray(lens.astype(np.int32)))
            sext.append(0)
        else:
            data = np.ascontiguousarray(np.asarray(cv.data)[mask])
            cols.append(data)
            widths.append(data.dtype.itemsize)
            var_pad.append(0)
            var_lens.append(np.zeros(0, np.int32))
            sext.append(1 if data.dtype.kind == "i" else 0)
    n_cols = len(cols)
    widths_np = np.asarray(widths, np.int32)
    var_pad_np = np.asarray(var_pad, np.int32)
    sext_np = np.asarray(sext, np.int32)
    offsets = np.zeros(n + 1, np.int64)
    L = lib()
    if L is not None:
        _register_unsafe_rows(L)
        c = ctypes
        arr_pp = (c.c_void_p * n_cols)(*[cv.ctypes.data for cv in cols])
        val_pp = (c.c_void_p * n_cols)(*[v.ctypes.data for v in valids])
        vl_pp = (c.c_void_p * n_cols)(*[vl.ctypes.data for vl in var_lens])
        total = int(L.unsafe_rows_offsets(
            widths_np.ctypes.data, var_pad_np.ctypes.data, vl_pp, val_pp,
            n_cols, n, offsets.ctypes.data,
        ))
        out = np.zeros(total, np.uint8)
        L.unsafe_rows_fill(
            arr_pp, widths_np.ctypes.data, var_pad_np.ctypes.data, vl_pp, val_pp,
            sext_np.ctypes.data, n_cols, n, offsets.ctypes.data, out.ctypes.data,
        )
        return out, offsets
    # numpy fallback (row loop — correctness path only)
    fixed = ((n_cols + 63) // 64) * 8 + n_cols * 8
    rows = []
    pos = 0
    for r in range(n):
        sz = fixed
        for ci in range(n_cols):
            if widths[ci] == 0 and valids[ci][r]:
                sz += (int(var_lens[ci][r]) + 7) & ~7
        offsets[r + 1] = offsets[r] + sz
        row = bytearray(sz)
        nulls = [0] * ((n_cols + 63) // 64)
        var_off = fixed
        for ci in range(n_cols):
            slot = 0
            if not valids[ci][r]:
                nulls[ci // 64] |= 1 << (ci % 64)
            elif widths[ci] > 0:
                val = cols[ci][r]
                raw = int(np.asarray(val).view({1: np.int8, 2: np.int16, 4: np.int32, 8: np.int64}[widths[ci]])) if sext[ci] else int.from_bytes(np.asarray(val).tobytes(), "little")
                slot = raw & 0xFFFFFFFFFFFFFFFF
            else:
                ln = int(var_lens[ci][r])
                row[var_off : var_off + ln] = cols[ci][r][:ln].tobytes()
                slot = (var_off << 32) | ln
                var_off = (var_off + ln + 7) & ~7
            row[((n_cols + 63) // 64) * 8 + ci * 8 : ((n_cols + 63) // 64) * 8 + ci * 8 + 8] = (
                slot & 0xFFFFFFFFFFFFFFFF
            ).to_bytes(8, "little")
        for wi, wv in enumerate(nulls):
            row[wi * 8 : wi * 8 + 8] = wv.to_bytes(8, "little")
        rows.append(bytes(row))
    return np.frombuffer(b"".join(rows), np.uint8).copy(), offsets
