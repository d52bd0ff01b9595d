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
