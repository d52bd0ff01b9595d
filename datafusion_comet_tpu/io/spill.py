"""Host-offload spill: compressed columnar blocks + u64-LE offset index.

The analog of the reference's shuffle/spill block format
(native/shuffle/src/ipc.rs:23-46: 4-byte codec magic + compressed payload;
writers/local/spill.rs; u64-LE partition offset index). Device batches that
exceed the HBM budget are pulled to host, framed into blocks here, and
re-staged on demand. Framing and checksums run in the native host library
(io/native.py → native/staging.cpp); codecs: ZSTD (default, as in the
reference), LZ4_, SNAP, ZLIB (toolchain-guaranteed fallback), NONE —
config-selected via comet.shuffle.codec.

Block layout:  magic[4] | crc32 u32 | raw_len u64 | comp_len u64 | payload
File layout:   blocks...  +  sidecar index file of u64-LE block offsets
"""

from __future__ import annotations

import os
import struct
from typing import List, Optional, Tuple

import jax
import numpy as np

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import Batch, ColumnVector
from datafusion_comet_tpu.io import native

__all__ = ["SpillWriter", "SpillReader", "batch_to_bytes", "batch_from_bytes",
           "resolve_codec"]

MAGIC_ZLIB = b"ZLIB"
MAGIC_NONE = b"NONE"
# reference magic tags (ipc.rs:24-46)
MAGIC_ZSTD = b"ZSTD"
MAGIC_LZ4 = b"LZ4_"
MAGIC_SNAP = b"SNAP"

_CODEC_MAGIC = {"zlib": MAGIC_ZLIB, "zstd": MAGIC_ZSTD, "lz4": MAGIC_LZ4,
                "snappy": MAGIC_SNAP, "none": MAGIC_NONE}


def _codec_ready(codec: str) -> bool:
    if codec in ("zlib", "none"):
        return True
    if codec == "zstd":
        return native.zstd_available()
    if codec == "lz4":
        return native.lz4_available()
    if codec == "snappy":
        return native.snappy_available()
    return False


def resolve_codec(codec: Optional[str] = None) -> str:
    """Config-selected spill/shuffle codec with availability fallback to
    zlib (the toolchain-guaranteed one)."""
    if codec is None:
        from datafusion_comet_tpu.conf import CONF, SPILL_CODEC

        codec = CONF.get(SPILL_CODEC)
    codec = codec.lower()
    if codec not in _CODEC_MAGIC:
        raise ValueError(f"unknown spill codec {codec!r}; "
                         f"one of {sorted(_CODEC_MAGIC)}")
    return codec if _codec_ready(codec) else "zlib"


def _compress(codec: str, raw: bytes, level: int) -> Tuple[bytes, bytes]:
    if codec == "zstd":
        return native.zstd_compress(raw, level), MAGIC_ZSTD
    if codec == "lz4":
        return native.lz4_compress(raw), MAGIC_LZ4
    if codec == "snappy":
        return native.snappy_compress(raw), MAGIC_SNAP
    if codec == "zlib":
        return native.zlib_compress(raw, level), MAGIC_ZLIB
    return raw, MAGIC_NONE


def _decompress(magic: bytes, payload: bytes, raw_len: int) -> bytes:
    if magic == MAGIC_ZSTD:
        return native.zstd_decompress(payload, raw_len)
    if magic == MAGIC_LZ4:
        return native.lz4_decompress(payload, raw_len)
    if magic == MAGIC_SNAP:
        return native.snappy_decompress(payload, raw_len)
    if magic == MAGIC_ZLIB:
        return native.zlib_decompress(payload, raw_len)
    if magic == MAGIC_NONE:
        return payload
    raise IOError(f"unknown spill block magic {magic!r}")


def batch_to_bytes(batch: Batch) -> bytes:
    """Serialize a batch's host copy into one contiguous buffer (column data,
    validity planes, lengths, row mask — raw little-endian)."""
    batch = batch.decode_dicts()  # block layout is (cap, w)+lengths for binary
    parts: List[bytes] = [struct.pack("<q", batch.capacity)]
    parts.append(np.asarray(batch.row_mask).tobytes())
    for cv in batch.columns:
        parts.append(np.asarray(cv.data).tobytes())
        parts.append(np.asarray(cv.validity).tobytes())
        if cv.lengths is not None:
            parts.append(np.asarray(cv.lengths).tobytes())
    return b"".join(parts)


def batch_from_bytes(buf: bytes, schema: T.Schema) -> Batch:
    import jax.numpy as jnp

    (cap,) = struct.unpack_from("<q", buf, 0)
    off = 8
    mask = np.frombuffer(buf, np.bool_, cap, off)
    off += cap
    cols = []
    for f in schema.fields:
        if f.dtype.is_binary:
            w = f.dtype.byte_width
            data = np.frombuffer(buf, np.uint8, cap * w, off).reshape(cap, w)
            off += cap * w
        else:
            dt = f.dtype.np_dtype()
            data = np.frombuffer(buf, dt, cap, off)
            off += cap * dt.itemsize
        validity = np.frombuffer(buf, np.bool_, cap, off)
        off += cap
        lengths = None
        if f.dtype.is_binary:
            lengths = np.frombuffer(buf, np.int32, cap, off)
            off += cap * 4
        cols.append(
            ColumnVector(
                jnp.asarray(data),
                jnp.asarray(validity),
                None if lengths is None else jnp.asarray(lengths),
                f.dtype,
            )
        )
    return Batch(tuple(cols), jnp.asarray(mask.copy()), schema)


class SpillWriter:
    def __init__(self, path: str, codec: Optional[str] = None, level: int = 1):
        self.path = path
        self.codec = resolve_codec(codec)
        self.level = level
        self.offsets: List[int] = []
        self._f = open(path, "wb")
        self._pos = 0

    def write_batch(self, batch: Batch) -> None:
        raw = batch_to_bytes(batch)
        payload, magic = _compress(self.codec, raw, self.level)
        if len(payload) >= len(raw):  # incompressible: store raw
            payload, magic = raw, MAGIC_NONE
        crc = native.crc32(payload)
        header = magic + struct.pack("<IQQ", crc, len(raw), len(payload))
        self.offsets.append(self._pos)
        self._f.write(header)
        self._f.write(payload)
        self._pos += len(header) + len(payload)

    def close(self) -> None:
        self._f.close()
        with open(self.path + ".index", "wb") as ix:
            for off in self.offsets:
                ix.write(struct.pack("<Q", off))
            ix.write(struct.pack("<Q", self._pos))


class SpillReader:
    def __init__(self, path: str, schema: T.Schema):
        self.path = path
        self.schema = schema
        with open(path + ".index", "rb") as ix:
            raw = ix.read()
        self.offsets = [struct.unpack_from("<Q", raw, i * 8)[0] for i in range(len(raw) // 8)]

    def num_blocks(self) -> int:
        return len(self.offsets) - 1

    def read_batch(self, i: int) -> Batch:
        with open(self.path, "rb") as f:
            f.seek(self.offsets[i])
            blob = f.read(self.offsets[i + 1] - self.offsets[i])
        magic = blob[:4]
        crc, raw_len, comp_len = struct.unpack_from("<IQQ", blob, 4)
        payload = blob[24 : 24 + comp_len]
        if native.crc32(payload) != crc:
            raise IOError(f"spill block {i} checksum mismatch")
        return batch_from_bytes(_decompress(magic, payload, raw_len), self.schema)
