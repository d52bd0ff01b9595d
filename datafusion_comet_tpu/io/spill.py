"""Host-offload spill: compressed columnar blocks + u64-LE offset index.

The analog of the reference's shuffle/spill block format
(native/shuffle/src/ipc.rs:23-46: 4-byte codec magic + compressed payload;
writers/local/spill.rs; u64-LE partition offset index). Device batches that
exceed the HBM budget are pulled to host, framed into blocks here, and
re-staged on demand. Framing and checksums run in the native host library
(io/native.py → native/staging.cpp); codecs: ZLIB (toolchain-guaranteed)
and NONE.

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

__all__ = ["SpillWriter", "SpillReader", "batch_to_bytes", "batch_from_bytes"]

MAGIC_ZLIB = b"ZLIB"
MAGIC_NONE = b"NONE"


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
    def __init__(self, path: str, codec: str = "zlib", level: int = 1):
        self.path = path
        self.codec = codec
        self.level = level
        self.offsets: List[int] = []
        self._f = open(path, "wb")
        self._pos = 0

    def write_batch(self, batch: Batch) -> None:
        raw = batch_to_bytes(batch)
        if self.codec == "zlib":
            payload = native.zlib_compress(raw, self.level)
            magic = MAGIC_ZLIB
            if len(payload) >= len(raw):  # incompressible: store raw
                payload, magic = raw, MAGIC_NONE
        else:
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
        raw = native.zlib_decompress(payload, raw_len) if magic == MAGIC_ZLIB else payload
        return batch_from_bytes(raw, self.schema)
