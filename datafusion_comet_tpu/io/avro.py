"""Minimal Apache Avro Object Container File reader/writer.

Iceberg's manifest lists and manifests are Avro files; the reference reads
them through iceberg-rust (operators/iceberg_scan.rs). No Avro library is
bundled here, so this module implements the needed subset of the spec from
scratch: container header (magic ``Obj\\x01``, metadata map carrying the
writer schema JSON and codec), sync-marker-delimited blocks (null or
deflate codec), and the binary encoding — zigzag-varint ints/longs, length-
prefixed bytes/strings, IEEE little-endian floats, arrays/maps with block
counts, unions by branch index, records in field order.

The writer exists for tests and for producing our own manifests (the
write-path analog of IcebergWriteExec); it emits the same subset.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any, BinaryIO, Dict, List, Optional, Tuple

__all__ = ["read_avro", "write_avro"]

_MAGIC = b"Obj\x01"


# -------------------------------------------------------------------------------------
# binary primitives
# -------------------------------------------------------------------------------------


class _Reader:
    def __init__(self, buf: bytes):
        self.b = buf
        self.i = 0

    def read(self, n: int) -> bytes:
        out = self.b[self.i : self.i + n]
        if len(out) != n:
            raise EOFError("truncated avro data")
        self.i += n
        return out

    def at_end(self) -> bool:
        return self.i >= len(self.b)

    def zlong(self) -> int:
        shift = 0
        acc = 0
        while True:
            byte = self.b[self.i]
            self.i += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag decode


def _zenc(n: int) -> bytes:
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


# -------------------------------------------------------------------------------------
# schema-driven decode
# -------------------------------------------------------------------------------------


def _decode(r: _Reader, schema: Any) -> Any:
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, dict):
        t = schema["type"]
    elif isinstance(schema, list):  # union: branch index then value
        idx = r.zlong()
        return _decode(r, schema[idx])
    else:
        raise ValueError(f"bad schema {schema!r}")
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) != b"\x00"
    if t in ("int", "long"):
        return r.zlong()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.read(r.zlong())
    if t == "string":
        return r.read(r.zlong()).decode("utf-8")
    if t == "fixed":
        return r.read(schema["size"])
    if t == "enum":
        return schema["symbols"][r.zlong()]
    if t == "array":
        out = []
        while True:
            n = r.zlong()
            if n == 0:
                break
            if n < 0:  # block with byte size prefix
                n = -n
                r.zlong()
            for _ in range(n):
                out.append(_decode(r, schema["items"]))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.zlong()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.zlong()
            for _ in range(n):
                k = r.read(r.zlong()).decode("utf-8")
                out[k] = _decode(r, schema["values"])
        return out
    if t == "record":
        return {f["name"]: _decode(r, f["type"]) for f in schema["fields"]}
    if isinstance(schema, dict) and t in ("record", "enum", "fixed"):
        raise AssertionError
    # named-type reference or logical type wrapper
    if isinstance(schema, dict) and "logicalType" in schema:
        return _decode(r, t)
    raise ValueError(f"unsupported avro type {t!r}")


def _encode(out: bytearray, schema: Any, v: Any) -> None:
    if isinstance(schema, list):
        # union: pick first matching branch (null vs non-null covers our uses)
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch.get("type")
            if (v is None) == (bt == "null"):
                out += _zenc(i)
                _encode(out, branch, v)
                return
        raise ValueError("no union branch matched")
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return
    if t == "boolean":
        out += b"\x01" if v else b"\x00"
    elif t in ("int", "long"):
        out += _zenc(int(v))
    elif t == "float":
        out += struct.pack("<f", v)
    elif t == "double":
        out += struct.pack("<d", v)
    elif t == "bytes":
        out += _zenc(len(v)) + bytes(v)
    elif t == "string":
        enc = v.encode("utf-8")
        out += _zenc(len(enc)) + enc
    elif t == "fixed":
        out += bytes(v)
    elif t == "enum":
        out += _zenc(schema["symbols"].index(v))
    elif t == "array":
        items = list(v)
        if items:
            out += _zenc(len(items))
            for it in items:
                _encode(out, schema["items"], it)
        out += _zenc(0)
    elif t == "map":
        if v:
            out += _zenc(len(v))
            for k, mv in v.items():
                enc = k.encode("utf-8")
                out += _zenc(len(enc)) + enc
                _encode(out, schema["values"], mv)
        out += _zenc(0)
    elif t == "record":
        for f in schema["fields"]:
            _encode(out, f["type"], v.get(f["name"]))
    else:
        raise ValueError(f"unsupported avro type {t!r}")


# -------------------------------------------------------------------------------------
# container files
# -------------------------------------------------------------------------------------


def read_avro(path: str) -> Tuple[List[Dict[str, Any]], Dict[str, bytes]]:
    """Read an Avro container file → (records, file metadata)."""
    with open(path, "rb") as f:
        buf = f.read()
    r = _Reader(buf)
    if r.read(4) != _MAGIC:
        raise ValueError(f"{path}: not an Avro container file")
    meta: Dict[str, bytes] = {}
    while True:
        n = r.zlong()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.zlong()
        for _ in range(n):
            k = r.read(r.zlong()).decode("utf-8")
            meta[k] = r.read(r.zlong())
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    sync = r.read(16)
    records: List[Dict[str, Any]] = []
    while not r.at_end():
        count = r.zlong()
        size = r.zlong()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        br = _Reader(block)
        for _ in range(count):
            records.append(_decode(br, schema))
        if r.read(16) != sync:
            raise ValueError("avro sync marker mismatch")
    return records, meta


def write_avro(path: str, schema: Dict[str, Any], records: List[Dict[str, Any]],
               codec: str = "deflate", extra_meta: Optional[Dict[str, bytes]] = None) -> None:
    body = bytearray()
    for rec in records:
        _encode(body, schema, rec)
    block = bytes(body)
    if codec == "deflate":
        comp = zlib.compressobj(6, zlib.DEFLATED, -15)
        block = comp.compress(block) + comp.flush()
    sync = os.urandom(16)
    out = bytearray(_MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    meta.update(extra_meta or {})
    out += _zenc(len(meta))
    for k, v in meta.items():
        ke = k.encode()
        out += _zenc(len(ke)) + ke + _zenc(len(v)) + v
    out += _zenc(0)
    out += sync
    out += _zenc(len(records)) + _zenc(len(block)) + block + sync
    with open(path, "wb") as f:
        f.write(bytes(out))
