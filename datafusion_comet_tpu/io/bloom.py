"""Parquet bloom-filter (SBBF) row-group pruning.

Reference: the reference's scan always consults row-group bloom filters for
equality predicates when filter pushdown is on (parquet-rs side of
parquet_exec.rs; SURVEY L8 lists bloom pruning as a required scan depth).
pyarrow's Python API exposes no bloom filters, so this module hand-parses
the BloomFilterHeader (Thrift compact, same reader as io/pages.py) at each
column chunk's ``bloom_filter_offset`` (ColumnMetaData field 14) and checks
the parquet split-block bloom filter (SBBF):

  h   = xxhash64(plain_encoded_value, seed=0)
  blk = ((h >> 32) * (num_bytes / 32)) >> 32
  bit i of word i set per the 8 SALT multipliers of the low 32 hash bits.

A definite miss prunes the row group; any parse failure degrades to
"may match" (pruning is only an optimization)."""

from __future__ import annotations

import struct
from typing import Any, List, Optional

from datafusion_comet_tpu.io.pages import _Compact

__all__ = ["row_group_may_contain", "read_bloom_filter", "sbbf_might_contain",
           "xxhash64"]

_PRIME1 = 0x9E3779B185EBCA87
_PRIME2 = 0xC2B2AE3D27D4EB4F
_PRIME3 = 0x165667B19E3779F9
_PRIME4 = 0x85EBCA77C2B2AE63
_PRIME5 = 0x27D4EB2F165667C5
_MASK = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _PRIME2) & _MASK
    return (_rotl(acc, 31) * _PRIME1) & _MASK


def xxhash64(data: bytes, seed: int = 0) -> int:
    """Reference xxHash64 (spec-exact; parquet bloom filters use seed 0)."""
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _PRIME1 + _PRIME2) & _MASK
        v2 = (seed + _PRIME2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _PRIME1) & _MASK
        while pos + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[pos:pos + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[pos + 8:pos + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[pos + 16:pos + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[pos + 24:pos + 32], "little"))
            pos += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _PRIME1 + _PRIME4) & _MASK
    else:
        h = (seed + _PRIME5) & _MASK
    h = (h + n) & _MASK
    while pos + 8 <= n:
        h = ((_rotl(h ^ _round(0, int.from_bytes(data[pos:pos + 8], "little")), 27)
              * _PRIME1) + _PRIME4) & _MASK
        pos += 8
    if pos + 4 <= n:
        lane = (int.from_bytes(data[pos:pos + 4], "little") * _PRIME1) & _MASK
        h = ((_rotl(h ^ lane, 23) * _PRIME2) + _PRIME3) & _MASK
        pos += 4
    while pos < n:
        h = (_rotl(h ^ ((data[pos] * _PRIME5) & _MASK), 11) * _PRIME1) & _MASK
        pos += 1
    h ^= h >> 33
    h = (h * _PRIME2) & _MASK
    h ^= h >> 29
    h = (h * _PRIME3) & _MASK
    h ^= h >> 32
    return h


_SALT = (0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
         0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31)


def sbbf_might_contain(bitset: bytes, h: int) -> bool:
    """Split-block bloom filter membership (parquet spec BloomFilter.md)."""
    num_blocks = len(bitset) // 32
    if num_blocks == 0:
        return True
    blk = ((h >> 32) * num_blocks) >> 32
    base = blk * 32
    h32 = h & 0xFFFFFFFF
    for i in range(8):
        bit = ((h32 * _SALT[i]) & 0xFFFFFFFF) >> 27
        (word,) = struct.unpack_from("<I", bitset, base + 4 * i)
        if not (word >> bit) & 1:
            return False
    return True


def _bloom_offsets(path: str) -> List[List[Optional[int]]]:
    """Per row group, per column: bloom_filter_offset (ColumnMetaData field
    14) or None."""
    from datafusion_comet_tpu.io.pageindex import _footer_bytes, _list_header

    buf = _footer_bytes(path)
    rd = _Compact(buf)
    out: List[List[Optional[int]]] = []

    def parse_col_meta() -> Optional[int]:
        off = [None]

        def on_field(fid: int, ftype: int):
            if fid == 14:
                off[0] = rd.zigzag()
            else:
                rd.skip(ftype)

        rd.read_struct(on_field)
        return off[0]

    def parse_chunk() -> Optional[int]:
        off = [None]

        def on_field(fid: int, ftype: int):
            if fid == 3 and ftype == 12:
                off[0] = parse_col_meta()
            else:
                rd.skip(ftype)

        rd.read_struct(on_field)
        return off[0]

    def parse_rg() -> List[Optional[int]]:
        cols: List[Optional[int]] = []

        def on_field(fid: int, ftype: int):
            if fid == 1 and ftype == 9:
                size, _ = _list_header(rd)
                for _ in range(size):
                    cols.append(parse_chunk())
            else:
                rd.skip(ftype)

        rd.read_struct(on_field)
        return cols

    def on_file(fid: int, ftype: int):
        if fid == 4 and ftype == 9:
            size, _ = _list_header(rd)
            for _ in range(size):
                out.append(parse_rg())
        else:
            rd.skip(ftype)

    rd.read_struct(on_file)
    return out


def read_bloom_filter(path: str, rg: int, col: int) -> Optional[bytes]:
    """The SBBF bitset for one column chunk, or None when absent."""
    try:
        offs = _bloom_offsets(path)
        off = offs[rg][col]
    except Exception:
        return None
    if off is None:
        return None
    with open(path, "rb") as f:
        f.seek(off)
        head = f.read(64)
        rd = _Compact(head)
        num_bytes = [0]

        def on_field(fid: int, ftype: int):
            if fid == 1:
                num_bytes[0] = rd.zigzag()
            else:
                rd.skip(ftype)

        try:
            rd.read_struct(on_field)
        except Exception:
            return None
        if not (0 < num_bytes[0] <= (1 << 27)):
            return None
        f.seek(off + rd.pos)
        return f.read(num_bytes[0])


def _plain_encode(value: Any, physical_type: str) -> Optional[bytes]:
    try:
        if physical_type == "INT32":
            return struct.pack("<i", int(value))
        if physical_type == "INT64":
            return struct.pack("<q", int(value))
        if physical_type == "FLOAT":
            return struct.pack("<f", float(value))
        if physical_type == "DOUBLE":
            return struct.pack("<d", float(value))
        if physical_type == "BYTE_ARRAY":
            return value.encode("utf-8") if isinstance(value, str) else bytes(value)
    except (ValueError, TypeError, struct.error):
        return None
    return None


def row_group_may_contain(path: str, pf, rg: int, col_name: str, value: Any) -> bool:
    """False = the bloom filter PROVES the value absent from this row group
    (safe to prune for an equality predicate); True = maybe present or no
    filter written."""
    meta = pf.metadata.row_group(rg)
    ci = None
    for i in range(meta.num_columns):
        if meta.column(i).path_in_schema == col_name:
            ci = i
            break
    if ci is None:
        return True
    bitset = read_bloom_filter(path, rg, ci)
    if bitset is None:
        return True
    enc = _plain_encode(value, meta.column(ci).physical_type)
    if enc is None:
        return True
    return sbbf_might_contain(bitset, xxhash64(enc))
