"""Raw Parquet page access: the host half of the on-device decode path.

The reference decodes Parquet pages in native Rust readers
(native/core/src/parquet/read/column.rs, values.rs — PLAIN /
PLAIN_DICTIONARY / RLE decoding into Arrow buffers). The TPU formulation
splits the work differently:

- host (this module): locate column chunks via pyarrow *metadata only*
  (no pyarrow decode), parse page headers from the raw bytes (Thrift
  compact protocol, hand-decoded — the header structs are tiny and stable),
  decompress page payloads (pyarrow Codec), and return the raw
  dictionary values + RLE/bit-packed code stream segments;
- device (exec/decode.py): gather-free bit-unpacking of the code stream
  (reshape + shift arithmetic on the MXU/VPU — no per-value gathers,
  which cost ~180 ms per 8M rows on v5e regardless of index pattern).

Scope: flat (non-nested) columns, LIST<numeric> (decode_list_column_chunk),
LIST<string> over dictionary pages (decode_list_string_column_chunk),
STRUCT of primitive leaves (decode_struct_leaf_chunk), and
MAP<primitive, primitive> (io/parquet.py _map_cv — both key_value leaves
reuse the LIST machinery); PLAIN dictionaries, PLAIN_DICTIONARY/
RLE_DICTIONARY data pages (v1), DELTA and byte-stream-split encodings —
the layouts TPC-style integer/decimal fact columns actually use.
Remaining host fallbacks: PLAIN (non-dictionary) string pages, deeper
nestings (LIST<LIST>, LIST<STRUCT>, MAP with string keys/values) via
pyarrow (io/parquet.py); the reference decodes all nestings natively
(parquet_exec.rs:60).
"""

from __future__ import annotations

import dataclasses
import struct
from typing import List, Optional, Tuple

import numpy as np

__all__ = ["PageStream", "read_column_pages", "decode_rle_hybrid_host",
           "split_rle_runs"]


# ---------------------------------------------------------------------------
# Thrift compact protocol (just enough for parquet::format::PageHeader)
# ---------------------------------------------------------------------------


class _Compact:
    """Minimal Thrift compact-protocol reader (spec: thrift compact-proto;
    parquet-format PageHeader / DataPageHeader / DictionaryPageHeader)."""

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def _byte(self) -> int:
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def varint(self) -> int:
        out = shift = 0
        while True:
            b = self._byte()
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7

    def zigzag(self) -> int:
        v = self.varint()
        return (v >> 1) ^ -(v & 1)

    def skip(self, ftype: int) -> None:
        if ftype in (1, 2):  # BOOLEAN_TRUE / BOOLEAN_FALSE — value in type
            return
        if ftype == 3:  # BYTE
            self.pos += 1
        elif ftype in (4, 5, 6):  # I16/I32/I64 zigzag varints
            self.varint()
        elif ftype == 7:  # DOUBLE
            self.pos += 8
        elif ftype == 8:  # BINARY/STRING
            # NB: augmented assignment loads pos BEFORE varint() advances it
            n = self.varint()
            self.pos += n
        elif ftype == 9:  # LIST
            head = self._byte()
            size = head >> 4
            etype = head & 0x0F
            if size == 15:
                size = self.varint()
            for _ in range(size):
                self.skip(etype)
        elif ftype == 12:  # STRUCT
            self.read_struct(lambda fid, ft: self.skip(ft))
        else:
            raise ValueError(f"thrift compact: unsupported type {ftype}")

    def read_struct(self, on_field) -> None:
        fid = 0
        while True:
            head = self._byte()
            if head == 0:  # STOP
                return
            delta = head >> 4
            ftype = head & 0x0F
            fid = fid + delta if delta else self.zigzag()
            on_field(fid, ftype)


@dataclasses.dataclass
class PageHeader:
    page_type: int  # 0 DATA_PAGE, 2 DICTIONARY_PAGE, 3 DATA_PAGE_V2
    uncompressed_size: int
    compressed_size: int
    num_values: int
    encoding: int  # data encoding (0 PLAIN, 3 RLE, 8 RLE_DICTIONARY/PLAIN_DICTIONARY)
    header_len: int
    # v2 extras (definition/repetition level byte lengths precede the data)
    def_levels_len: int = 0
    rep_levels_len: int = 0
    v2_compressed: bool = True


def parse_page_header(buf: bytes, pos: int) -> PageHeader:
    rd = _Compact(buf, pos)
    out = {"page_type": -1, "uncompressed_size": 0, "compressed_size": 0,
           "num_values": 0, "encoding": 0, "def_levels_len": 0,
           "rep_levels_len": 0, "v2_compressed": True}

    def on_sub_data(fid: int, ftype: int):
        if fid == 1:
            out["num_values"] = rd.zigzag()
        elif fid == 2:
            out["encoding"] = rd.zigzag()
        else:
            rd.skip(ftype)

    def on_sub_dict(fid: int, ftype: int):
        if fid == 1:
            out["num_values"] = rd.zigzag()
        elif fid == 2:
            out["encoding"] = rd.zigzag()
        else:
            rd.skip(ftype)

    def on_sub_v2(fid: int, ftype: int):
        if fid == 1:
            out["num_values"] = rd.zigzag()
        elif fid == 3:
            out["num_rows"] = rd.zigzag()
        elif fid == 4:
            out["encoding"] = rd.zigzag()
        elif fid == 5:
            out["def_levels_len"] = rd.zigzag()
        elif fid == 6:
            out["rep_levels_len"] = rd.zigzag()
        elif fid == 7:
            out["v2_compressed"] = ftype == 1  # BOOLEAN_TRUE
        else:
            rd.skip(ftype)

    def on_field(fid: int, ftype: int):
        if fid == 1:
            out["page_type"] = rd.zigzag()
        elif fid == 2:
            out["uncompressed_size"] = rd.zigzag()
        elif fid == 3:
            out["compressed_size"] = rd.zigzag()
        elif fid == 5:
            rd.read_struct(on_sub_data)
        elif fid == 7:
            rd.read_struct(on_sub_dict)
        elif fid == 8:
            rd.read_struct(on_sub_v2)
        else:
            rd.skip(ftype)

    rd.read_struct(on_field)
    return PageHeader(
        page_type=out["page_type"],
        uncompressed_size=out["uncompressed_size"],
        compressed_size=out["compressed_size"],
        num_values=out["num_values"],
        encoding=out["encoding"],
        header_len=rd.pos - pos,
        def_levels_len=out["def_levels_len"],
        rep_levels_len=out["rep_levels_len"],
        v2_compressed=out["v2_compressed"],
    )


# ---------------------------------------------------------------------------
# Column chunk page extraction
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class DataPage:
    """One data page, decompressed, ready for device decode.

    encoding: 0 PLAIN, 5 DELTA_BINARY_PACKED, 8/2 RLE_DICTIONARY, 9
    BYTE_STREAM_SPLIT. ``def_bytes`` is the RLE/bit-packed(width 1)
    definition-level stream for nullable (max_def_level==1) columns —
    None for required columns; the values payload then holds only the
    non-null entries (``num_values`` counts ALL slots incl. nulls)."""

    encoding: int
    payload: bytes  # values section (for dict pages: bitwidth byte stripped)
    num_values: int
    bit_width: int = 0  # dictionary code width
    def_bytes: Optional[bytes] = None
    rep_bytes: Optional[bytes] = None  # repetition levels (nested columns)


@dataclasses.dataclass
class PageStream:
    """One column chunk's decoded-for-transport pages."""

    dictionary: Optional[np.ndarray]  # PLAIN dictionary values (physical type)
    code_pages: List[Tuple[int, bytes, int]]  # (bit_width, rle_hybrid_bytes, num_values)
    plain_pages: List[Tuple[bytes, int]]  # PLAIN data pages (payload, num_values)
    num_values: int
    pages: List[DataPage] = dataclasses.field(default_factory=list)
    nullable: bool = False
    max_def_level: int = 0
    max_rep_level: int = 0
    dict_count: int = 0  # dictionary page num_values (BYTE_ARRAY parsing)


def read_column_pages(path: str, row_group: int, column: int,
                      page_mask: Optional[List[bool]] = None) -> PageStream:
    """Extract a column chunk's raw pages: dictionary values + per-page
    value payloads with definition/repetition-level streams (def for any
    optional node on the path, rep for nested columns — level bit widths
    from the schema's max levels). ``page_mask`` (from page-index
    pruning) drops pages whose rows can't match — dropped pages still
    count their slots so row offsets stay aligned (the caller masks them
    dead)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    col = pf.metadata.row_group(row_group).column(column)
    phys = col.physical_type  # 'INT32', 'INT64', 'FLOAT', 'DOUBLE', ...
    leaf = pf.schema.column(column)
    max_def = leaf.max_definition_level
    max_rep = leaf.max_repetition_level
    def_w = max_def.bit_length()  # RLE bit width of each level stream
    rep_w = max_rep.bit_length()
    nullable = pf.schema_arrow.field(col.path_in_schema.split(".")[0]).nullable
    codec_name = col.compression.lower()
    codec = None if codec_name in ("uncompressed",) else pa.Codec(codec_name)
    start = col.dictionary_page_offset
    if start is None:
        start = col.data_page_offset
    end = start + col.total_compressed_size

    with open(path, "rb") as f:
        f.seek(start)
        raw = f.read(end - start)

    phys_np = {"INT32": np.dtype("<i4"), "INT64": np.dtype("<i8"),
               "FLOAT": np.dtype("<f4"), "DOUBLE": np.dtype("<f8")}.get(phys)

    dictionary = None
    dict_count = 0
    pages: List[DataPage] = []
    pos = 0
    total = 0
    data_page_idx = 0

    def split_levels_v1(data: bytes) -> Tuple[Optional[bytes], Optional[bytes], bytes]:
        """v1 page: [rep levels][def levels][values]; each level stream is a
        4-byte-length-prefixed RLE/bit-packed hybrid, present only when its
        max level > 0 (rep for nested columns, def for any optional node on
        the path — parquet-format Encodings.md 'Data Pages')."""
        rep_b = def_b = None
        pos0 = 0
        if max_rep > 0:
            (ln,) = struct.unpack_from("<I", data, pos0)
            rep_b = data[pos0 + 4: pos0 + 4 + ln]
            pos0 += 4 + ln
        if max_def > 0:
            (ln,) = struct.unpack_from("<I", data, pos0)
            def_b = data[pos0 + 4: pos0 + 4 + ln]
            pos0 += 4 + ln
        return rep_b, def_b, data[pos0:]

    while pos < len(raw):
        hdr = parse_page_header(raw, pos)
        pos += hdr.header_len
        payload = raw[pos: pos + hdr.compressed_size]
        pos += hdr.compressed_size
        if hdr.page_type == 2:  # dictionary page (PLAIN values)
            data = codec.decompress(payload, hdr.uncompressed_size) if codec else payload
            data = bytes(data)
            dict_count = hdr.num_values
            if phys_np is not None:
                dictionary = np.frombuffer(data, phys_np)
            else:  # byte-array dictionary: leave raw for the caller
                dictionary = np.frombuffer(data, np.uint8)
            continue
        if hdr.page_type == 0:  # data page v1
            pruned = page_mask is not None and data_page_idx < len(page_mask) \
                and not page_mask[data_page_idx]
            data_page_idx += 1
            if pruned:
                pages.append(DataPage(-1, b"", hdr.num_values))
                total += hdr.num_values
                continue
            data = codec.decompress(payload, hdr.uncompressed_size) if codec else payload
            data = bytes(data)
            rep_bytes, def_bytes, body = split_levels_v1(data)
            enc = hdr.encoding
            if enc in (2, 8):  # PLAIN_DICTIONARY / RLE_DICTIONARY
                pages.append(DataPage(8, body[1:], hdr.num_values,
                                      bit_width=body[0], def_bytes=def_bytes,
                                      rep_bytes=rep_bytes))
            elif enc in (0, 5, 9):  # PLAIN / DELTA_BINARY_PACKED / BSS
                pages.append(DataPage(enc, body, hdr.num_values,
                                      def_bytes=def_bytes, rep_bytes=rep_bytes))
            else:
                raise NotImplementedError(f"data page encoding {enc}")
            total += hdr.num_values
        elif hdr.page_type == 3:  # data page v2: levels stored uncompressed first
            pruned = page_mask is not None and data_page_idx < len(page_mask) \
                and not page_mask[data_page_idx]
            data_page_idx += 1
            if pruned:
                pages.append(DataPage(-1, b"", hdr.num_values))
                total += hdr.num_values
                continue
            lev = hdr.def_levels_len + hdr.rep_levels_len
            # v2 levels: raw RLE streams (no 4-byte length prefix), rep first
            rep_bytes = payload[: hdr.rep_levels_len] \
                if (max_rep > 0 and hdr.rep_levels_len) else None
            def_bytes = payload[hdr.rep_levels_len: lev] \
                if (max_def > 0 and hdr.def_levels_len) else None
            body = payload[lev:]
            if codec and hdr.v2_compressed:
                body = bytes(codec.decompress(body, hdr.uncompressed_size - lev))
            else:
                body = bytes(body)
            enc = hdr.encoding
            if enc in (2, 8):
                pages.append(DataPage(8, body[1:], hdr.num_values,
                                      bit_width=body[0], def_bytes=def_bytes,
                                      rep_bytes=rep_bytes))
            elif enc in (0, 5, 9):
                pages.append(DataPage(enc, body, hdr.num_values,
                                      def_bytes=def_bytes, rep_bytes=rep_bytes))
            else:
                raise NotImplementedError(f"data page v2 encoding {enc}")
            total += hdr.num_values
        # other page types (index pages) are skipped
    code_pages = [(p.bit_width, p.payload, p.num_values) for p in pages if p.encoding == 8]
    plain_pages = [(p.payload, p.num_values) for p in pages if p.encoding == 0]
    return PageStream(dictionary=dictionary, code_pages=code_pages,
                      plain_pages=plain_pages, num_values=total,
                      pages=pages, nullable=nullable,
                      max_def_level=max_def, max_rep_level=max_rep,
                      dict_count=dict_count)


# ---------------------------------------------------------------------------
# RLE/bit-packed hybrid: host structure scan + reference decode
# ---------------------------------------------------------------------------


def split_rle_runs(data: bytes, bit_width: int, num_values: int):
    """Scan the RLE/bit-packed hybrid stream structure WITHOUT decoding
    values: yields ('rle', count, value) | ('packed', n_groups, byte_off,
    n_values). The packed segments' payload stays raw for device unpacking."""
    out = []
    pos = 0
    seen = 0
    vw = (bit_width + 7) // 8
    while seen < num_values and pos < len(data):
        # varint header
        h = 0
        shift = 0
        while True:
            b = data[pos]
            pos += 1
            h |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        if h & 1:  # bit-packed: (h>>1) groups of 8 values
            groups = h >> 1
            nbytes = groups * bit_width
            n = min(groups * 8, num_values - seen)
            out.append(("packed", groups, pos, n))
            pos += nbytes
            seen += n
        else:  # RLE run
            count = h >> 1
            value = int.from_bytes(data[pos: pos + vw], "little")
            pos += vw
            count = min(count, num_values - seen)
            out.append(("rle", count, value))
            seen += count
    return out


def decode_rle_hybrid_host(data: bytes, bit_width: int, num_values: int) -> np.ndarray:
    """Reference host decoder (oracle for the device kernel)."""
    out = np.empty(num_values, np.int64)
    pos = 0
    for seg in split_rle_runs(data, bit_width, num_values):
        if seg[0] == "rle":
            _, count, value = seg
            out[pos: pos + count] = value
            pos += count
        else:
            _, groups, off, n = seg
            payload = np.frombuffer(data, np.uint8, groups * bit_width, off)
            bits = np.unpackbits(payload, bitorder="little")
            vals = bits.reshape(-1, bit_width)
            weights = (1 << np.arange(bit_width, dtype=np.int64))
            decoded = (vals.astype(np.int64) * weights).sum(1)
            out[pos: pos + n] = decoded[:n]
            pos += n
    return out


# ---------------------------------------------------------------------------
# DELTA_BINARY_PACKED (encoding 5) — host structure scan + reference decode
# (reference: native/core/src/parquet/read/values.rs delta decoders)
# ---------------------------------------------------------------------------


def _read_varint(data: bytes, pos: int) -> Tuple[int, int]:
    out = shift = 0
    while True:
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _read_zigzag(data: bytes, pos: int) -> Tuple[int, int]:
    v, pos = _read_varint(data, pos)
    return (v >> 1) ^ -(v & 1), pos


def split_delta_blocks(data: bytes):
    """Structure scan of a DELTA_BINARY_PACKED page: returns
    (first_value, total_count, miniblocks) where each miniblock is
    (min_delta, bit_width, byte_off, n_values) — payload bytes untouched
    for device unpacking."""
    block_size, pos = _read_varint(data, 0)
    nmini, pos = _read_varint(data, pos)
    total, pos = _read_varint(data, pos)
    first, pos = _read_zigzag(data, pos)
    vpm = block_size // max(nmini, 1)
    minis = []
    filled = 1
    while filled < total:
        min_delta, pos = _read_zigzag(data, pos)
        widths = data[pos: pos + nmini]
        pos += nmini
        for m in range(nmini):
            if filled >= total:
                break
            w = widths[m]
            nbytes = vpm * w // 8
            take = min(vpm, total - filled)
            minis.append((min_delta, w, pos, take))
            pos += nbytes
            filled += take
    return first, total, minis


def decode_delta_binary_host(data: bytes, num_values: int) -> np.ndarray:
    """Reference host decoder (oracle for the device kernel)."""
    first, total, minis = split_delta_blocks(data)
    out = np.empty(max(total, 1), np.int64)
    out[0] = first
    filled = 1
    for min_delta, w, off, take in minis:
        if w:
            # full miniblock bytes may exceed take*w bits; unpack what we use
            vpm_bytes = np.frombuffer(
                data, np.uint8, min(len(data) - off, (take * w + 7) // 8), off)
            bits = np.unpackbits(vpm_bytes, bitorder="little")
            need = take * w
            bits = bits[:need].reshape(take, w)
            weights = (1 << np.arange(w, dtype=np.int64))
            deltas = (bits.astype(np.int64) * weights).sum(1)
        else:
            deltas = np.zeros(take, np.int64)
        prev = out[filled - 1]
        out[filled: filled + take] = prev + np.cumsum(min_delta + deltas)
        filled += take
    return out[:num_values]
