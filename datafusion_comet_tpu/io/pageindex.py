"""Parquet page-index (ColumnIndex / OffsetIndex) pruning.

The reference prunes at page granularity through parquet-rs's page index
(native/core/src/parquet/eager_page_index_reader_factory.rs — it eagerly
loads the index so the async reader can skip pages). pyarrow's Python API
exposes neither structure, so this module hand-parses them with the same
Thrift compact-protocol reader the page scanner uses (io/pages.py):

- the footer FileMetaData yields each column chunk's
  column_index_offset/length + offset_index_offset/length
  (parquet.thrift ColumnChunk fields 4-7);
- ColumnIndex gives per-page min/max/null_pages, OffsetIndex gives each
  page's first_row_index;
- conjuncts of ``col <op> literal`` (the row-group pruning shape) test
  against page min/max → a per-page keep mask per predicate column →
  intersected row ranges → per-column page masks via each column's own
  offset index (pages of OTHER columns prune when their row range falls
  entirely inside pruned rows).

The device scan path consumes the masks (exec/decode.decode_column_chunk
``page_mask``) and marks pruned rows dead — exact regardless of the
predicate, since pruned pages provably cannot satisfy it.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from datafusion_comet_tpu.io.pages import _Compact
from datafusion_comet_tpu.ir import expr as E

__all__ = ["read_page_index", "compute_page_masks", "PageIndex"]


def _list_header(rd: _Compact) -> Tuple[int, int]:
    head = rd._byte()
    size = head >> 4
    etype = head & 0x0F
    if size == 15:
        size = rd.varint()
    return size, etype


def _read_binary(rd: _Compact) -> bytes:
    n = rd.varint()
    out = rd.buf[rd.pos: rd.pos + n]
    rd.pos += n
    return out


class PageIndex:
    """Parsed ColumnIndex + OffsetIndex for one column chunk."""

    def __init__(self, null_pages, mins, maxs, first_rows, null_counts=None):
        self.null_pages = null_pages      # List[bool]
        self.mins = mins                  # List[bytes]
        self.maxs = maxs                  # List[bytes]
        self.first_rows = first_rows      # List[int]
        self.null_counts = null_counts

    def num_pages(self) -> int:
        return len(self.first_rows)


def _footer_bytes(path: str) -> bytes:
    with open(path, "rb") as f:
        f.seek(-8, 2)
        tail = f.read(8)
        (ln,) = struct.unpack("<I", tail[:4])
        assert tail[4:] == b"PAR1", "not a parquet file"
        f.seek(-(8 + ln), 2)
        return f.read(ln)


def _index_offsets(path: str) -> List[List[Dict[str, int]]]:
    """Per row group, per column: {ci_off, ci_len, oi_off, oi_len} (0 when
    the writer emitted no page index)."""
    buf = _footer_bytes(path)
    rd = _Compact(buf)
    row_groups: List[List[Dict[str, int]]] = []

    def parse_column_chunk() -> Dict[str, int]:
        out = {"ci_off": 0, "ci_len": 0, "oi_off": 0, "oi_len": 0}

        def on_field(fid: int, ftype: int):
            if fid == 4:
                out["oi_off"] = rd.zigzag()
            elif fid == 5:
                out["oi_len"] = rd.zigzag()
            elif fid == 6:
                out["ci_off"] = rd.zigzag()
            elif fid == 7:
                out["ci_len"] = rd.zigzag()
            else:
                rd.skip(ftype)

        rd.read_struct(on_field)
        return out

    def parse_row_group() -> List[Dict[str, int]]:
        cols: List[Dict[str, int]] = []

        def on_field(fid: int, ftype: int):
            if fid == 1 and ftype == 9:  # columns: list<ColumnChunk>
                size, _ = _list_header(rd)
                for _ in range(size):
                    cols.append(parse_column_chunk())
            else:
                rd.skip(ftype)

        rd.read_struct(on_field)
        return cols

    def on_file_field(fid: int, ftype: int):
        if fid == 4 and ftype == 9:  # row_groups: list<RowGroup>
            size, _ = _list_header(rd)
            for _ in range(size):
                row_groups.append(parse_row_group())
        else:
            rd.skip(ftype)

    rd.read_struct(on_file_field)
    return row_groups


def read_page_index(path: str, rg: int, col: int,
                    num_rows: int) -> Optional[PageIndex]:
    """Parse one column chunk's page index; None when the file has none."""
    offs = _index_offsets(path)
    if rg >= len(offs) or col >= len(offs[rg]):
        return None
    o = offs[rg][col]
    if not o["ci_len"] or not o["oi_len"]:
        return None
    with open(path, "rb") as f:
        f.seek(o["ci_off"])
        ci_buf = f.read(o["ci_len"])
        f.seek(o["oi_off"])
        oi_buf = f.read(o["oi_len"])

    null_pages: List[bool] = []
    mins: List[bytes] = []
    maxs: List[bytes] = []
    null_counts: Optional[List[int]] = None
    rd = _Compact(ci_buf)

    def on_ci(fid: int, ftype: int):
        nonlocal null_counts
        if fid == 1 and ftype == 9:  # null_pages: list<bool>
            size, _ = _list_header(rd)
            for _ in range(size):
                null_pages.append(rd._byte() == 1)
        elif fid == 2 and ftype == 9:  # min_values: list<binary>
            size, _ = _list_header(rd)
            for _ in range(size):
                mins.append(_read_binary(rd))
        elif fid == 3 and ftype == 9:  # max_values
            size, _ = _list_header(rd)
            for _ in range(size):
                maxs.append(_read_binary(rd))
        elif fid == 5 and ftype == 9:  # null_counts: list<i64>
            size, _ = _list_header(rd)
            null_counts = [rd.zigzag() for _ in range(size)]
        else:
            rd.skip(ftype)

    rd.read_struct(on_ci)

    first_rows: List[int] = []
    rd2 = _Compact(oi_buf)

    def parse_page_location():
        def on_field(fid: int, ftype: int):
            if fid == 3:
                first_rows.append(rd2.zigzag())
            else:
                rd2.skip(ftype)

        rd2.read_struct(on_field)

    def on_oi(fid: int, ftype: int):
        if fid == 1 and ftype == 9:  # page_locations: list<PageLocation>
            size, _ = _list_header(rd2)
            for _ in range(size):
                parse_page_location()
        else:
            rd2.skip(ftype)

    rd2.read_struct(on_oi)
    if not first_rows or len(mins) != len(first_rows):
        return None
    return PageIndex(null_pages, mins, maxs, first_rows, null_counts)


def _decode_stat(raw: bytes, physical_type: str):
    if physical_type == "INT32":
        return struct.unpack("<i", raw)[0] if len(raw) == 4 else None
    if physical_type == "INT64":
        return struct.unpack("<q", raw)[0] if len(raw) == 8 else None
    if physical_type == "FLOAT":
        return struct.unpack("<f", raw)[0] if len(raw) == 4 else None
    if physical_type == "DOUBLE":
        return struct.unpack("<d", raw)[0] if len(raw) == 8 else None
    if physical_type == "BYTE_ARRAY":
        try:
            return raw.decode("utf-8")
        except UnicodeDecodeError:
            return None
    return None


def compute_page_masks(pf, path: str, predicate: Optional[E.Expr], rg: int
                       ) -> Tuple[Optional[np.ndarray], Dict[str, List[bool]]]:
    """For one row group: (keep-row mask over its rows, per-column page
    masks). (None, {}) when nothing can prune."""
    from datafusion_comet_tpu.io.parquet import _conjunct_triplet, _split_conjuncts

    if predicate is None:
        return None, {}
    meta = pf.metadata.row_group(rg)
    n_rows = meta.num_rows
    names = {meta.column(i).path_in_schema: i for i in range(meta.num_columns)}
    keep = np.ones(n_rows, bool)
    pruned_any = False
    for c in _split_conjuncts(predicate):
        trip = _conjunct_triplet(c)
        if trip is None:
            continue
        col_name, op, value = trip
        if col_name not in names:
            continue
        ci = names[col_name]
        idx = read_page_index(path, rg, ci, n_rows)
        if idx is None:
            continue
        pt = meta.column(ci).physical_type
        starts = idx.first_rows + [n_rows]
        for p in range(idx.num_pages()):
            if idx.null_pages and p < len(idx.null_pages) and idx.null_pages[p]:
                may = False  # all-null page can't satisfy col <op> literal
            else:
                mn = _decode_stat(idx.mins[p], pt)
                mx = _decode_stat(idx.maxs[p], pt)
                if mn is None or mx is None:
                    continue
                try:
                    if op == "eq":
                        may = mn <= value <= mx
                    elif op in ("lt", "le"):
                        may = mn < value or (op == "le" and mn <= value)
                    elif op in ("gt", "ge"):
                        may = mx > value or (op == "ge" and mx >= value)
                    else:
                        may = True
                except TypeError:
                    continue
            if not may:
                keep[starts[p]: starts[p + 1]] = False
                pruned_any = True
    if not pruned_any:
        return None, {}
    # per-column page masks: a page survives iff its row range intersects keep
    masks: Dict[str, List[bool]] = {}
    for name, ci in names.items():
        idx = read_page_index(path, rg, ci, n_rows)
        if idx is None:
            continue
        starts = idx.first_rows + [n_rows]
        masks[name] = [bool(keep[starts[p]: starts[p + 1]].any())
                       for p in range(idx.num_pages())]
    return keep, masks
