"""Nested (LIST) on-device Parquet decode: host rep/def level scan +
device values decode + one scatter into the padded (rows, E) plane
(exec/decode.py decode_list_column_chunk; io/pages.py rep-level streams).

Reference contract: parquet-rs decodes all nestings under
native/core/src/parquet/parquet_exec.rs:60; here the level streams (the
STRUCTURE, <=2 bits/slot) decode on host while the values stream (the
BANDWIDTH) decodes on device — closing the io/pages.py non-nested-only
scope gap."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import nested_to_py
from datafusion_comet_tpu.exec.decode import (decode_list_column_chunk,
                                              scan_list_levels)
from datafusion_comet_tpu.io import pages
from datafusion_comet_tpu.io.parquet import read_parquet


def _lists(rng, n, null_lists=True, null_elems=True, lo=0, hi=1000):
    out = []
    for i in range(n):
        r = rng.random()
        if null_lists and r < 0.1:
            out.append(None)
        elif r < 0.2:
            out.append([])
        else:
            k = int(rng.integers(1, 9))
            row = [int(v) for v in rng.integers(lo, hi, k)]
            if null_elems:
                row = [None if rng.random() < 0.15 else v for v in row]
            out.append(row)
    return out


def _write(tmp_path, vals, elem=pa.int64(), codec="zstd", version="1.0",
           use_dictionary=True, tag=""):
    t = pa.table({"x": pa.array(vals, pa.list_(elem))})
    p = str(tmp_path / f"lists_{codec}_{version}_{use_dictionary}{tag}.parquet")
    pq.write_table(t, p, compression=None if codec == "none" else codec,
                   use_dictionary=use_dictionary, data_page_version=version)
    return p


def _expect(vals):
    """Normalize to python ints/floats (nested_to_py returns np scalars)."""
    def conv(v):
        return None if v is None else (
            [None if e is None else float(e) for e in v])
    return [conv(v) for v in vals]


def _got_lists(chunk):
    counts, lvalid, plane, evplane, E = chunk
    counts = np.asarray(counts); lvalid = np.asarray(lvalid)
    plane = np.asarray(plane); evplane = np.asarray(evplane)
    out = []
    for i in range(len(counts)):
        if not lvalid[i]:
            out.append(None)
            continue
        row = []
        for j in range(int(counts[i])):
            row.append(float(plane[i, j]) if evplane[i, j] else None)
        out.append(row)
    return out


@pytest.mark.parametrize("codec", ["none", "zstd", "snappy"])
@pytest.mark.parametrize("version", ["1.0", "2.0"])
def test_list_chunk_roundtrip(tmp_path, codec, version):
    rng = np.random.default_rng(7)
    vals = _lists(rng, 5000)
    p = _write(tmp_path, vals, codec=codec, version=version)
    got = _got_lists(decode_list_column_chunk(p, 0, 0, np.dtype("<i8")))
    assert got == _expect(vals)


def test_list_plain_no_dictionary(tmp_path):
    rng = np.random.default_rng(3)
    # high-cardinality doubles force PLAIN data pages
    vals = []
    for i in range(3000):
        k = int(rng.integers(0, 6))
        vals.append([float(v) for v in rng.random(k)] if k else
                    (None if rng.random() < 0.2 else []))
    p = _write(tmp_path, vals, elem=pa.float64(), use_dictionary=False)
    got = _got_lists(decode_list_column_chunk(p, 0, 0, np.dtype("<f8")))
    exp = _expect(vals)
    for g, e in zip(got, exp):
        if e is None:
            assert g is None
        else:
            assert len(g) == len(e)
            for a, b in zip(g, e):
                assert (a is None) == (b is None)
                if a is not None:
                    assert abs(a - b) < 1e-12


def test_scan_levels_counts(tmp_path):
    vals = [[1, 2, 3], None, [], [None, 5], [7]]
    p = _write(tmp_path, vals, tag="_tiny")
    st = scan_list_levels(pages.read_column_pages(p, 0, 0))
    assert st["n_rows"] == 5
    np.testing.assert_array_equal(st["counts"], [3, 0, 0, 2, 1])
    np.testing.assert_array_equal(st["row_valid"], [True, False, True, True, True])
    np.testing.assert_array_equal(st["elem_rows"], [0, 0, 0, 3, 3, 4])
    np.testing.assert_array_equal(st["elem_pos"], [0, 1, 2, 0, 1, 0])
    np.testing.assert_array_equal(st["elem_valid_flat"],
                                  [True, True, True, False, True, True])


def test_read_parquet_device_list_column(tmp_path):
    rng = np.random.default_rng(11)
    vals = _lists(rng, 4000)
    flat = rng.integers(0, 100, 4000).astype(np.int64)
    t = pa.table({"a": pa.array(flat), "x": pa.array(vals, pa.list_(pa.int64()))})
    p = str(tmp_path / "mixed.parquet")
    pq.write_table(t, p, compression="zstd", row_group_size=1500)
    batch = read_parquet(p, device_decode=True)
    assert [f.name for f in batch.schema.fields] == ["a", "x"]
    xf = batch.schema.fields[1]
    assert xf.dtype.is_list and xf.dtype.element.type_id == "INT64"
    host = nested_to_py(batch.columns[1],
                        np.arange(len(vals)))
    norm = [None if v is None else
            [None if e is None else int(e) for e in v] for v in host]
    assert norm == vals
    np.testing.assert_array_equal(
        np.asarray(batch.columns[0].data)[: len(flat)], flat)


def test_read_parquet_device_list_respects_declared_capacity(tmp_path):
    vals = [[1, 2], [3], None, []]
    p = _write(tmp_path, vals, tag="_declared")
    schema = T.Schema([T.Field("x", T.list_(T.INT64, 8), True)])
    batch = read_parquet(p, schema=schema, device_decode=True)
    assert batch.schema.fields[0].dtype.max_elems == 8
    assert batch.columns[0].children[0].data.shape[1] == 8


# ---- STRUCT-of-primitives device decode (decode_struct_leaf_chunk) ----


def _structs(rng, n):
    out = []
    for i in range(n):
        r = rng.random()
        if r < 0.1:
            out.append(None)
        elif r < 0.2:
            out.append({"a": None, "b": float(rng.random())})
        else:
            out.append({"a": int(rng.integers(0, 1000)),
                        "b": None if rng.random() < 0.1 else float(rng.random())})
    return out


def test_read_parquet_device_struct_column(tmp_path):
    rng = np.random.default_rng(7)
    vals = _structs(rng, 3000)
    st_t = pa.struct([("a", pa.int64()), ("b", pa.float64())])
    t = pa.table({"k": pa.array(np.arange(3000, dtype=np.int64)),
                  "s": pa.array(vals, st_t)})
    p = str(tmp_path / "structs.parquet")
    pq.write_table(t, p, compression="zstd", row_group_size=1100)
    batch = read_parquet(p, device_decode=True)
    sf = next(f for f in batch.schema.fields if f.name == "s")
    assert sf.dtype.is_struct
    cv = batch.columns[[f.name for f in batch.schema.fields].index("s")]
    host = nested_to_py(cv, np.arange(len(vals)))
    norm = []
    for v in host:
        if v is None:
            norm.append(None)
        else:
            norm.append({"a": None if v["a"] is None else int(v["a"]),
                         "b": None if v["b"] is None else float(v["b"])})
    assert norm == vals


def test_read_parquet_device_struct_required(tmp_path):
    """Non-nullable struct field: struct validity must be all-true."""
    rng = np.random.default_rng(8)
    vals = [{"a": int(i), "b": float(i) / 2} for i in range(500)]
    st_t = pa.struct([pa.field("a", pa.int64(), nullable=False),
                      pa.field("b", pa.float64())])
    arr = pa.array(vals, st_t)
    t = pa.table({"s": arr})
    p = str(tmp_path / "structs_req.parquet")
    pq.write_table(t, p)
    batch = read_parquet(p, device_decode=True)
    cv = batch.columns[0]
    host = nested_to_py(cv, np.arange(len(vals)))
    got = [{"a": int(v["a"]), "b": float(v["b"])} for v in host]
    assert got == vals


# ---- LIST<string> device decode (decode_list_string_column_chunk) ----


def _str_lists(rng, n):
    words = [f"w{i:03d}" for i in range(40)]
    out = []
    for i in range(n):
        r = rng.random()
        if r < 0.1:
            out.append(None)
        elif r < 0.2:
            out.append([])
        else:
            k = int(rng.integers(1, 6))
            out.append([None if rng.random() < 0.15
                        else words[int(rng.integers(0, 40))]
                        for _ in range(k)])
    return out


def test_read_parquet_device_list_string(tmp_path):
    rng = np.random.default_rng(9)
    vals = _str_lists(rng, 2500)
    t = pa.table({"x": pa.array(vals, pa.list_(pa.string()))})
    p = str(tmp_path / "strlists.parquet")
    pq.write_table(t, p, compression="zstd", row_group_size=900)
    batch = read_parquet(p, device_decode=True)
    f = batch.schema.fields[0]
    assert f.dtype.is_list and f.dtype.element.is_binary
    host = nested_to_py(batch.columns[0], np.arange(len(vals)))
    norm = [None if v is None else
            [None if e is None else (e.decode() if isinstance(e, bytes) else str(e))
             for e in v]
            for v in host]
    assert norm == vals


def test_read_parquet_device_list_string_declared_width(tmp_path):
    vals = [["aa", "bb"], None, [], ["cc"]]
    t = pa.table({"x": pa.array(vals, pa.list_(pa.string()))})
    p = str(tmp_path / "strlists_decl.parquet")
    pq.write_table(t, p)
    schema = T.Schema([T.Field("x", T.list_(T.string(8), 4), True)])
    batch = read_parquet(p, schema=schema, device_decode=True)
    elem = batch.columns[0].children[0]
    assert elem.data.shape[1] == 4 and elem.data.shape[2] == 8


# ---- MAP<primitive, primitive> device decode (io/parquet.py _map_cv) ----


def _maps(rng, n):
    out = []
    for i in range(n):
        r = rng.random()
        if r < 0.1:
            out.append(None)
        elif r < 0.2:
            out.append({})
        else:
            k = int(rng.integers(1, 6))
            keys = rng.choice(100, size=k, replace=False)
            out.append({int(kk): (None if rng.random() < 0.15
                                  else float(rng.random()))
                        for kk in keys})
    return out


def test_read_parquet_device_map_column(tmp_path):
    rng = np.random.default_rng(11)
    vals = _maps(rng, 2500)
    arr = pa.array([None if v is None else list(v.items()) for v in vals],
                   pa.map_(pa.int64(), pa.float64()))
    t = pa.table({"k": pa.array(np.arange(2500, dtype=np.int64)), "m": arr})
    p = str(tmp_path / "maps.parquet")
    pq.write_table(t, p, compression="zstd", row_group_size=900)
    batch = read_parquet(p, device_decode=True)
    mf = next(f for f in batch.schema.fields if f.name == "m")
    assert mf.dtype.is_map
    cv = batch.columns[[f.name for f in batch.schema.fields].index("m")]
    host = nested_to_py(cv, np.arange(len(vals)))
    assert host == vals


def test_read_parquet_device_map_declared_capacity(tmp_path):
    vals = [{1: 2.0, 3: 4.0}, None, {}, {9: None}]
    arr = pa.array([None if v is None else list(v.items()) for v in vals],
                   pa.map_(pa.int64(), pa.float64()))
    t = pa.table({"m": arr})
    p = str(tmp_path / "maps_decl.parquet")
    pq.write_table(t, p)
    schema = T.Schema([T.Field("m", T.map_(T.INT64, T.FLOAT64, 8), True)])
    batch = read_parquet(p, schema=schema, device_decode=True)
    cv = batch.columns[0]
    assert cv.children[0].children[0].data.shape[1] == 8
    host = nested_to_py(cv, np.arange(len(vals)))
    assert host == vals


def test_read_parquet_device_map_key_sorted(tmp_path):
    """Entries written key-DESCENDING must come back key-sorted (the
    engine's map normalization, types.py map_)."""
    items = [[(5, 1.0), (3, 2.0), (1, 3.0)], [(9, 0.5), (2, 0.25)]]
    arr = pa.array(items, pa.map_(pa.int64(), pa.float64()))
    t = pa.table({"m": arr})
    p = str(tmp_path / "maps_sort.parquet")
    pq.write_table(t, p)
    batch = read_parquet(p, device_decode=True)
    cv = batch.columns[0]
    keys = np.asarray(cv.children[0].children[0].data)
    assert list(keys[0][:3]) == [1, 3, 5]
    assert list(keys[1][:2]) == [2, 9]
    host = nested_to_py(cv, np.arange(2))
    assert host == [dict(it) for it in items]
