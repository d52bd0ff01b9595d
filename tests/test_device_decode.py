"""Phase-2 scan: raw page access (io/pages.py), on-device RLE/bit-packed
decode (exec/decode.py), read_parquet(device_decode=True) equivalence, and
row-filter pushdown (reference: native/core/src/parquet/read/values.rs
decoders; parquet_exec.rs with_row_filter)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec import decode
from datafusion_comet_tpu.exec.batch import to_numpy
from datafusion_comet_tpu.io import pages
from datafusion_comet_tpu.io.parquet import read_parquet
from datafusion_comet_tpu.ir import expr as E


def _write(tmp_path, vals, codec="zstd", use_dictionary=True, version="1.0",
           dtype=pa.int64()):
    t = pa.table({"x": pa.array(vals, dtype)},
                 schema=pa.schema([pa.field("x", dtype, nullable=False)]))
    p = str(tmp_path / f"one_{codec}_{use_dictionary}_{version}.parquet")
    pq.write_table(t, p, compression=None if codec == "none" else codec,
                   use_dictionary=use_dictionary, data_page_version=version)
    return p


@pytest.mark.parametrize("codec", ["none", "zstd", "snappy"])
def test_page_stream_roundtrip(tmp_path, codec):
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 50, 100000).astype(np.int64)
    p = _write(tmp_path, vals, codec=codec)
    ps = pages.read_column_pages(p, 0, 0)
    assert ps.dictionary is not None and len(ps.dictionary) == 50
    got = np.concatenate([
        ps.dictionary[pages.decode_rle_hybrid_host(d, bw, n)]
        for bw, d, n in ps.code_pages
    ])
    np.testing.assert_array_equal(got, vals)


@pytest.mark.parametrize("card", [2, 50, 1000, 100000])
def test_device_decode_matches_host(tmp_path, card):
    rng = np.random.default_rng(card)
    vals = rng.integers(0, card, 150000).astype(np.int64)
    p = _write(tmp_path, vals)
    got = np.asarray(decode.decode_column_chunk(p, 0, 0, np.dtype("<i8")))
    np.testing.assert_array_equal(got, vals)


def test_plain_pages_device(tmp_path):
    rng = np.random.default_rng(1)
    vals = rng.normal(size=60000)
    p = _write(tmp_path, vals, use_dictionary=False, dtype=pa.float64())
    got = np.asarray(decode.decode_column_chunk(p, 0, 0, np.dtype("<f8")))
    np.testing.assert_array_equal(got, vals)


def test_unpack_bits_device_all_widths():
    rng = np.random.default_rng(3)
    import jax.numpy as jnp

    for w in range(1, 31):
        n_groups = 17
        vals = rng.integers(0, 1 << w, n_groups * 8).astype(np.int64)
        # pack on host (little-endian bit order, parquet bit-packing)
        bits = np.zeros(n_groups * 8 * w, np.uint8)
        for i, v in enumerate(vals):
            for b in range(w):
                bits[i * w + b] = (v >> b) & 1
        packed = np.packbits(bits, bitorder="little").reshape(n_groups, w)
        got = np.asarray(decode.unpack_bits_device(jnp.asarray(packed), w))
        np.testing.assert_array_equal(got, vals.astype(np.int32), err_msg=f"w={w}")


def test_read_parquet_device_decode_equivalence(tmp_path):
    rng = np.random.default_rng(2)
    n = 120000
    t = pa.table({
        "k": pa.array(rng.integers(0, 100, n), pa.int64()),
        "v": pa.array(rng.normal(size=n), pa.float64()),
        "s": pa.array([f"s{i % 37}" for i in range(n)], pa.string()),
        "ni": pa.array(np.where(rng.random(n) < 0.1, None,
                                rng.integers(0, 9, n)).tolist(), pa.int64()),
    }, schema=pa.schema([
        pa.field("k", pa.int64(), nullable=False),
        pa.field("v", pa.float64(), nullable=False),
        pa.field("s", pa.string(), nullable=True),
        pa.field("ni", pa.int64(), nullable=True),
    ]))
    p = str(tmp_path / "mixed.parquet")
    pq.write_table(t, p, compression="zstd", use_dictionary=True,
                   data_page_version="1.0")
    d1 = to_numpy(read_parquet(p))
    d2 = to_numpy(read_parquet(p, device_decode=True))
    assert set(d1) == set(d2)
    for k in d1:
        np.testing.assert_array_equal(np.asarray(d1[k], object),
                                      np.asarray(d2[k], object), err_msg=k)


def test_row_filter_pushdown(tmp_path):
    rng = np.random.default_rng(4)
    n = 50000
    kk = rng.integers(0, 100, n)
    ss = np.array([f"s{i % 7}" for i in range(n)], object)
    t = pa.table({"k": pa.array(kk, pa.int64()), "s": pa.array(ss, pa.string())})
    p = str(tmp_path / "filt.parquet")
    pq.write_table(t, p, row_group_size=8192)
    pred = (E.col("k") > E.lit(50)) & (E.col("s") == E.lit("s3"))
    out = to_numpy(read_parquet(p, predicate=pred, row_filter=True))
    mask = (kk > 50) & (ss == "s3")
    np.testing.assert_array_equal(out["k"], kk[mask])
    # decimals are excluded from pushdown (scaling differs) — smoke only
    out2 = to_numpy(read_parquet(p, predicate=E.col("k") >= E.lit(0), row_filter=True))
    assert len(out2["k"]) == n


# ---------------------------------------------------------------------------
# Scan depth round 3: def levels (nullable), v2 pages, DELTA_BINARY_PACKED,
# BYTE_STREAM_SPLIT (reference: values.rs decoders)
# ---------------------------------------------------------------------------


def _write_nullable(tmp_path, vals, name, version="1.0", use_dictionary=True,
                    dtype=pa.int64(), column_encoding=None):
    t = pa.table({"x": pa.array(vals, dtype)})
    p = str(tmp_path / f"{name}.parquet")
    kw = {}
    if column_encoding is not None:
        kw["column_encoding"] = {"x": column_encoding}
        kw["use_dictionary"] = False
    else:
        kw["use_dictionary"] = use_dictionary
    pq.write_table(t, p, compression="zstd", data_page_version=version, **kw)
    return p


@pytest.mark.parametrize("version", ["1.0", "2.0"])
@pytest.mark.parametrize("use_dictionary", [True, False])
def test_nullable_def_levels(tmp_path, version, use_dictionary):
    rng = np.random.default_rng(7)
    raw = rng.integers(0, 40, 80000)
    vals = [None if rng.random() < 0.15 else int(v) for v in raw]
    p = _write_nullable(tmp_path, vals, f"null_{version}_{use_dictionary}",
                        version=version, use_dictionary=use_dictionary)
    data, valid = decode.decode_column_chunk(
        p, 0, 0, np.dtype("<i8"), with_validity=True)
    data, valid = np.asarray(data), np.asarray(valid)
    expect_valid = np.array([v is not None for v in vals])
    np.testing.assert_array_equal(valid, expect_valid)
    np.testing.assert_array_equal(
        data[valid], np.array([v for v in vals if v is not None]))


@pytest.mark.parametrize("version", ["1.0", "2.0"])
def test_delta_binary_packed(tmp_path, version):
    rng = np.random.default_rng(9)
    vals = np.cumsum(rng.integers(-50, 5000, 70000)).astype(np.int64)
    p = _write_nullable(tmp_path, vals, f"delta_{version}", version=version,
                        column_encoding="DELTA_BINARY_PACKED")
    got = np.asarray(decode.decode_column_chunk(p, 0, 0, np.dtype("<i8")))
    np.testing.assert_array_equal(got, vals)
    # host oracle agrees
    ps = pages.read_column_pages(p, 0, 0)
    assert any(pg.encoding == 5 for pg in ps.pages)


@pytest.mark.parametrize("dtype,npdt", [(pa.float32(), "<f4"), (pa.float64(), "<f8")])
def test_byte_stream_split(tmp_path, dtype, npdt):
    rng = np.random.default_rng(3)
    vals = (rng.normal(size=50000) * 1e3).astype(np.dtype(npdt))
    p = _write_nullable(tmp_path, vals, f"bss_{npdt[1:]}", dtype=dtype,
                        column_encoding="BYTE_STREAM_SPLIT")
    got = np.asarray(decode.decode_column_chunk(p, 0, 0, np.dtype(npdt)))
    np.testing.assert_array_equal(got, vals)
    ps = pages.read_column_pages(p, 0, 0)
    assert any(pg.encoding == 9 for pg in ps.pages)


def test_read_parquet_device_nullable_column(tmp_path):
    rng = np.random.default_rng(5)
    n = 30000
    a = rng.integers(0, 100, n)
    b = rng.normal(size=n)
    bn = [None if rng.random() < 0.1 else float(v) for v in b]
    t = pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(bn, pa.float64())})
    p = str(tmp_path / "mix.parquet")
    pq.write_table(t, p, compression="zstd")
    host = read_parquet(p, device_decode=False)
    dev = read_parquet(p, device_decode=True)
    h, d = to_numpy(host), to_numpy(dev)
    np.testing.assert_array_equal(h["a"], d["a"])
    np.testing.assert_array_equal(h["b__valid"], d["b__valid"])
    np.testing.assert_array_equal(h["b"][h["b__valid"]], d["b"][d["b__valid"]])
