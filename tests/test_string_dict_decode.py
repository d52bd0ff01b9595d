"""Dictionary-encoded STRING device decode (exec/decode.py
decode_string_dict_column_chunk): the code stream bit-unpacks on device,
only the tiny dictionary page is parsed + sorted on host, and the engine
keeps dict codes end-to-end (ColumnVector.dictionary). PLAIN-fallback
chunks return None and keep the pyarrow path.

Reference: BYTE_ARRAY PLAIN_DICTIONARY/RLE_DICTIONARY decode under
native/core/src/parquet/read/values.rs; the repo's scan keeps dictionaries
instead of unpacking (vs scan.rs:100)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import to_numpy
from datafusion_comet_tpu.exec.decode import (decode_string_dict_column_chunk,
                                              merge_dict_chunks)
from datafusion_comet_tpu.io.parquet import read_parquet


WORDS = ["alpha", "beta", "gamma", "", "delta-delta", "épsilon", "zz"]


def _write(tmp_path, vals, codec="zstd", version="1.0", tag="",
           use_dictionary=True, row_group_size=None):
    t = pa.table({"s": pa.array(vals, pa.string())})
    p = str(tmp_path / f"strs_{codec}_{version}{tag}.parquet")
    pq.write_table(t, p, compression=None if codec == "none" else codec,
                   data_page_version=version, use_dictionary=use_dictionary,
                   row_group_size=row_group_size)
    return p


def _decode_all(chunks_path, n_rgs, width=None):
    chunks = []
    for rg in range(n_rgs):
        got = decode_string_dict_column_chunk(chunks_path, rg, 0, width=width)
        if got is None:
            return None
        chunks.append(got)
    return merge_dict_chunks(chunks, width=width)


def _materialize(codes, valid, sdict):
    codes = np.asarray(codes); valid = np.asarray(valid)
    out = []
    for c, v in zip(codes, valid):
        if not v:
            out.append(None)
        else:
            ln = int(sdict.lengths[c])
            out.append(bytes(sdict.values[c, :ln]).decode("utf-8"))
    return out


@pytest.mark.parametrize("codec", ["none", "zstd", "snappy"])
@pytest.mark.parametrize("version", ["1.0", "2.0"])
def test_string_dict_chunk_roundtrip(tmp_path, codec, version):
    rng = np.random.default_rng(2)
    vals = [None if rng.random() < 0.1 else WORDS[int(rng.integers(len(WORDS)))]
            for _ in range(20000)]
    p = _write(tmp_path, vals, codec=codec, version=version)
    got = _decode_all(p, 1)
    assert got is not None
    assert _materialize(*got) == vals


def test_string_dict_multi_row_group_merge(tmp_path):
    rng = np.random.default_rng(4)
    vals = [WORDS[int(rng.integers(len(WORDS)))] for _ in range(9000)]
    p = _write(tmp_path, vals, row_group_size=2500, tag="_rg")
    pf = pq.ParquetFile(p)
    got = _decode_all(p, pf.metadata.num_row_groups)
    assert got is not None
    assert _materialize(*got) == vals
    # merged dictionary is sorted + deduped across chunks
    sdict = got[2]
    keys = sdict._key_list()
    assert keys == sorted(keys)


def test_plain_fallback_returns_none(tmp_path):
    vals = [f"unique-string-{i:06d}" for i in range(5000)]
    # tiny dict page limit forces PLAIN fallback pages
    t = pa.table({"s": pa.array(vals, pa.string())})
    p = str(tmp_path / "plainfb.parquet")
    pq.write_table(t, p, compression="zstd", dictionary_pagesize_limit=1024,
                   data_page_version="1.0")
    got = decode_string_dict_column_chunk(p, 0, 0)
    assert got is None  # host path takes over


def test_read_parquet_device_string_column(tmp_path):
    rng = np.random.default_rng(9)
    vals = [None if rng.random() < 0.05 else WORDS[int(rng.integers(len(WORDS)))]
            for _ in range(6000)]
    ints = rng.integers(0, 50, 6000).astype(np.int64)
    t = pa.table({"k": pa.array(ints), "s": pa.array(vals, pa.string())})
    p = str(tmp_path / "mixed_str.parquet")
    pq.write_table(t, p, compression="zstd", row_group_size=2000)
    batch = read_parquet(p, device_decode=True)
    assert [f.name for f in batch.schema.fields] == ["k", "s"]
    cv = batch.columns[1]
    assert cv.dictionary is not None, "expected dict-coded device column"
    host = to_numpy(batch)
    got = [s if ok else None
           for s, ok in zip(host["s"][: len(vals)], host["s__valid"][: len(vals)])]
    want = [v if v is not None else None for v in vals]
    # to_numpy may yield bytes or str depending on staging path
    norm = [g.decode("utf-8") if isinstance(g, bytes) else g for g in got]
    assert norm == want
    np.testing.assert_array_equal(host["k"][: len(ints)], ints)
