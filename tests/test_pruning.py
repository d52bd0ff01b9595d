"""Column pruning pass (Catalyst ColumnPruning → scan projection analog)."""

import numpy as np

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P
from datafusion_comet_tpu.ir.pruning import prune_columns
from datafusion_comet_tpu.models import tpch


def scans(plan):
    if isinstance(plan, P.Scan):
        yield plan
    for c in plan.children():
        yield from scans(c)


def test_q3_scans_pruned():
    pruned = prune_columns(tpch.q3())
    by_table = {s.table: s.projection for s in scans(pruned)}
    assert by_table["lineitem"] is not None
    assert set(by_table["lineitem"]) <= {
        "l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"
    }
    assert by_table["customer"] is not None
    assert set(by_table["customer"]) <= {"c_custkey", "c_mktsegment"}


def test_q1_lineitem_pruned():
    pruned = prune_columns(tpch.q1())
    (scan,) = [s for s in scans(pruned) if s.table == "lineitem"]
    assert scan.projection is not None
    assert len(scan.projection) <= 7  # q1 touches 7 lineitem columns


def test_results_identical_with_pruning():
    data = {t: tpch.generate_table(t, 0.002) for t in tpch.SCHEMAS}
    for q in ("q1", "q3", "q6", "q14", "q18"):
        s = Session()
        for t, cols in data.items():
            s.register_numpy(t, cols, tpch.SCHEMAS[t])
        out = s.collect(tpch.QUERIES[q]())  # pruning applied in compile
        pruned_manual = prune_columns(tpch.QUERIES[q]())
        s2 = Session()
        for t, cols in data.items():
            s2.register_numpy(t, cols, tpch.SCHEMAS[t])
        out2 = s2.collect(pruned_manual)
        for k in out:
            np.testing.assert_array_equal(out[k], out2[k])


def test_count_star_keeps_one_column():
    schema = T.Schema([T.Field("a", T.INT64), T.Field("b", T.string(8))])
    plan = P.Scan("t", schema).aggregate([], [E.AggExpr("count", None, "c")])
    pruned = prune_columns(plan)
    (scan,) = scans(pruned)
    assert scan.projection == ("a",)
    s = Session()
    s.register_numpy("t", {"a": np.arange(5, dtype=np.int64), "b": list("abcde")}, schema)
    assert int(s.collect(plan)["c"][0]) == 5


class TestPageIndexPruning:
    """Page-level pruning via the hand-parsed ColumnIndex/OffsetIndex
    (reference: eager_page_index_reader_factory.rs)."""

    def _file(self, tmp_path, n=200_000):
        import pyarrow as pa
        import pyarrow.parquet as pq

        sorted_col = np.arange(n, dtype=np.int64)
        other = np.arange(n, dtype=np.float64) * 0.5
        t = pa.table({"k": pa.array(sorted_col), "v": pa.array(other)})
        p = str(tmp_path / "pidx.parquet")
        pq.write_table(t, p, compression="zstd", write_page_index=True,
                       data_page_size=16_384, row_group_size=n)
        return p, sorted_col, other

    def test_page_masks_prune_sorted_column(self, tmp_path):
        import pyarrow.parquet as pq

        from datafusion_comet_tpu.io.pageindex import compute_page_masks, read_page_index

        p, k, v = self._file(tmp_path)
        pf = pq.ParquetFile(p)
        idx = read_page_index(p, 0, 0, len(k))
        assert idx is not None and idx.num_pages() > 4
        pred = E.bind((E.col("k") >= E.lit(150_000, T.INT64)),
                      T.Schema([T.Field("k", T.INT64), T.Field("v", T.FLOAT64)]))
        keep, masks = compute_page_masks(pf, p, pred, 0)
        assert keep is not None
        assert keep.sum() < len(k)  # some rows pruned
        assert not all(masks["k"])  # some pages skipped
        assert keep[-1] and not keep[0]

    def test_device_read_with_predicate_matches_host(self, tmp_path):
        from datafusion_comet_tpu.exec.batch import to_numpy
        from datafusion_comet_tpu.io.parquet import read_parquet

        p, k, v = self._file(tmp_path, n=120_000)
        pred = (E.col("k") >= E.lit(100_000, T.INT64))
        dev = read_parquet(p, predicate=pred, device_decode=True)
        got = to_numpy(dev)
        want = k >= 100_000
        np.testing.assert_array_equal(np.sort(got["k"]), k[want])
        np.testing.assert_allclose(np.sort(got["v"]), np.sort(v[want]))

    def test_no_page_index_still_correct(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from datafusion_comet_tpu.exec.batch import to_numpy
        from datafusion_comet_tpu.io.parquet import read_parquet

        n = 50_000
        kcol = np.arange(n, dtype=np.int64)
        t = pa.table({"k": pa.array(kcol)})
        p = str(tmp_path / "noidx.parquet")
        pq.write_table(t, p, write_page_index=False)
        pred = (E.col("k") < E.lit(1000, T.INT64))
        got = to_numpy(read_parquet(p, predicate=pred, device_decode=True))
        np.testing.assert_array_equal(np.sort(got["k"]), np.arange(1000))


class TestBloomFilterPruning:
    """SBBF row-group pruning (reference: bloom pruning runs whenever filter
    pushdown is on; parquet spec BloomFilter.md split-block filter)."""

    def test_xxhash64_reference_vectors(self):
        from datafusion_comet_tpu.io.bloom import xxhash64

        # spec/reference vectors (xxhash64 seed 0)
        assert xxhash64(b"") == 0xEF46DB3751D8E999
        assert xxhash64(b"a") == 0xD24EC4F1A98C6E5B
        assert xxhash64(b"abc") == 0x44BC2CF5AD770999
        assert xxhash64(b"0123456789abcdef0123456789abcdef") == xxhash64(
            b"0123456789abcdef0123456789abcdef")

    def test_sbbf_insert_check_roundtrip(self):
        """Spec-level self-consistency: values inserted per the parquet SBBF
        algorithm are always found; absent values are (almost) all rejected.
        (pyarrow 25 cannot WRITE bloom filters, so the bitset is built here
        with the same spec mask; the file-reader path is covered by the
        no-bloom passthrough test below.)"""
        import struct as _s

        from datafusion_comet_tpu.io.bloom import (
            _SALT,
            sbbf_might_contain,
            xxhash64,
        )

        num_blocks = 32
        words = [0] * (num_blocks * 8)

        def insert(h):
            blk = ((h >> 32) * num_blocks) >> 32
            h32 = h & 0xFFFFFFFF
            for i in range(8):
                bit = ((h32 * _SALT[i]) & 0xFFFFFFFF) >> 27
                words[blk * 8 + i] |= 1 << bit

        present = [_s.pack("<q", v) for v in range(0, 2000, 2)]
        for enc in present:
            insert(xxhash64(enc))
        bitset = b"".join(_s.pack("<I", w) for w in words)
        for enc in present:
            assert sbbf_might_contain(bitset, xxhash64(enc))
        absent = [_s.pack("<q", v) for v in range(100001, 104001, 2)]
        fp = sum(sbbf_might_contain(bitset, xxhash64(e)) for e in absent)
        assert fp < len(absent) * 0.1, f"false-positive rate too high: {fp}"

    def test_no_bloom_written_keeps_all(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from datafusion_comet_tpu.io.parquet import prune_row_groups

        t = pa.table({"id": pa.array(np.arange(100, dtype=np.int64))})
        p = str(tmp_path / "nobloom.parquet")
        pq.write_table(t, p)
        pf = pq.ParquetFile(p)
        kept = prune_row_groups(pf, (E.col("id") == E.lit(5, T.INT64)), path=p)
        assert kept == [0]
