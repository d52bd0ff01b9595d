"""Parquet scan/write tests: round-trip, projection, row-group pruning,
schema evolution (missing column → nulls). Reference behaviors:
parquet_exec.rs (pruning), schema_adapter.rs (evolution)."""

import numpy as np
import pytest

pa = pytest.importorskip("pyarrow")
import pyarrow.parquet as pq  # noqa: E402

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import to_numpy
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.io.parquet import read_parquet, write_parquet
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P


@pytest.fixture
def pq_file(tmp_path):
    tbl = pa.table(
        {
            "a": pa.array(np.arange(100, dtype=np.int64)),
            "b": pa.array(np.arange(100) * 0.5),
            "s": pa.array([f"row{i}" for i in range(100)]),
            "d": pa.array([np.int32(10 + i) for i in range(100)], pa.date32()),
            "dec": pa.array([i * 25 for i in range(100)], pa.decimal128(10, 2)),
        }
    )
    path = str(tmp_path / "t.parquet")
    pq.write_table(tbl, path, row_group_size=25)
    return path


class TestParquetRead:
    def test_roundtrip(self, pq_file):
        b = read_parquet(pq_file)
        out = to_numpy(b)
        np.testing.assert_array_equal(out["a"], np.arange(100))
        np.testing.assert_allclose(out["b"], np.arange(100) * 0.5)
        assert out["s"][3] == "row3"
        np.testing.assert_array_equal(out["d"], 10 + np.arange(100))
        # decimal(10,2): arrow value i*25 at scale 2 → scaled int i*2500
        np.testing.assert_array_equal(out["dec"], np.arange(100) * 2500)

    def test_projection(self, pq_file):
        b = read_parquet(pq_file, columns=["a", "s"])
        assert b.schema.names == ["a", "s"]

    def test_row_group_pruning(self, pq_file):
        # 4 row groups of 25 rows; predicate a >= 80 keeps only the last
        b = read_parquet(pq_file, predicate=E.col("a") >= E.lit(80, T.INT64))
        out = to_numpy(b)
        assert len(out["a"]) == 25  # one row group survives pruning
        assert out["a"].min() == 75

    def test_missing_column_nulls(self, pq_file):
        schema = T.Schema(
            [T.Field("a", T.INT64), T.Field("zz", T.FLOAT64, nullable=True)]
        )
        b = read_parquet(pq_file, schema=schema)
        out = to_numpy(b)
        assert not out["zz__valid"].any()

    def test_scan_in_query(self, pq_file):
        sess = Session()
        sess.register_parquet("t", pq_file)
        plan = (
            P.Scan("t", sess.table_schema("t"))
            .filter(E.col("a") < 10)
            .aggregate([], [E.AggExpr("sum", E.col("a"), "sa")])
        )
        plan.max_groups = 8
        out = sess.collect(plan)
        assert out["sa"][0] == sum(range(10))


class TestParquetWrite:
    def test_write_read_roundtrip(self, pq_file, tmp_path):
        b = read_parquet(pq_file)
        out_path = str(tmp_path / "out.parquet")
        write_parquet(b, out_path)
        b2 = read_parquet(out_path)
        a1, a2 = to_numpy(b), to_numpy(b2)
        np.testing.assert_array_equal(a1["a"], a2["a"])
        np.testing.assert_array_equal(a1["dec"], a2["dec"])
        assert list(a1["s"]) == list(a2["s"])


def test_partitioned_write_commit_protocol(tmp_path):
    import os

    import numpy as np

    from datafusion_comet_tpu import types as T
    from datafusion_comet_tpu.exec.batch import from_numpy
    from datafusion_comet_tpu.io.parquet import read_parquet, write_parquet_partitioned

    schema = T.Schema([
        T.Field("g", T.string(4)),
        T.Field("x", T.INT64),
    ])
    data = {"g": ["a", "b", "a", "b", "a"], "x": np.arange(5, dtype=np.int64)}
    b = from_numpy(data, schema)
    root = str(tmp_path / "out")
    paths = write_parquet_partitioned(b, root, ["g"])
    assert sorted(os.path.relpath(p, root) for p in paths) == [
        "g=a/part-00000.parquet", "g=b/part-00000.parquet"
    ]
    assert not os.path.exists(os.path.join(root, "_temporary"))
    from datafusion_comet_tpu.exec.batch import to_numpy

    back = to_numpy(read_parquet(os.path.join(root, "g=a", "part-00000.parquet")))
    assert sorted(back["x"]) == [0, 2, 4]


def test_read_partitioned_dataset_with_partition_values(tmp_path):
    import os

    import numpy as np

    from datafusion_comet_tpu import types as T
    from datafusion_comet_tpu.exec.batch import from_numpy, to_numpy
    from datafusion_comet_tpu.io.parquet import read_parquet, write_parquet_partitioned

    schema = T.Schema([T.Field("g", T.string(4)), T.Field("x", T.INT64)])
    data = {"g": ["a", "b", "a"], "x": np.array([1, 2, 3], np.int64)}
    root = str(tmp_path / "pt")
    write_parquet_partitioned(from_numpy(data, schema), root, ["g"])
    out = to_numpy(read_parquet(root))
    pairs = sorted(zip(out["g"], out["x"]))
    assert pairs == [("a", 1), ("a", 3), ("b", 2)]


def test_modular_encryption_roundtrip(tmp_path):
    """Parquet modular encryption (reference: encryption_support.rs):
    encrypted footer + per-column keys; wrong/missing keys must fail."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from datafusion_comet_tpu.io.parquet import (
        _decryption_properties, encryption_properties, read_parquet)

    footer = b"0123456789abcdef"
    colkey = b"fedcba9876543210"
    tbl = pa.table({"a": pa.array(np.arange(32, dtype=np.int64)),
                    "b": pa.array([f"s{i}" for i in range(32)])})
    path = str(tmp_path / "enc.parquet")
    props = encryption_properties(footer, {"a": colkey})
    with pq.ParquetWriter(path, tbl.schema, encryption_properties=props) as w:
        w.write_table(tbl)

    # unreadable without keys
    with pytest.raises(Exception):
        pq.ParquetFile(path).read()

    dec = {"footer_key": footer, "column_keys": {"a": colkey}}
    out = read_parquet(path, decryption=dec)
    from datafusion_comet_tpu.exec.batch import to_numpy

    cols = to_numpy(out)
    assert list(cols["a"]) == list(range(32))
    assert cols["b"][5] == "s5"

    # wrong footer key fails
    with pytest.raises(Exception):
        read_parquet(path, decryption={"footer_key": b"x" * 16,
                                       "column_keys": {"a": colkey}})
