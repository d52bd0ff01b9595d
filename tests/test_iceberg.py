"""Iceberg scan: avro codec round-trip + full table-layout walk with
snapshots and v2 position deletes (reference: iceberg_scan.rs +
CometIcebergNativeScan; fixture builds a real Iceberg v2 directory layout
with our own Avro writer — which also exercises the write path)."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import to_numpy
from datafusion_comet_tpu.io.avro import read_avro, write_avro
from datafusion_comet_tpu.io.iceberg import iceberg_plan_files, read_iceberg


class TestAvro:
    SCHEMA = {
        "type": "record", "name": "r", "fields": [
            {"name": "i", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "xs", "type": {"type": "array", "items": "int"}},
            {"name": "m", "type": {"type": "map", "values": "double"}},
            {"name": "nested", "type": {"type": "record", "name": "n", "fields": [
                {"name": "b", "type": "boolean"},
                {"name": "raw", "type": "bytes"},
            ]}},
        ],
    }
    RECORDS = [
        {"i": -1, "s": "hello", "xs": [1, -2, 3], "m": {"a": 1.5}, "nested": {"b": True, "raw": b"\x00\xff"}},
        {"i": 2**40, "s": None, "xs": [], "m": {}, "nested": {"b": False, "raw": b""}},
    ]

    @pytest.mark.parametrize("codec", ["null", "deflate"])
    def test_roundtrip(self, tmp_path, codec):
        p = str(tmp_path / "t.avro")
        write_avro(p, self.SCHEMA, self.RECORDS, codec=codec)
        got, meta = read_avro(p)
        assert got == self.RECORDS
        assert meta["avro.codec"].decode() == codec


# ---- Iceberg fixture --------------------------------------------------------------

MANIFEST_ENTRY_SCHEMA = {
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "data_file", "type": {"type": "record", "name": "data_file", "fields": [
            {"name": "content", "type": "int"},
            {"name": "file_path", "type": "string"},
            {"name": "file_format", "type": "string"},
            {"name": "record_count", "type": "long"},
            {"name": "file_size_in_bytes", "type": "long"},
        ]}},
    ],
}

MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "added_snapshot_id", "type": ["null", "long"]},
    ],
}


def build_table(root, with_deletes=False, second_snapshot=False,
                with_eq_deletes=False, eq_seq=None):
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)

    def write_data(name, ids, vals):
        path = os.path.join(root, "data", name)
        pq.write_table(pa.table({"id": pa.array(ids, pa.int64()),
                                 "v": pa.array(vals, pa.string())}), path)
        return path

    f1 = write_data("f1.parquet", [1, 2, 3], ["a", "b", "c"])
    f2 = write_data("f2.parquet", [4, 5], ["d", "e"])

    def manifest(name, files, content=0):
        entries = [
            {"status": 1, "snapshot_id": 10,
             "data_file": {"content": content, "file_path": p, "file_format": "PARQUET",
                           "record_count": 0, "file_size_in_bytes": os.path.getsize(p)}}
            for p in files
        ]
        mp = os.path.join(root, "metadata", name)
        write_avro(mp, MANIFEST_ENTRY_SCHEMA, entries)
        return mp

    m1 = manifest("m1.avro", [f1, f2])
    snapshots = []
    ml1 = os.path.join(root, "metadata", "snap-10.avro")
    write_avro(ml1, MANIFEST_LIST_SCHEMA,
               [{"manifest_path": m1, "manifest_length": os.path.getsize(m1), "added_snapshot_id": 10}])
    snapshots.append({"snapshot-id": 10, "manifest-list": ml1})
    current = 10

    if with_deletes or second_snapshot or with_eq_deletes:
        mans = [m1]
        if with_eq_deletes:
            epath = os.path.join(root, "data", "eqdel1.parquet")
            # delete every row whose v is 'b' or 'e' (equality columns = [v])
            pq.write_table(pa.table({"v": pa.array(["b", "e"], pa.string())}), epath)
            entries = [{"status": 1, "snapshot_id": 11,
                        "data_file": {"content": 2, "file_path": epath,
                                      "file_format": "PARQUET", "record_count": 2,
                                      "file_size_in_bytes": os.path.getsize(epath)}}]
            mp = os.path.join(root, "metadata", "meq.avro")
            write_avro(mp, MANIFEST_ENTRY_SCHEMA, entries)
            mans.append(mp)
        if with_deletes:
            dpath = os.path.join(root, "data", "del1.parquet")
            pq.write_table(pa.table({
                "file_path": pa.array([f1, f2], pa.string()),
                "pos": pa.array([1, 0], pa.int64()),   # drop (f1 row1='b', f2 row0='d')
            }), dpath)
            mans.append(manifest("m2.avro", [dpath], content=1))
        if second_snapshot:
            f3 = write_data("f3.parquet", [6], ["f"])
            mans.append(manifest("m3.avro", [f3]))
        ml2 = os.path.join(root, "metadata", "snap-11.avro")
        write_avro(ml2, MANIFEST_LIST_SCHEMA,
                   [{"manifest_path": m, "manifest_length": os.path.getsize(m), "added_snapshot_id": 11}
                    for m in mans])
        snapshots.append({"snapshot-id": 11, "manifest-list": ml2})
        current = 11

    meta = {
        "format-version": 2,
        "table-uuid": "0000",
        "location": root,
        "current-snapshot-id": current,
        "snapshots": snapshots,
    }
    with open(os.path.join(root, "metadata", "v2.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as f:
        f.write("2")
    return root


class TestIceberg:
    def test_plan_files(self, tmp_path):
        root = build_table(str(tmp_path / "t"))
        data, dels, eq_dels = iceberg_plan_files(root)
        assert len(data) == 2 and dels == [] and eq_dels == []

    def test_read_basic(self, tmp_path):
        root = build_table(str(tmp_path / "t"))
        b = read_iceberg(root)
        out = to_numpy(b)
        assert sorted(out["id"]) == [1, 2, 3, 4, 5]
        assert sorted(out["v"]) == ["a", "b", "c", "d", "e"]

    def test_position_deletes(self, tmp_path):
        root = build_table(str(tmp_path / "t"), with_deletes=True)
        out = to_numpy(read_iceberg(root))
        assert sorted(out["v"]) == ["a", "c", "e"]  # 'b' and 'd' deleted

    def test_snapshot_selection(self, tmp_path):
        root = build_table(str(tmp_path / "t"), second_snapshot=True)
        out_new = to_numpy(read_iceberg(root))
        assert sorted(out_new["id"]) == [1, 2, 3, 4, 5, 6]
        out_old = to_numpy(read_iceberg(root, snapshot_id=10))  # time travel
        assert sorted(out_old["id"]) == [1, 2, 3, 4, 5]

    def test_projection(self, tmp_path):
        root = build_table(str(tmp_path / "t"))
        b = read_iceberg(root, projection=["id"])
        assert b.schema.names == ["id"]

    def test_query_over_iceberg(self, tmp_path):
        from datafusion_comet_tpu.exec.engine import Session
        from datafusion_comet_tpu.ir import expr as E
        from datafusion_comet_tpu.ir import plan as P

        root = build_table(str(tmp_path / "t"), with_deletes=True)
        s = Session()
        s.tables["ice"] = read_iceberg(root)
        schema = s.table_schema("ice")
        out = s.collect(P.Scan("ice", schema).filter(E.col("id") > E.lit(1)).project([E.col("v")]))
        assert sorted(out["v"]) == ["c", "e"]


    def test_equality_deletes(self, tmp_path):
        root = build_table(str(tmp_path / "t"), with_eq_deletes=True)
        out = to_numpy(read_iceberg(root))
        assert sorted(out["v"]) == ["a", "c", "d"]  # 'b' and 'e' equality-deleted

    def test_equality_and_position_deletes(self, tmp_path):
        root = build_table(str(tmp_path / "t"), with_deletes=True, with_eq_deletes=True)
        out = to_numpy(read_iceberg(root))
        # position deletes drop 'b','d'; equality deletes drop 'b','e'
        assert sorted(out["v"]) == ["a", "c"]

    def test_equality_deletes_with_projection(self, tmp_path):
        # equality column 'v' projected out: reader must re-read it
        root = build_table(str(tmp_path / "t"), with_eq_deletes=True)
        out = to_numpy(read_iceberg(root, projection=["id"]))
        assert sorted(out["id"]) == [1, 3, 4]  # ids of 'b'(2) and 'e'(5) dropped


class TestIcebergWrite:
    """Write + commit (IcebergWriteExec/IcebergCommitExec analog): append
    snapshots through the real on-disk metadata chain, read back with the
    scan half, time-travel to the pre-write snapshot."""

    def _data(self, lo, hi):
        return {
            "id": np.arange(lo, hi, dtype=np.int64),
            "v": np.arange(lo, hi, dtype=np.float64) * 0.5,
            "name": np.array([f"row{i}" for i in range(lo, hi)]),
        }

    def test_write_read_roundtrip_and_time_travel(self, tmp_path):
        from datafusion_comet_tpu.exec.batch import to_numpy
        from datafusion_comet_tpu.io.iceberg import load_table_metadata, read_iceberg
        from datafusion_comet_tpu.io.iceberg_write import write_iceberg

        table = str(tmp_path / "t1")
        schema = T.Schema([
            T.Field("id", T.INT64, False),
            T.Field("v", T.FLOAT64, False),
            T.Field("name", T.string(8), False),
        ])
        snap1 = write_iceberg(table, self._data(0, 100), schema)
        snap2 = write_iceberg(table, self._data(100, 150), schema)
        assert snap1 != snap2

        out = to_numpy(read_iceberg(table, schema=schema))
        assert sorted(out["id"].tolist()) == list(range(150))
        # time travel: the pre-append snapshot sees only the first 100 rows
        old = to_numpy(read_iceberg(table, schema=schema, snapshot_id=snap1))
        assert sorted(old["id"].tolist()) == list(range(100))

        meta = load_table_metadata(table)
        assert meta["current-snapshot-id"] == snap2
        assert [s["snapshot-id"] for s in meta["snapshots"]] == [snap1, snap2]
        assert len(meta["snapshot-log"]) == 2
        assert meta["snapshots"][1]["parent-snapshot-id"] == snap1
        assert meta["last-sequence-number"] == 2

    def test_nullable_column_roundtrip(self, tmp_path):
        from datafusion_comet_tpu.exec.batch import to_numpy
        from datafusion_comet_tpu.io.iceberg import read_iceberg
        from datafusion_comet_tpu.io.iceberg_write import write_iceberg

        table = str(tmp_path / "t2")
        schema = T.Schema([T.Field("id", T.INT64, False),
                           T.Field("x", T.FLOAT64, True)])
        data = {"id": np.arange(10, dtype=np.int64),
                "x": np.arange(10, dtype=np.float64),
                "x__valid": np.array([i % 3 != 0 for i in range(10)])}
        write_iceberg(table, data, schema)
        out = to_numpy(read_iceberg(table, schema=schema))
        np.testing.assert_array_equal(
            np.sort(out["x"][out["x__valid"]]),
            np.array([v for i, v in enumerate(np.arange(10.0)) if i % 3 != 0]))

    def test_create_mode_refuses_existing(self, tmp_path):
        from datafusion_comet_tpu.io.iceberg_write import write_iceberg

        table = str(tmp_path / "t3")
        schema = T.Schema([T.Field("id", T.INT64, False)])
        write_iceberg(table, {"id": np.arange(3, dtype=np.int64)}, schema)
        with pytest.raises(FileExistsError):
            write_iceberg(table, {"id": np.arange(3, dtype=np.int64)}, schema,
                          mode="create")

    def test_concurrent_commit_collision(self, tmp_path):
        """Losing committer gets FileExistsError from the O_EXCL metadata
        version create (optimistic concurrency)."""
        import os

        from datafusion_comet_tpu.io.iceberg_write import append, create_table

        table = str(tmp_path / "t4")
        schema = T.Schema([T.Field("id", T.INT64, False)])
        create_table(table, schema)
        # simulate a racing committer that already produced v2
        with open(os.path.join(table, "metadata", "v2.metadata.json"), "x") as f:
            f.write("{}")
        os.remove(os.path.join(table, "metadata", "v2.metadata.json"))
        append(table, {"id": np.arange(2, dtype=np.int64)})  # normal path ok
        with open(os.path.join(table, "metadata", "v3.metadata.json"), "x") as f:
            f.write('{"snapshots": []}')
        with pytest.raises(FileExistsError):
            append(table, {"id": np.arange(2, dtype=np.int64)})
