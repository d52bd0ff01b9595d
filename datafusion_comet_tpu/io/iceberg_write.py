"""Iceberg table write + commit: create / append snapshots.

Reference contract: IcebergWriteExec + IcebergCommitExec and the
IcebergWriteStrategy planner hook (CometSparkSessionExtensions.scala:103) —
the reference writes data files natively and commits through Iceberg's
catalog API. This TPU-first phase targets the filesystem (hadoop-style)
table layout the scan half already reads (io/iceberg.py): parquet data
files under ``data/``, spec-shaped Avro manifests + manifest list written
by the from-scratch writer (io/avro.py), a new snapshot appended to
``metadata/vN.metadata.json``, and ``version-hint.text`` bumped — so a
write→read roundtrip (including time travel to the pre-write snapshot)
goes through the real on-disk metadata chain.

Commit protocol: optimistic single-writer — the new metadata version file
is created with O_EXCL (atomic on POSIX); a concurrent committer losing
the race gets FileExistsError and retries against the fresh metadata.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any, Dict, List, Optional

import numpy as np

from datafusion_comet_tpu import types as T

__all__ = ["create_table", "append", "write_iceberg"]


def _iceberg_type(dt: T.DataType) -> Any:
    if dt.is_boolean:
        return "boolean"
    if dt.type_id in ("INT8", "INT16", "INT32"):
        return "int"
    if dt.type_id == "INT64":
        return "long"
    if dt == T.FLOAT32:
        return "float"
    if dt == T.FLOAT64:
        return "double"
    if dt.type_id == "DATE":
        return "date"
    if dt.type_id == "TIMESTAMP":
        return "timestamptz"
    if dt.type_id == "TIMESTAMP_NTZ":
        return "timestamp"
    if dt.is_decimal:
        return f"decimal({dt.precision}, {dt.scale})"
    if dt.type_id == "STRING":
        return "string"
    if dt.type_id == "BYTES":
        return "binary"
    raise NotImplementedError(f"iceberg type for {dt!r}")


def _schema_json(schema: T.Schema) -> Dict[str, Any]:
    fields = []
    for i, f in enumerate(schema.fields, start=1):
        fields.append({"id": i, "name": f.name, "required": not f.nullable,
                       "type": _iceberg_type(f.dtype)})
    return {"type": "struct", "schema-id": 0, "fields": fields}


# Avro schemas per the Iceberg spec (field-id properties preserved for
# interop; the subset of optional stats columns is omitted — readers treat
# them as absent).
_DATA_FILE_SCHEMA = {
    "type": "record", "name": "r2", "fields": [
        {"name": "content", "type": "int", "field-id": 134},
        {"name": "file_path", "type": "string", "field-id": 100},
        {"name": "file_format", "type": "string", "field-id": 101},
        {"name": "partition", "type": {"type": "record", "name": "r102",
                                       "fields": []}, "field-id": 102},
        {"name": "record_count", "type": "long", "field-id": 103},
        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
    ],
}

_MANIFEST_ENTRY_SCHEMA = {
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"], "field-id": 3},
        {"name": "file_sequence_number", "type": ["null", "long"], "field-id": 4},
        {"name": "data_file", "type": _DATA_FILE_SCHEMA, "field-id": 2},
    ],
}

_MANIFEST_FILE_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}


def _now_ms() -> int:
    return int(time.time() * 1000)


def create_table(table_path: str, schema: T.Schema,
                 properties: Optional[Dict[str, str]] = None) -> None:
    """Create an empty Iceberg v2 table (filesystem layout)."""
    meta_dir = os.path.join(table_path, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    os.makedirs(os.path.join(table_path, "data"), exist_ok=True)
    meta = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid4()),
        "location": table_path,
        "last-sequence-number": 0,
        "last-updated-ms": _now_ms(),
        "last-column-id": len(schema.fields),
        "current-schema-id": 0,
        "schemas": [_schema_json(schema)],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": properties or {},
        "current-snapshot-id": -1,
        "snapshots": [],
        "snapshot-log": [],
        "metadata-log": [],
    }
    path = os.path.join(meta_dir, "v1.metadata.json")
    with open(path, "x") as f:  # O_EXCL: creating an existing table fails
        json.dump(meta, f, indent=2)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write("1")


def append(table_path: str, data: Dict[str, np.ndarray],
           schema: Optional[T.Schema] = None) -> int:
    """Append one snapshot of rows; returns the new snapshot id.

    Writes: one parquet data file → one manifest (Avro, spec field-ids) →
    a new manifest list carrying ALL live manifests (append semantics) →
    vN+1.metadata.json committed with O_EXCL + version-hint bump."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datafusion_comet_tpu.io.avro import write_avro
    from datafusion_comet_tpu.io.iceberg import load_table_metadata, _resolve_path

    meta = load_table_metadata(table_path)
    version = _current_version(table_path)
    seq = int(meta.get("last-sequence-number", 0)) + 1
    snap_id = int.from_bytes(os.urandom(7), "big")  # positive 56-bit id
    parent = meta.get("current-snapshot-id")
    parent = None if parent in (None, -1) else parent

    # 1. data file
    arrays = {k: pa.array(np.asarray(v)) for k, v in data.items()
              if not k.endswith("__valid")}
    for k in list(arrays):
        vk = data.get(k + "__valid")
        if vk is not None:
            arrays[k] = pa.array([
                None if not ok else val
                for ok, val in zip(vk, np.asarray(data[k]).tolist())])
    tbl = pa.table(arrays)
    n_rows = len(tbl)
    data_name = f"{uuid.uuid4()}.parquet"
    data_path = os.path.join(table_path, "data", data_name)
    pq.write_table(tbl, data_path, compression="zstd")
    fsize = os.path.getsize(data_path)

    # 2. manifest
    entry = {
        "status": 1,  # ADDED
        "snapshot_id": snap_id,
        "sequence_number": seq,
        "file_sequence_number": seq,
        "data_file": {
            "content": 0,
            "file_path": data_path,
            "file_format": "PARQUET",
            "partition": {},
            "record_count": n_rows,
            "file_size_in_bytes": fsize,
        },
    }
    manifest_name = f"{uuid.uuid4()}-m0.avro"
    manifest_path = os.path.join(table_path, "metadata", manifest_name)
    write_avro(manifest_path, _MANIFEST_ENTRY_SCHEMA, [entry],
               extra_meta={"format-version": b"2", "content": b"data"})

    # 3. manifest list = previous snapshot's manifests + the new one
    prev_manifests: List[Dict[str, Any]] = []
    if parent is not None:
        from datafusion_comet_tpu.io.avro import read_avro

        snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
        plist = _resolve_path(table_path, snaps[parent]["manifest-list"])
        prev_manifests, _ = read_avro(plist)
    new_manifest = {
        "manifest_path": manifest_path,
        "manifest_length": os.path.getsize(manifest_path),
        "partition_spec_id": 0,
        "content": 0,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snap_id,
        "added_files_count": 1,
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": n_rows,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
    }
    mlist_name = f"snap-{snap_id}-1-{uuid.uuid4()}.avro"
    mlist_path = os.path.join(table_path, "metadata", mlist_name)
    # older manifests may carry extra fields our schema drops — keep the keys
    # the spec requires
    keep = [f["name"] for f in _MANIFEST_FILE_SCHEMA["fields"]]
    prev_kept = [{k: m.get(k, 0) for k in keep} for m in prev_manifests]
    write_avro(mlist_path, _MANIFEST_FILE_SCHEMA, prev_kept + [new_manifest],
               extra_meta={"format-version": b"2"})

    # 4. new metadata version (atomic O_EXCL commit)
    snapshot = {
        "snapshot-id": snap_id,
        **({"parent-snapshot-id": parent} if parent is not None else {}),
        "sequence-number": seq,
        "timestamp-ms": _now_ms(),
        "summary": {"operation": "append",
                    "added-data-files": "1", "added-records": str(n_rows)},
        "manifest-list": mlist_path,
        "schema-id": 0,
    }
    meta = dict(meta)
    meta["last-sequence-number"] = seq
    meta["last-updated-ms"] = _now_ms()
    meta["current-snapshot-id"] = snap_id
    meta["snapshots"] = list(meta.get("snapshots", [])) + [snapshot]
    meta["snapshot-log"] = list(meta.get("snapshot-log", [])) + [
        {"timestamp-ms": snapshot["timestamp-ms"], "snapshot-id": snap_id}]
    new_version = version + 1
    new_path = os.path.join(table_path, "metadata", f"v{new_version}.metadata.json")
    with open(new_path, "x") as f:  # concurrent committer loses -> retries
        json.dump(meta, f, indent=2)
    with open(os.path.join(table_path, "metadata", "version-hint.text"), "w") as f:
        f.write(str(new_version))
    return snap_id


def _current_version(table_path: str) -> int:
    """The version this committer READ (hint first) — the successor file is
    then created with O_EXCL, so two committers who read the same version
    race on the create and the loser must retry (optimistic concurrency)."""
    import re

    meta_dir = os.path.join(table_path, "metadata")
    hint = os.path.join(meta_dir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            txt = f.read().strip()
        if txt.isdigit():
            return int(txt)
    versions = [int(m.group(1)) for name in os.listdir(meta_dir)
                if (m := re.match(r"v(\d+)\.metadata\.json$", name))]
    return max(versions) if versions else 0


def write_iceberg(table_path: str, data: Dict[str, np.ndarray],
                  schema: T.Schema, mode: str = "append") -> int:
    """Create-if-missing + append in one call (the common write path)."""
    if mode not in ("append", "create", "overwrite"):
        raise ValueError(f"mode {mode!r}")
    exists = os.path.exists(os.path.join(table_path, "metadata"))
    if mode == "create" and exists:
        raise FileExistsError(table_path)
    if not exists or mode == "overwrite":
        if mode == "overwrite" and exists:
            import shutil

            shutil.rmtree(table_path)
        create_table(table_path, schema)
    return append(table_path, data, schema)
