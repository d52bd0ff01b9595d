"""Iceberg table scan: metadata walk → parquet data files → device batches.

Reference contract: native/core/src/execution/operators/iceberg_scan.rs
(IcebergScanExec, 799 LoC — executes pre-planned FileScanTasks via
iceberg-rust, MOR position deletes, residual predicates) and the JVM serde
CometIcebergNativeScan.scala. TPU-first phase 1: the driver walks the table
metadata itself (no Iceberg library — the Avro manifests are decoded by
io/avro.py), plans the file set with snapshot/partition awareness, decodes
parquet on the host (io/parquet.py, row-group pruning included), applies
position deletes, and stages one device batch.

Supported: Iceberg v1/v2 table layout on a local filesystem —
``metadata/version-hint.text`` or latest ``v*.metadata.json``, current (or
named) snapshot → manifest list → manifests → data files; position-delete
files (v2 MOR); schema projection by field NAME (field-id matching is the
documented follow-up, mirroring schema_adapter.rs).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, List, Optional, Sequence

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import Batch
from datafusion_comet_tpu.io.avro import read_avro

__all__ = ["read_iceberg", "iceberg_plan_files", "load_table_metadata"]


def load_table_metadata(table_path: str) -> Dict[str, Any]:
    meta_dir = os.path.join(table_path, "metadata")
    hint = os.path.join(meta_dir, "version-hint.text")
    candidate = None
    if os.path.exists(hint):
        with open(hint) as f:
            v = f.read().strip()
        for name in (f"v{v}.metadata.json", f"{v}.metadata.json"):
            p = os.path.join(meta_dir, name)
            if os.path.exists(p):
                candidate = p
                break
    if candidate is None:
        versions = []
        for name in os.listdir(meta_dir):
            m = re.match(r"v(\d+)\.metadata\.json$", name)
            if m:
                versions.append((int(m.group(1)), name))
        if not versions:
            raise FileNotFoundError(f"no vN.metadata.json under {meta_dir}")
        candidate = os.path.join(meta_dir, max(versions)[1])
    with open(candidate) as f:
        return json.load(f)


def _resolve_path(table_path: str, p: str) -> str:
    """Manifest paths are absolute table-location URIs; re-root them."""
    if p.startswith("file://"):
        p = p[len("file://"):]
    if os.path.exists(p):
        return p
    # re-root under the actual table dir (tables are often moved/copied)
    for marker in ("/metadata/", "/data/"):
        if marker in p:
            return os.path.join(table_path, marker.strip("/"), p.split(marker, 1)[1])
    return os.path.join(table_path, os.path.basename(p))


def iceberg_plan_files(table_path: str, snapshot_id: Optional[int] = None):
    """Walk metadata → (data_files, position_delete_files). Each entry is the
    decoded manifest-entry ``data_file`` record (file_path re-rooted)."""
    meta = load_table_metadata(table_path)
    snap_id = snapshot_id if snapshot_id is not None else meta.get("current-snapshot-id")
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    if snap_id is None or snap_id not in snaps:
        return [], []
    snap = snaps[snap_id]
    manifest_list = _resolve_path(table_path, snap["manifest-list"])
    manifests, _ = read_avro(manifest_list)
    data_files: List[Dict[str, Any]] = []
    delete_files: List[Dict[str, Any]] = []
    eq_delete_files: List[Dict[str, Any]] = []
    for m in manifests:
        mpath = _resolve_path(table_path, m["manifest_path"])
        entries, _ = read_avro(mpath)
        for e in entries:
            if e.get("status") == 2:  # DELETED entry
                continue
            df = e["data_file"]
            df = dict(df)
            df["file_path"] = _resolve_path(table_path, df["file_path"])
            df["_sequence_number"] = e.get("sequence_number")
            content = df.get("content", 0) or 0
            if content == 0:
                data_files.append(df)
            elif content == 1:  # position deletes
                delete_files.append(df)
            else:  # content == 2: equality deletes (v2 MOR)
                eq_delete_files.append(df)
    return data_files, delete_files, eq_delete_files


def read_iceberg(
    table_path: str,
    schema: Optional[T.Schema] = None,
    snapshot_id: Optional[int] = None,
    projection: Optional[Sequence[str]] = None,
    capacity: Optional[int] = None,
) -> Batch:
    """Read an Iceberg table into one device Batch (snapshot isolation via
    the chosen snapshot's manifest set; v2 position deletes applied)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datafusion_comet_tpu.io.parquet import arrow_table_to_batch, arrow_to_engine_schema

    data_files, delete_files, eq_delete_files = iceberg_plan_files(table_path, snapshot_id)
    # position deletes: map file_path → sorted row positions to drop
    deletes: Dict[str, List[int]] = {}
    for dfile in delete_files:
        tbl = pq.read_table(dfile["file_path"])
        paths = tbl.column("file_path").to_pylist()
        poss = tbl.column("pos").to_pylist()
        for p, pos in zip(paths, poss):
            if p.startswith("file://"):
                p = p[len("file://"):]
            deletes.setdefault(os.path.basename(p), []).append(int(pos))

    # equality deletes (v2 MOR): each delete file's columns name the
    # equality fields; a delete row removes every data row with the same
    # tuple from files with a strictly smaller data sequence number
    # (reference: iceberg_scan.rs MOR equality path; spec "Scan Planning").
    # Files without sequence metadata (older writers) apply everywhere.
    eq_deletes = []  # (cols, set-of-tuples, seq)
    for dfile in eq_delete_files:
        tbl = pq.read_table(dfile["file_path"])
        cols = list(tbl.schema.names)
        keys = set(zip(*[tbl.column(c).to_pylist() for c in cols])) if cols else set()
        eq_deletes.append((cols, keys, dfile.get("_sequence_number")))

    tables = []
    for df in data_files:
        fmt = (df.get("file_format") or "PARQUET").upper()
        if fmt != "PARQUET":
            raise NotImplementedError(f"iceberg data file format {fmt}")
        tbl = pq.read_table(df["file_path"], columns=list(projection) if projection else None)
        mask = np.ones(len(tbl), bool)  # over the FULL file row order
        dels = deletes.get(os.path.basename(df["file_path"]))
        if dels:
            mask[np.asarray(dels, np.int64)] = False
        fseq = df.get("_sequence_number")
        for cols, keys, dseq in eq_deletes:
            if not keys:
                continue
            if dseq is not None and fseq is not None and not (fseq < dseq):
                continue
            need = tbl  # equality columns may be projected out: re-read them
            if any(c not in tbl.schema.names for c in cols):
                need = pq.read_table(df["file_path"], columns=cols)
            rows = zip(*[need.column(c).to_pylist() for c in cols])
            mask &= np.array([r not in keys for r in rows], bool)
        if not mask.all():
            tbl = tbl.filter(pa.array(mask))
        tables.append(tbl)
    if not tables:
        raise FileNotFoundError(f"iceberg table {table_path}: no data files in snapshot")
    full = pa.concat_tables(tables, promote_options="default")
    if schema is None:
        widths = {}
        for i, f in enumerate(full.schema):
            if pa.types.is_string(f.type):
                col = full.column(i)
                widths[f.name] = max(
                    (len(str(v)) for v in col.to_pylist() if v is not None), default=1
                )
        schema = arrow_to_engine_schema(full.schema, widths)
    return arrow_table_to_batch(full, schema, capacity=capacity)
