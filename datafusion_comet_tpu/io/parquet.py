"""Parquet scan: file → device-resident SoA batches.

Reference contract: native/core/src/parquet/parquet_exec.rs:60
(init_datasource_exec — projection, row-group + page pruning via min/max
stats, predicate pushdown, schema evolution) and schema_adapter.rs (type
promotion, missing columns as nulls, case-insensitive matching).

Phase-1 design (SURVEY.md §7 step 2): host-side decode via pyarrow (the
battle-tested Parquet decoder), then one device_put staging pass into the
fixed-capacity Batch layout. Row-group pruning happens on the host against
the footer stats BEFORE any decode — the same late-materialization win as the
reference's EagerPageIndexReaderFactory. Phase 2 (on-device Pallas
dictionary/RLE decoders) replaces the decode step without touching callers.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import Batch, from_numpy
from datafusion_comet_tpu.ir import expr as E

__all__ = ["arrow_to_engine_schema", "read_parquet", "write_parquet", "write_parquet_partitioned", "prune_row_groups"]


def _pa():
    import pyarrow

    return pyarrow


def arrow_field_to_dtype(field, sample_max_len: int = 0) -> T.DataType:
    import pyarrow as pa

    t = field.type
    if pa.types.is_boolean(t):
        return T.BOOL
    if pa.types.is_int8(t):
        return T.INT8
    if pa.types.is_int16(t):
        return T.INT16
    if pa.types.is_int32(t):
        return T.INT32
    if pa.types.is_int64(t):
        return T.INT64
    if pa.types.is_float32(t):
        return T.FLOAT32
    if pa.types.is_float64(t):
        return T.FLOAT64
    if pa.types.is_date32(t):
        return T.DATE
    if pa.types.is_timestamp(t):
        return T.TIMESTAMP if t.tz else T.TIMESTAMP_NTZ
    if pa.types.is_decimal(t):
        return T.decimal(t.precision, t.scale)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return T.string(sample_max_len or T.DEFAULT_STRING_LEN)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return T.binary(sample_max_len or T.DEFAULT_STRING_LEN)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return T.list_(arrow_field_to_dtype(t.value_field, sample_max_len))
    raise NotImplementedError(f"arrow type {t}")


def arrow_to_engine_schema(arrow_schema, string_widths: Optional[Dict[str, int]] = None) -> T.Schema:
    string_widths = string_widths or {}
    return T.Schema(
        [
            T.Field(f.name, arrow_field_to_dtype(f, string_widths.get(f.name, 0)), f.nullable)
            for f in arrow_schema
        ]
    )


# -------------------------------------------------------------------------------------
# Row-group pruning from footer statistics (reference: page-index/row-group
# pruning, parquet_exec.rs + EagerPageIndexReaderFactory)
# -------------------------------------------------------------------------------------


def _stat_range(rg_meta, col_idx):
    col = rg_meta.column(col_idx)
    st = col.statistics
    if st is None or not st.has_min_max:
        return None
    return st.min, st.max


def prune_row_groups(pf, predicate: Optional[E.Expr],
                     path: Optional[str] = None) -> List[int]:
    """Keep row groups whose min/max stats may satisfy the predicate.
    Supports conjunctions of col <op> literal (the common pushdown shape).
    With a local ``path``, equality conjuncts the stats could not exclude
    additionally consult the column's parquet bloom filter (SBBF,
    io/bloom.py) — a definite miss prunes the row group (the reference runs
    bloom pruning whenever filter pushdown is on)."""
    n = pf.metadata.num_row_groups
    keep = list(range(n))
    if predicate is None:
        return keep
    conjuncts = _split_conjuncts(predicate)
    names = [pf.metadata.schema.column(i).name for i in range(pf.metadata.num_columns)]

    def rg_may_match(rg: int) -> bool:
        meta = pf.metadata.row_group(rg)
        for c in conjuncts:
            trip = _conjunct_triplet(c)
            if trip is None:
                continue
            col_name, op, value = trip
            if col_name not in names:
                continue
            r = _stat_range(meta, names.index(col_name))
            if r is not None:
                mn, mx = r
                try:
                    if op == "eq" and (value < mn or value > mx):
                        return False
                    if op in ("lt", "le") and mn > value:
                        return False
                    if op in ("gt", "ge") and mx < value:
                        return False
                except TypeError:
                    continue
            if op == "eq" and path is not None:
                from datafusion_comet_tpu.io.bloom import row_group_may_contain

                if not row_group_may_contain(path, pf, rg, col_name, value):
                    return False
        return True

    return [rg for rg in keep if rg_may_match(rg)]


def _split_conjuncts(e: E.Expr) -> List[E.Expr]:
    if isinstance(e, E.BinaryOp) and e.op == "and":
        return _split_conjuncts(e.left) + _split_conjuncts(e.right)
    return [e]


def _conjunct_triplet(e: E.Expr):
    if not isinstance(e, E.BinaryOp) or e.op not in ("eq", "lt", "le", "gt", "ge"):
        return None
    l, r = e.left, e.right
    if isinstance(l, (E.ColumnRef, E.BoundRef)) and isinstance(r, E.Literal):
        name = l.col_name
        return name, e.op, r.value
    if isinstance(r, (E.ColumnRef, E.BoundRef)) and isinstance(l, E.Literal):
        flip = {"eq": "eq", "lt": "gt", "le": "ge", "gt": "lt", "ge": "le"}
        return r.col_name, flip[e.op], l.value
    return None


# -------------------------------------------------------------------------------------
# Read
# -------------------------------------------------------------------------------------


def _filter_expr_arrow(predicate: Optional[E.Expr], arrow_schema):
    """Conjunct triplets → a pyarrow.compute filter over plain int/float/
    string/bool/date columns (row-filter pushdown: rows the device Filter
    would drop anyway are dropped before staging — the host analog of the
    reference's RowFilter / late materialization,
    parquet_exec.rs:60 with_row_filter)."""
    if predicate is None:
        return None
    import pyarrow as pa
    import pyarrow.compute as pc

    ok_types = (pa.types.is_integer, pa.types.is_floating, pa.types.is_string,
                pa.types.is_large_string, pa.types.is_boolean, pa.types.is_date)
    expr = None
    for c in _split_conjuncts(predicate):
        trip = _conjunct_triplet(c)
        if trip is None:
            continue
        name, op, value = trip
        if name not in arrow_schema.names:
            continue
        at = arrow_schema.field(name).type
        if not any(t(at) for t in ok_types):
            continue  # decimals/timestamps: unit scaling differs — leave on device
        f = pc.field(name)
        e = {"eq": f == value, "lt": f < value, "le": f <= value,
             "gt": f > value, "ge": f >= value}[op]
        expr = e if expr is None else expr & e
    return expr


def _hive_parts(file_path: str, base: str) -> List[Tuple[str, str]]:
    """(col, value) pairs from the hive directory segments of one file,
    outermost first."""
    import os

    out = []
    for seg in os.path.relpath(file_path, base).split(os.sep)[:-1]:
        if "=" in seg:
            name, val = seg.split("=", 1)
            out.append((name, val))
    return out


def deferred_parquet_info(path: str, schema: Optional[T.Schema] = None):
    """Schema + partition-column list for a lazy registration WITHOUT
    staging the data: one footer gives the file columns, the directory
    layout gives the hive partition columns (width = longest value seen).
    File-column string widths come from sampling the FIRST file when no
    schema is passed — pass an explicit schema when later files may hold
    longer strings (staging raises on overflow rather than truncate)."""
    import pyarrow.parquet as pq

    fs, fs_root = resolve_filesystem(path)
    paths = _expand(path)
    base = fs_root if fs is not None else path
    part_cols: List[str] = []
    widths: Dict[str, int] = {}
    for p in paths:
        for name, val in _hive_parts(p, base):
            if name not in part_cols:
                part_cols.append(name)
            widths[name] = max(widths.get(name, 1), len(val.encode()))
    if schema is not None:
        return schema, part_cols
    src = fs.open_input_file(paths[0]) if fs is not None else paths[0]
    pf = pq.ParquetFile(src)
    sample = pf.read_row_group(0) if pf.num_row_groups else pf.schema_arrow.empty_table()
    for f in pf.schema_arrow:
        import pyarrow as pa

        if pa.types.is_string(f.type) or pa.types.is_large_string(f.type) or \
           pa.types.is_binary(f.type) or pa.types.is_large_binary(f.type):
            col = sample.column(f.name) if f.name in sample.schema.names else None
            mx = 1
            if col is not None and len(col):
                import pyarrow.compute as pc

                got = pc.max(pc.binary_length(col)).as_py()
                mx = int(got or 1)
            widths[f.name] = max(mx * 2, 16)  # margin for unseen files
    fields = [
        T.Field(f.name, arrow_field_to_dtype(f, widths.get(f.name, 0)), f.nullable)
        for f in pf.schema_arrow
    ]
    fields += [T.Field(c, T.string(widths[c]), False) for c in part_cols]
    return T.Schema(fields), part_cols


def _decode_list_string(pf, path: str, ci: int, name: str,
                        schema: Optional[T.Schema]):
    """All row groups of one LIST<string> column through the device dict
    path; None when any chunk has PLAIN fallback pages (host path)."""
    from datafusion_comet_tpu.exec.decode import (
        decode_list_string_column_chunk, scan_list_levels)
    from datafusion_comet_tpu.io.pages import read_column_pages

    declared_E = declared_w = None
    if schema is not None:
        fdecl = next((f for f in schema.fields if f.name == name), None)
        if fdecl is not None and fdecl.dtype.is_list:
            declared_E = fdecl.dtype.max_elems
            if fdecl.dtype.element.is_binary:
                declared_w = fdecl.dtype.element.byte_width or None
    maxc = 0
    for rg in range(pf.metadata.num_row_groups):
        st = scan_list_levels(read_column_pages(path, rg, ci))
        if st["counts"].size:
            maxc = max(maxc, int(st["counts"].max()))
    E_ = declared_E if declared_E else max(
        1 << max(maxc - 1, 0).bit_length(), 1)
    chunks = []
    for rg in range(pf.metadata.num_row_groups):
        got = decode_list_string_column_chunk(
            path, rg, ci, max_elems=E_, width=declared_w)
        if got is None:
            return None
        chunks.append(got)
    return chunks


def _list_string_cv(chunks, cap: int):
    """Concatenate per-row-group LIST<string> planes into one ColumnVector
    padded to ``cap`` rows."""
    import jax.numpy as jnp

    from datafusion_comet_tpu.exec.batch import ColumnVector

    w = max(c[6] for c in chunks)
    E_ = chunks[0][5]

    def padw(b):
        return (jnp.pad(b, ((0, 0), (0, 0), (0, w - b.shape[2])))
                if b.shape[2] < w else b)

    def cat(xs):
        return jnp.concatenate(xs) if len(xs) > 1 else xs[0]

    counts = cat([c[0] for c in chunks])
    lvalid = cat([c[1] for c in chunks])
    bplane = cat([padw(c[2]) for c in chunks])
    lplane = cat([c[3] for c in chunks])
    vplane = cat([c[4] for c in chunks])
    pad = cap - counts.shape[0]
    counts = jnp.pad(counts, (0, pad)).astype(jnp.int32)
    lvalid = jnp.pad(lvalid, (0, pad))
    bplane = jnp.pad(bplane, ((0, pad), (0, 0), (0, 0)))
    lplane = jnp.pad(lplane, ((0, pad), (0, 0)))
    vplane = jnp.pad(vplane, ((0, pad), (0, 0)))
    elem_dt = T.string(w)
    ldt = T.list_(elem_dt, E_)
    elem_cv = ColumnVector(bplane, vplane, lplane, elem_dt)
    return ColumnVector(counts, lvalid, None, ldt, (elem_cv,)), ldt


def _struct_cv(pf, path: str, name: str, kids_meta, arrow_schema,
               final_schema: Optional[T.Schema], cap: int, np_of):
    """Decode every leaf of a STRUCT-of-primitives column on device and
    assemble the engine's struct planes: field validity from def == D,
    struct validity from the shared def-level stream (def ≥ D - field
    nullability) — reference: all nestings native under
    parquet_exec.rs:60."""
    import jax.numpy as jnp

    from datafusion_comet_tpu.exec.batch import ColumnVector
    from datafusion_comet_tpu.exec.decode import decode_struct_leaf_chunk

    struct_nullable = arrow_schema.field(name).nullable
    t_of = {"INT32": T.INT32, "INT64": T.INT64,
            "FLOAT": T.FLOAT32, "DOUBLE": T.FLOAT64}
    declared = None
    if final_schema is not None:
        fdecl = next((f for f in final_schema.fields if f.name == name), None)
        if (fdecl is not None and fdecl.dtype.is_struct
                and len(fdecl.dtype.struct_fields) == len(kids_meta)):
            declared = fdecl.dtype
    kid_cvs = []
    svalid = None
    fields = []
    for ki, (fname, ci, pt, fnull) in enumerate(kids_meta):
        parts, defparts = [], []
        D = 0
        for rg in range(pf.metadata.num_row_groups):
            d_, defs_, D = decode_struct_leaf_chunk(path, rg, ci, np_of[pt])
            parts.append(d_)
            defparts.append(defs_)
        data = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
        defs = (np.concatenate(defparts) if len(defparts) > 1
                else defparts[0])
        fvalid = jnp.asarray(defs == D)
        if svalid is None:
            if struct_nullable:
                thr = D - (1 if fnull else 0)
                svalid = jnp.asarray(defs >= max(thr, 0))
            else:
                svalid = jnp.ones(defs.shape[0], bool)
        dt = t_of[pt]
        if declared is not None:
            ddt = declared.struct_fields[ki].dtype
            if not ddt.is_nested and not ddt.is_binary:
                data = data.astype(ddt.np_dtype())
                dt = ddt
        pad = cap - data.shape[0]
        kid_cvs.append(ColumnVector(jnp.pad(data, (0, pad)),
                                    jnp.pad(fvalid, (0, pad)), None, dt))
        fields.append((fname, dt))
    svalid = jnp.pad(svalid, (0, cap - svalid.shape[0]))
    sdt = declared if declared is not None else T.struct(*fields)
    cv = ColumnVector(jnp.zeros(cap, jnp.int8), svalid, None, sdt,
                      tuple(kid_cvs))
    return cv, sdt


def _map_cv(pf, path: str, name: str, key_leaf, val_leaf, final_schema,
            cap: int, np_of):
    """Device-decode a MAP<primitive, primitive> column to the engine's
    entry-list planes (map = LIST of STRUCT<key,value>, types.py map_).

    Parquet encodes a map as the repeated ``key_value`` group with two
    leaves sharing ONE repetition stream: ``key`` (required under the
    entry) and ``value`` (usually optional). Structurally each leaf IS a
    1-level LIST column — the key a LIST<required prim>, the value a
    LIST<nullable prim> — so both reuse decode_list_column_chunk
    unchanged: levels scan on host (structure), values bit-unpack on
    device, one scatter builds each (rows, E) plane. Entries then sort by
    key ON DEVICE per row (the engine's map normalization, types.py
    map_), absent slots riding behind a +max sentinel.

    Reference decodes all nestings natively under parquet_exec.rs:60;
    map semantics per spark-expr/src/map_funcs (map_sort normalization).
    """
    import jax.numpy as jnp

    from datafusion_comet_tpu.exec.batch import ColumnVector
    from datafusion_comet_tpu.exec.decode import (decode_list_column_chunk,
                                                  scan_list_levels)
    from datafusion_comet_tpu.io.pages import read_column_pages

    t_of = {"INT32": T.INT32, "INT64": T.INT64,
            "FLOAT": T.FLOAT32, "DOUBLE": T.FLOAT64}
    (kci, kpt), (vci, vpt) = key_leaf, val_leaf
    declared = None
    if final_schema is not None:
        fdecl = next((f for f in final_schema.fields if f.name == name), None)
        if fdecl is not None and fdecl.dtype.is_map:
            declared = fdecl.dtype.max_elems
    maxc = 0
    for rg in range(pf.metadata.num_row_groups):
        st = scan_list_levels(read_column_pages(path, rg, kci))
        if st["counts"].size:
            maxc = max(maxc, int(st["counts"].max()))
    E_ = declared if declared else max(1 << max(maxc - 1, 0).bit_length(), 1)

    def cat(xs):
        return jnp.concatenate(xs) if len(xs) > 1 else xs[0]

    kc, kv, kd, kev, vd, vev = [], [], [], [], [], []
    for rg in range(pf.metadata.num_row_groups):
        c_, v_, d_, ev_, _ = decode_list_column_chunk(
            path, rg, kci, np_of[kpt], max_elems=E_)
        kc.append(c_); kv.append(v_); kd.append(d_); kev.append(ev_)
        _, _, dv_, evv_, _ = decode_list_column_chunk(
            path, rg, vci, np_of[vpt], max_elems=E_)
        vd.append(dv_); vev.append(evv_)
    counts, mvalid = cat(kc).astype(jnp.int32), cat(kv)
    kplane, entry_v = cat(kd), cat(kev)
    vplane, vvalid = cat(vd), cat(vev)
    # map normalization (types.py map_): entries sorted by key per row;
    # absent slots carry the dtype's max sentinel so they sort last
    sentinel = (jnp.inf if jnp.issubdtype(kplane.dtype, jnp.floating)
                else jnp.iinfo(kplane.dtype).max)
    order = jnp.argsort(jnp.where(entry_v, kplane, sentinel), axis=1,
                        stable=True)
    take = lambda p: jnp.take_along_axis(p, order, axis=1)
    kplane, vplane = take(kplane), take(vplane)
    entry_v, vvalid = take(entry_v), take(vvalid)
    pad = cap - counts.shape[0]
    counts = jnp.pad(counts, (0, pad))
    mvalid = jnp.pad(mvalid, (0, pad))
    pad2 = lambda p: jnp.pad(p, ((0, pad), (0, 0)))
    kplane, vplane = pad2(kplane), pad2(vplane)
    entry_v, vvalid = pad2(entry_v), pad2(vvalid)
    kdt, vdt = t_of[kpt], t_of[vpt]
    mdt = T.map_(kdt, vdt, E_)
    key_cv = ColumnVector(kplane, entry_v, None, kdt)
    val_cv = ColumnVector(vplane, vvalid, None, vdt)
    elem_cv = ColumnVector(jnp.zeros((cap, E_), jnp.int8), entry_v, None,
                           mdt.element, (key_cv, val_cv))
    return ColumnVector(counts, mvalid, None, mdt, (elem_cv,)), mdt


def read_parquet(
    path: str,
    columns: Optional[Sequence[str]] = None,
    predicate: Optional[E.Expr] = None,
    schema: Optional[T.Schema] = None,
    capacity: Optional[int] = None,
    row_filter: bool = False,
    device_decode: bool = False,
    decryption: Optional[dict] = None,
    partition_values: Optional[Dict[str, set]] = None,
) -> Batch:
    """Read a Parquet file (or directory of files) into one device Batch.

    - ``columns``: projection pushdown.
    - ``predicate``: used for row-group pruning (and, with ``row_filter``,
      host row filtering before staging — the exact filter still runs in
      the device Filter operator; same best-effort split as the reference).
    - ``schema``: target engine schema (drives string widths / missing-column
      null fill, the schema-evolution behaviors of schema_adapter.rs).
    - ``device_decode``: decode eligible (required int/float) columns ON
      DEVICE from raw pages (io/pages.py + exec/decode.py) instead of host
      pyarrow — the phase-2 scan path (single plain unencrypted file).
      With a predicate, pages prune via the page index
      (eager_page_index_reader_factory.rs analog) and the predicate then
      evaluates on device.
    - ``decryption``: Parquet modular-encryption keys (reference:
      parquet/encryption_support.rs): ``{"footer_key": bytes,
      "column_keys": {column: bytes}, "kms": optional KmsClient}``. Uses an
      in-memory KMS unless a custom client is given.
    """
    import pyarrow.parquet as pq
    import os

    fs, fs_root = resolve_filesystem(path)
    paths = _expand(path)
    import pyarrow as pa

    if device_decode and len(paths) == 1 and fs is None and decryption is None:
        return _read_parquet_device(paths[0], columns, schema, capacity,
                                    predicate=predicate)

    dec_props = _decryption_properties(decryption)
    rel_base0 = fs_root if fs is not None else path
    if partition_values:
        # hive partition-directory pruning (static filters + DPP feed this;
        # reference: CometScanExec selectedPartitions /
        # dynamicallySelectedPartitions)
        paths = [
            p for p in paths
            if all(
                v in partition_values[c]
                for c, v in _hive_parts(p, rel_base0)
                if c in partition_values
            )
        ] or paths[:1]  # keep one file for schema on full prune; rows filter out
    arrow_tables = []
    for p in paths:
        src = fs.open_input_file(p) if fs is not None else p
        pf = pq.ParquetFile(src, decryption_properties=dec_props)
        rgs = prune_row_groups(pf, predicate, path=p if fs is None else None)
        if not rgs:
            continue
        cols = list(columns) if columns is not None else None
        if cols is not None:
            avail = set(pf.schema_arrow.names)
            cols = [c for c in cols if c in avail]
        tbl = pf.read_row_groups(rgs, columns=cols)
        if row_filter:
            fe = _filter_expr_arrow(predicate, tbl.schema)
            if fe is not None:
                tbl = tbl.filter(fe)
        # hive-style partition values from the directory path
        # (reference: NativeScanCommon partition values, schema_adapter.rs —
        # partition columns materialize as constants per file)
        rel_base = fs_root if fs is not None else path
        for seg in reversed(os.path.relpath(p, rel_base).split(os.sep)[:-1]):
            if "=" in seg:
                name, val = seg.split("=", 1)
                if name not in tbl.schema.names and (
                    columns is None or name in columns
                ):
                    tbl = tbl.append_column(
                        name, pa.array([val] * len(tbl), pa.string())
                    )
        arrow_tables.append(tbl)

    if not arrow_tables:
        # empty result with correct schema
        first = pq.ParquetFile(
            fs.open_input_file(paths[0]) if fs is not None else paths[0],
            decryption_properties=dec_props)
        tbl = first.schema_arrow.empty_table()
    else:
        tbl = pa.concat_tables(arrow_tables, promote_options="default")
    return arrow_table_to_batch(tbl, schema=schema, columns=columns, capacity=capacity)


def _read_parquet_device(path: str, columns, schema: Optional[T.Schema],
                         capacity: Optional[int],
                         predicate: Optional[E.Expr] = None) -> Batch:
    """Phase-2 scan: eligible (int32/int64/float/double, non-nested)
    columns never touch the host decoder — raw pages ship to the device and
    unpack there (exec/decode.py); everything else takes the pyarrow
    staging path with zero-filled placeholders replaced after. A predicate
    prunes pages through the hand-parsed page index (io/pageindex.py) —
    pruned pages skip decode and their rows stage dead — and then runs
    exactly on device before the batch is returned."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np
    import pyarrow.parquet as pq

    from datafusion_comet_tpu.exec.decode import decode_column_chunk

    pf = pq.ParquetFile(path)
    arrow_schema = pf.schema_arrow
    names = list(columns) if columns is not None else list(arrow_schema.names)
    phys = {}
    for ci in range(pf.metadata.num_columns):
        cmeta = pf.metadata.row_group(0).column(ci) if pf.metadata.num_row_groups else None
        if cmeta is not None:
            phys[cmeta.path_in_schema] = (ci, cmeta.physical_type)
    import pyarrow as pa

    eligible = {}
    list_eligible = {}
    str_decoded = {}  # name -> (codes, valid, StringDict) pre-merged
    struct_eligible = {}  # name -> [(field, ci, phys_type, nullable), ...]
    list_str_decoded = {}  # name -> per-rg LIST<string> plane decodes
    map_eligible = {}  # name -> ((key_ci, key_pt), (val_ci, val_pt))
    for n in names:
        if n not in arrow_schema.names:
            continue
        at = arrow_schema.field(n).type
        if pa.types.is_struct(at):
            # STRUCT of primitive leaves: each leaf is its own chunk; value
            # streams decode on device, the multi-bit def-level stream
            # yields both field and struct validity
            # (exec/decode.py decode_struct_leaf_chunk)
            kids = []
            for fi in range(at.num_fields):
                f = at.field(fi)
                leaf = phys.get(f"{n}.{f.name}")
                if not (leaf and leaf[1] in ("INT32", "INT64", "FLOAT",
                                             "DOUBLE")
                        and (pa.types.is_integer(f.type)
                             or pa.types.is_floating(f.type))):
                    kids = None
                    break
                kids.append((f.name, leaf[0], leaf[1], f.nullable))
            if kids:
                struct_eligible[n] = kids
            continue
        if pa.types.is_map(at):
            # MAP<primitive, primitive>: the two key_value leaves share one
            # rep stream and each is structurally a 1-level LIST column —
            # both decode through decode_list_column_chunk (_map_cv)
            kt, vt = at.key_type, at.item_type
            kleaf = next((v for k, v in phys.items()
                          if k.startswith(n + ".") and k.endswith(".key")),
                         None)
            vleaf = next((v for k, v in phys.items()
                          if k.startswith(n + ".") and k.endswith(".value")),
                         None)
            ok = lambda t_: pa.types.is_integer(t_) or pa.types.is_floating(t_)
            if (ok(kt) and ok(vt) and kleaf and vleaf
                    and kleaf[1] in ("INT32", "INT64", "FLOAT", "DOUBLE")
                    and vleaf[1] in ("INT32", "INT64", "FLOAT", "DOUBLE")):
                map_eligible[n] = (kleaf, vleaf)
            continue
        if pa.types.is_list(at) or pa.types.is_large_list(at):
            # LIST<primitive>: levels decode on host (structure), values on
            # device (exec/decode.py decode_list_column_chunk);
            # LIST<string>: dictionary codes bit-unpack on device, padded
            # byte planes materialize with one dictionary take
            vt = at.value_type
            if pa.types.is_integer(vt) or pa.types.is_floating(vt):
                leaf = next((v for k, v in phys.items()
                             if k.startswith(n + ".")), None)
                if leaf and leaf[1] in ("INT32", "INT64", "FLOAT", "DOUBLE"):
                    list_eligible[n] = leaf
            elif pa.types.is_string(vt) or pa.types.is_large_string(vt):
                leaf = next((v for k, v in phys.items()
                             if k.startswith(n + ".")), None)
                if leaf and leaf[1] == "BYTE_ARRAY":
                    got = _decode_list_string(pf, path, leaf[0], n, schema)
                    if got is not None:
                        list_str_decoded[n] = got
            continue
        if pa.types.is_string(at) or pa.types.is_large_string(at):
            # dictionary-encoded strings: codes bit-unpack on device, only
            # the tiny dictionary page touches host; PLAIN-page fallback
            # chunks keep the pyarrow path (decode returns None)
            ci_pt = phys.get(n)
            if not (ci_pt and ci_pt[1] == "BYTE_ARRAY"):
                continue
            from datafusion_comet_tpu.exec.decode import (
                decode_string_dict_column_chunk, merge_dict_chunks)

            declared_w = None
            if schema is not None:
                fdecl = next((f for f in schema.fields if f.name == n), None)
                if fdecl is not None and fdecl.dtype.is_binary:
                    declared_w = fdecl.dtype.byte_width or None
            chunks = []
            for rg in range(pf.metadata.num_row_groups):
                got = decode_string_dict_column_chunk(
                    path, rg, ci_pt[0], width=declared_w)
                if got is None:
                    chunks = None
                    break
                chunks.append(got)
            if chunks:
                str_decoded[n] = merge_dict_chunks(chunks, width=declared_w)
            continue
        if not (pa.types.is_integer(at) or pa.types.is_floating(at)):
            continue  # temporal/decimal logical types keep the host path
        ci_pt = phys.get(n)
        if ci_pt and ci_pt[1] in ("INT32", "INT64", "FLOAT", "DOUBLE"):
            # nullable columns expand through their definition levels on
            # device (exec/decode.py _expand_def_levels)
            eligible[n] = ci_pt
    device_side = (set(list_eligible) | set(str_decoded)
                   | set(struct_eligible) | set(list_str_decoded)
                   | set(map_eligible))
    host_cols = [n for n in names
                 if n not in eligible and n not in device_side]
    flat_names = [n for n in names if n not in device_side]
    tbl = pf.read(columns=host_cols) if host_cols else None
    n_rows = pf.metadata.num_rows
    np_of = {"INT32": np.dtype("<i4"), "INT64": np.dtype("<i8"),
             "FLOAT": np.dtype("<f4"), "DOUBLE": np.dtype("<f8")}
    final_schema = schema  # caller contract (may include LIST fields)
    flat_schema = None
    if schema is not None:
        flat_schema = T.Schema([f for f in schema.fields
                                if f.name not in device_side])
    if schema is None:
        # infer from the full arrow schema (string widths from host columns)
        import pyarrow as pa
        fields = []
        for n in flat_names:
            fields.append(T.Field(n, arrow_field_to_dtype(arrow_schema.field(n), 0),
                                  arrow_schema.field(n).nullable))
        # width inference for binary host columns happens in arrow_table_to_batch;
        # device-decoded columns are numeric so widths don't apply
        flat_schema = None if any(f.dtype.is_binary and f.dtype.byte_width == 0 for f in fields) \
            else T.Schema(fields)
    # stage host columns + zero placeholders for eligible ones
    if tbl is not None:
        placeholder = {n: np.zeros(n_rows, np_of[pt]) for n, (ci, pt) in eligible.items()}
        import pyarrow as pa
        for n, arr in placeholder.items():
            tbl = tbl.append_column(
                pa.field(n, arrow_schema.field(n).type,
                         nullable=arrow_schema.field(n).nullable), pa.array(arr))
        tbl = tbl.select(flat_names)
        batch = arrow_table_to_batch(tbl, schema=flat_schema, columns=flat_names,
                                     capacity=capacity)
    else:
        data = {n: np.zeros(n_rows, np_of[pt]) for n, (ci, pt) in eligible.items()}
        if flat_schema is None:
            flat_schema = T.Schema([T.Field(n, arrow_field_to_dtype(arrow_schema.field(n), 0), False)
                                    for n in flat_names])
        from datafusion_comet_tpu.exec.batch import from_numpy, pad_capacity

        if flat_schema is not None and not flat_schema.fields:
            # every requested column is device-decoded nested: flat batch is
            # just the row mask
            cap0 = capacity or pad_capacity(n_rows)
            m = np.zeros(cap0, bool)
            m[:n_rows] = True
            batch = Batch((), jnp.asarray(m), flat_schema)
        else:
            batch = from_numpy(data, flat_schema, capacity=capacity)
    # page-index pruning (eager_page_index_reader_factory.rs analog):
    # per row group, rows provably failing the predicate go dead and the
    # covering pages of every device-decoded column skip decode entirely
    rg_keep: List[Optional[np.ndarray]] = []
    rg_masks: List[Dict[str, List[bool]]] = []
    if predicate is not None:
        from datafusion_comet_tpu.io.pageindex import compute_page_masks

        for rg in range(pf.metadata.num_row_groups):
            keep, masks = compute_page_masks(pf, path, predicate, rg)
            rg_keep.append(keep)
            rg_masks.append(masks)
    # replace placeholders with device-decoded columns
    cols = list(batch.columns)
    cap = batch.row_mask.shape[0]
    for i, f in enumerate(batch.schema.fields):
        if f.name not in eligible:
            continue
        ci, pt = eligible[f.name]
        nullable = arrow_schema.field(f.name).nullable
        parts, vparts = [], []
        for rg in range(pf.metadata.num_row_groups):
            pm = rg_masks[rg].get(f.name) if rg < len(rg_masks) else None
            got = decode_column_chunk(path, rg, ci, np_of[pt],
                                      with_validity=nullable, page_mask=pm)
            if nullable:
                parts.append(got[0])
                vparts.append(got[1])
            else:
                parts.append(got)
        dev = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
        want = cols[i].data.dtype
        dev = jnp.pad(dev, (0, cap - dev.shape[0])).astype(want)
        if nullable:
            vd = jnp.concatenate(vparts) if len(vparts) > 1 else vparts[0]
            vd = jnp.pad(vd, (0, cap - vd.shape[0]))
            cols[i] = dataclasses.replace(cols[i], data=dev, validity=vd)
        else:
            cols[i] = dataclasses.replace(cols[i], data=dev)
    out_fields = list(batch.schema.fields)
    # insert device-side columns (dict strings + lists) in names order so
    # each names.index(n) is correct at its own insertion time
    if device_side:
        from datafusion_comet_tpu.exec.batch import ColumnVector
        from datafusion_comet_tpu.exec.decode import (
            decode_list_column_chunk, scan_list_levels)
        from datafusion_comet_tpu.io.pages import read_column_pages

        t_of = {"INT32": T.INT32, "INT64": T.INT64,
                "FLOAT": T.FLOAT32, "DOUBLE": T.FLOAT64}
        for n in [m for m in names if m in device_side]:
            if n in str_decoded:
                codes, svalid, sdict = str_decoded[n]
                codes = jnp.pad(codes, (0, cap - codes.shape[0]))
                svalid = jnp.pad(svalid, (0, cap - svalid.shape[0]))
                st = T.string(sdict.width)
                cv = ColumnVector(codes.astype(jnp.int32), svalid, None, st,
                                  dictionary=sdict)
                at_idx = names.index(n)
                cols.insert(at_idx, cv)
                out_fields.insert(at_idx, T.Field(n, st, True))
                continue
            if n in struct_eligible:
                cv, sdt = _struct_cv(pf, path, n, struct_eligible[n],
                                     arrow_schema, final_schema, cap, np_of)
                at_idx = names.index(n)
                cols.insert(at_idx, cv)
                out_fields.insert(at_idx, T.Field(n, sdt, True))
                continue
            if n in list_str_decoded:
                cv, ldt = _list_string_cv(list_str_decoded[n], cap)
                at_idx = names.index(n)
                cols.insert(at_idx, cv)
                out_fields.insert(at_idx, T.Field(n, ldt, True))
                continue
            if n in map_eligible:
                kleaf, vleaf = map_eligible[n]
                cv, mdt = _map_cv(pf, path, n, kleaf, vleaf, final_schema,
                                  cap, np_of)
                at_idx = names.index(n)
                cols.insert(at_idx, cv)
                out_fields.insert(at_idx, T.Field(n, mdt, True))
                continue
            ci, pt = list_eligible[n]
            declared = None
            if final_schema is not None:
                fdecl = next((f for f in final_schema.fields if f.name == n), None)
                declared = fdecl.dtype.max_elems if fdecl is not None else None
            # pass 1: host level scan per row group → global plane width E
            maxc = 0
            for rg in range(pf.metadata.num_row_groups):
                st = scan_list_levels(read_column_pages(path, rg, ci))
                if st["counts"].size:
                    maxc = max(maxc, int(st["counts"].max()))
            E_ = declared if declared else max(
                1 << max(maxc - 1, 0).bit_length(), 1)
            cparts, vparts_, dparts, evparts = [], [], [], []
            for rg in range(pf.metadata.num_row_groups):
                c_, v_, d_, ev_, _ = decode_list_column_chunk(
                    path, rg, ci, np_of[pt], max_elems=E_)
                cparts.append(c_); vparts_.append(v_)
                dparts.append(d_); evparts.append(ev_)
            counts = jnp.concatenate(cparts) if len(cparts) > 1 else cparts[0]
            lvalid = jnp.concatenate(vparts_) if len(vparts_) > 1 else vparts_[0]
            dplane = jnp.concatenate(dparts) if len(dparts) > 1 else dparts[0]
            evplane = jnp.concatenate(evparts) if len(evparts) > 1 else evparts[0]
            pad = cap - counts.shape[0]
            counts = jnp.pad(counts, (0, pad))
            lvalid = jnp.pad(lvalid, (0, pad))
            dplane = jnp.pad(dplane, ((0, pad), (0, 0)))
            evplane = jnp.pad(evplane, ((0, pad), (0, 0)))
            elem_dt = t_of[pt]
            list_dt = T.list_(elem_dt, E_)
            elem_cv = ColumnVector(dplane, evplane, None, elem_dt)
            cv = ColumnVector(counts.astype(jnp.int32), lvalid, None,
                              list_dt, (elem_cv,))
            at_idx = names.index(n)
            cols.insert(at_idx, cv)
            out_fields.insert(at_idx, T.Field(n, list_dt, True))
    batch = dataclasses.replace(batch, columns=tuple(cols),
                                schema=T.Schema(out_fields))
    mask = batch.row_mask
    if predicate is not None:
        if any(k is not None for k in rg_keep):
            keep_all = np.concatenate([
                k if k is not None else np.ones(pf.metadata.row_group(rg).num_rows, bool)
                for rg, k in enumerate(rg_keep)])
            keep_all = np.pad(keep_all, (0, cap - len(keep_all)))
            mask = mask & jnp.asarray(keep_all)
        # the exact predicate runs on device over the staged batch (the
        # read_parquet(predicate=...) contract: returned rows satisfy it)
        out = Batch(tuple(cols), mask, batch.schema)
        from datafusion_comet_tpu.exec.evaluator import evaluate_predicate

        bound = E.bind(predicate, out.schema) if predicate.dtype is None else predicate
        return Batch(out.columns, mask & evaluate_predicate(bound, out), out.schema)
    return Batch(tuple(cols), mask, batch.schema)


def _in_memory_kms(keys: dict):
    """Test/standalone KMS: wraps a data key by concatenating it with the
    named master key, base64-encoded (the pyarrow sample-KMS pattern;
    production deployments pass their own KmsClient via ``kms``)."""
    import base64

    import pyarrow.parquet.encryption as pe

    class _Kms(pe.KmsClient):
        def __init__(self):
            super().__init__()

        def wrap_key(self, key_bytes, master_key_identifier):
            master = keys[str(master_key_identifier)]
            return base64.b64encode(master + key_bytes)

        def unwrap_key(self, wrapped_key, master_key_identifier):
            master = keys[str(master_key_identifier)]
            raw = base64.b64decode(wrapped_key)
            assert raw[: len(master)] == master, "wrong master key"
            return raw[len(master):]

    return _Kms()


def _crypto_factory(decryption: dict):
    import pyarrow.parquet.encryption as pe

    keys = {"footer": decryption["footer_key"]}
    for col, k in (decryption.get("column_keys") or {}).items():
        keys[f"colkey_{col}"] = k
    kms = decryption.get("kms")
    factory = pe.CryptoFactory(
        (lambda cfg: kms) if kms is not None else (lambda cfg: _in_memory_kms(keys)))
    return factory, pe.KmsConnectionConfig()


def _decryption_properties(decryption):
    """Parquet modular encryption read support (reference:
    native/core/src/parquet/encryption_support.rs — per-column + footer
    keys resolved through a KMS)."""
    if not decryption:
        return None
    import pyarrow.parquet.encryption as pe

    factory, conn = _crypto_factory(decryption)
    return factory.file_decryption_properties(conn, pe.DecryptionConfiguration())


def encryption_properties(footer_key: bytes, column_keys=None, kms=None):
    """Writer-side file_encryption_properties for partitioned/plain writes
    (the write half of encryption_support.rs)."""
    import pyarrow.parquet.encryption as pe

    dec = {"footer_key": footer_key, "column_keys": column_keys or {}, "kms": kms}
    factory, conn = _crypto_factory(dec)
    cfg = pe.EncryptionConfiguration(
        footer_key="footer",
        column_keys={f"colkey_{c}": [c] for c in (column_keys or {})},
    )
    return factory.file_encryption_properties(conn, cfg)


_CREDENTIAL_PROVIDER = None


def set_credential_provider(fn) -> None:
    """Install the object-store credential/filesystem provider (the
    CometS3CredentialProvider SPI analog, reference:
    native/core/src/parquet/objectstore/s3.rs +
    cloud/s3/credential_bridge.rs and the s3-credential-provider design
    doc). ``fn(uri)`` is consulted for every ``scheme://`` path and may
    return ``(pyarrow_filesystem, fs_local_path)`` — e.g. an S3FileSystem
    built with session credentials — or None to fall through to
    ``pyarrow.fs.FileSystem.from_uri`` (ambient credentials). Configured
    per-session via conf key ``comet.scan.objectStore.credentialProvider``
    (a ``module:callable`` path) or directly through this function."""
    global _CREDENTIAL_PROVIDER
    _CREDENTIAL_PROVIDER = fn


_CONF_PROVIDER_CACHE: dict = {}


def _provider():
    if _CREDENTIAL_PROVIDER is not None:
        return _CREDENTIAL_PROVIDER
    from datafusion_comet_tpu.conf import CONF, OBJECT_STORE_CREDENTIAL_PROVIDER

    spec = CONF.get(OBJECT_STORE_CREDENTIAL_PROVIDER)
    if spec:
        if spec not in _CONF_PROVIDER_CACHE:
            import importlib

            mod, _, attr = spec.partition(":")
            _CONF_PROVIDER_CACHE[spec] = getattr(
                importlib.import_module(mod), attr)
        return _CONF_PROVIDER_CACHE[spec]
    return None


def resolve_filesystem(path: str):
    """URI → (pyarrow filesystem, fs-local path). s3://, gs://, hdfs://,
    file:// route through pyarrow.fs (the reference's object-store layer:
    native/core/src/parquet/objectstore/s3.rs + object_store crate), first
    consulting the credential-provider SPI (set_credential_provider); bare
    paths stay on the local FS with None filesystem (plain open())."""
    if "://" not in path:
        return None, path
    prov = _provider()
    if prov is not None:
        out = prov(path)
        if out is not None:
            return out
    from pyarrow import fs as pafs

    return pafs.FileSystem.from_uri(path)


def _expand(path: str) -> List[str]:
    import os

    fs, local = resolve_filesystem(path)
    if fs is not None:
        from pyarrow import fs as pafs

        info = fs.get_file_info(local)
        if info.type == pafs.FileType.Directory:
            sel = pafs.FileSelector(local, recursive=True)
            return sorted(
                f.path for f in fs.get_file_info(sel)
                if f.is_file and f.path.endswith(".parquet")
                and "/_" not in f.path[len(local):]
            )
        return [local]
    if os.path.isdir(path):
        out = []
        for dirpath, dirnames, files in os.walk(path):
            dirnames[:] = [d for d in dirnames if not d.startswith("_")]  # skip _temporary
            out += [os.path.join(dirpath, f) for f in files if f.endswith(".parquet")]
        return sorted(out)
    return [path]


def arrow_table_to_batch(
    tbl,
    schema: Optional[T.Schema] = None,
    columns: Optional[Sequence[str]] = None,
    capacity: Optional[int] = None,
) -> Batch:
    """Arrow table → engine Batch (host staging pass, then device_put)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    names = list(columns) if columns is not None else tbl.schema.names
    if schema is None:
        widths = {}
        for n in names:
            if n in tbl.schema.names and (
                pa.types.is_string(tbl.schema.field(n).type)
                or pa.types.is_large_string(tbl.schema.field(n).type)
                or pa.types.is_binary(tbl.schema.field(n).type)
            ):
                if tbl.num_rows:
                    w = pc.max(pc.binary_length(tbl.column(n))).as_py() or 1
                else:
                    w = 1
                widths[n] = max(int(w), 1)
        fields = []
        for n in names:
            fields.append(
                T.Field(
                    n,
                    arrow_field_to_dtype(tbl.schema.field(n), widths.get(n, 0)),
                    tbl.schema.field(n).nullable,
                )
            )
        schema = T.Schema(fields)

    n_rows = tbl.num_rows
    data: Dict[str, np.ndarray] = {}
    validity: Dict[str, np.ndarray] = {}
    for f in schema.fields:
        if f.name not in tbl.schema.names:
            # schema evolution: missing column → nulls (schema_adapter.rs)
            data[f.name] = np.zeros(n_rows, f.dtype.np_dtype() if not f.dtype.is_binary else object)
            if f.dtype.is_binary:
                data[f.name] = np.full(n_rows, None, object)
            validity[f.name] = np.zeros(n_rows, bool)
            continue
        col = tbl.column(f.name).combine_chunks()
        null_mask = np.asarray(col.is_null())
        validity[f.name] = ~null_mask
        if f.dtype.is_binary:
            # native staging: Arrow (offsets, data) buffers → padded matrix,
            # no per-row Python (io/native.py → native/staging.cpp pad_utf8)
            from datafusion_comet_tpu.io.native import pad_utf8_arrow

            arr = col if not isinstance(col, pa.ChunkedArray) else col.combine_chunks()
            bufs = arr.buffers()
            off_dtype = np.int64 if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type) else np.int32
            offsets = np.frombuffer(bufs[1], off_dtype, len(arr) + 1, arr.offset * np.dtype(off_dtype).itemsize)
            dbuf = np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
            mat, lens = pad_utf8_arrow(offsets, dbuf, f.dtype.byte_width)
            data[f.name] = (mat, lens)
        elif f.dtype.is_decimal:
            # scaled int64 when every value fits (the narrow fast path);
            # Python-int object column otherwise → two-limb staging
            data[f.name] = _decimal_to_ints(col, f.dtype)
        elif f.dtype.type_id == "DATE":
            data[f.name] = np.asarray(col.cast(pa.int32()))
        elif f.dtype.is_temporal:
            data[f.name] = np.asarray(col.cast(pa.timestamp("us")).cast(pa.int64()))
        else:
            arr = col.to_numpy(zero_copy_only=False)
            if null_mask.any():
                arr = np.where(null_mask, np.zeros(1, f.dtype.np_dtype()), arr)
            data[f.name] = arr.astype(f.dtype.np_dtype())
    return from_numpy(data, schema, capacity=capacity, validity=validity)


def _decimal_to_ints(col, dt: T.DataType) -> np.ndarray:
    """Arrow decimal column → scaled unscaled-int values, no per-row
    Python Decimal. Returns int64 when every value fits (narrow storage);
    otherwise an object array of Python ints (from_numpy stages two-limb)."""
    import pyarrow as pa

    c = col.cast(pa.decimal128(38, dt.scale))
    arr = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
    # decimal128 buffers are 16-byte little-endian [lo, hi] int64 pairs
    buf = (
        np.frombuffer(arr.buffers()[1], np.int64)
        if arr.buffers()[1] is not None
        else np.zeros(2 * len(arr), np.int64)
    )
    lo = buf[0::2][arr.offset : arr.offset + len(arr)]
    hi = buf[1::2][arr.offset : arr.offset + len(arr)]
    if np.array_equal(hi, lo >> 63):  # hi is pure sign extension
        return lo.copy()
    out = np.empty(len(lo), object)
    m64 = (1 << 64) - 1
    for i in range(len(lo)):
        out[i] = (int(hi[i]) << 64) | (int(lo[i]) & m64)
    return out


# -------------------------------------------------------------------------------------
# Write (reference: operators/parquet_writer.rs — native Parquet write)
# -------------------------------------------------------------------------------------


def write_parquet(batch: Batch, path: str, compression: str = "zstd") -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datafusion_comet_tpu.exec.batch import to_numpy

    host = to_numpy(batch)
    arrays = []
    names = []
    for f in batch.schema.fields:
        v = host[f.name]
        valid = host[f.name + "__valid"]
        if f.dtype.is_binary:
            arr = pa.array([x if m else None for x, m in zip(v, valid)], pa.string())
        elif f.dtype.is_decimal:
            import decimal as _d

            arr = pa.array(
                [
                    _d.Decimal(int(x)).scaleb(-f.dtype.scale) if m else None
                    for x, m in zip(v, valid)
                ],
                pa.decimal128(max(f.dtype.precision, 1), f.dtype.scale),
            )
        elif f.dtype.type_id == "DATE":
            arr = pa.array(np.ma.masked_array(v, ~valid).tolist(), pa.date32())
        elif f.dtype.is_temporal:
            arr = pa.array(np.ma.masked_array(v, ~valid).tolist(), pa.timestamp("us"))
        else:
            arr = pa.array(np.ma.masked_array(v, ~valid).tolist())
        arrays.append(arr)
        names.append(f.name)
    pq.write_table(pa.table(arrays, names=names), path, compression=compression)


def write_parquet_partitioned(
    batch: Batch,
    root: str,
    partition_cols: Sequence[str],
    compression: str = "zstd",
    task_attempt: int = 0,
) -> List[str]:
    """Hive-partitioned parquet write with a temp-dir commit protocol
    (reference: operators/parquet_writer.rs:496 — FileCommitProtocol
    work-dir/task-attempt temp files, atomically promoted on commit; JVM
    CometNativeWriteExec). Returns the committed file paths.

    Layout: root/col1=v1/col2=v2/part-<attempt>.parquet; data is staged
    under root/_temporary/<attempt>/ and renamed into place only after every
    partition file is fully written — a failed task leaves only temp files.
    """
    import os
    import shutil

    from datafusion_comet_tpu.exec.batch import to_numpy

    host = to_numpy(batch)
    n = len(next(iter(host.values()))) if host else 0
    part_vals = [host[c] for c in partition_cols]
    keys = sorted({tuple(pv[i] for pv in part_vals) for i in range(n)})
    tmp_root = os.path.join(root, "_temporary", str(task_attempt))
    os.makedirs(tmp_root, exist_ok=True)
    staged = []  # (tmp_path, final_path)
    data_cols = [f for f in batch.schema.fields if f.name not in partition_cols]
    import numpy as _np

    for key in keys:
        mask = _np.ones(n, bool)
        for pv, kv in zip(part_vals, key):
            mask &= _np.array([x == kv for x in pv])
        sub_data = {}
        sub_valid = {}
        for f in data_cols:
            sub_data[f.name] = host[f.name][mask] if not f.dtype.is_nested else [
                v for v, m in zip(host[f.name], mask) if m
            ]
            sub_valid[f.name] = host[f.name + "__valid"][mask]
        sub_batch = from_numpy(sub_data, T.Schema(data_cols), validity=sub_valid)
        rel = "/".join(f"{c}={v}" for c, v in zip(partition_cols, key))
        tmp_dir = os.path.join(tmp_root, rel)
        os.makedirs(tmp_dir, exist_ok=True)
        tmp_path = os.path.join(tmp_dir, f"part-{task_attempt:05d}.parquet")
        write_parquet(sub_batch, tmp_path, compression)
        final_dir = os.path.join(root, rel)
        staged.append((tmp_path, os.path.join(final_dir, f"part-{task_attempt:05d}.parquet")))
    # commit: promote every staged file, then drop the temp dir
    out = []
    for tmp_path, final_path in staged:
        os.makedirs(os.path.dirname(final_path), exist_ok=True)
        os.replace(tmp_path, final_path)
        out.append(final_path)
    shutil.rmtree(os.path.join(root, "_temporary"), ignore_errors=True)
    return out
