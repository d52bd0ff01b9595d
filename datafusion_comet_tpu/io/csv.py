"""CSV scan: file → device-resident SoA batches.

Reference contract: native/core/src/execution/operators/csv_scan.rs
(CsvScanExec — delimiter/header/quote/escape options, explicit schema or
inference, projection pushdown). Same phase-1 design as io/parquet.py:
host-side decode via pyarrow.csv, then one staging pass into the
fixed-capacity Batch layout; the host decode is the analog of the
reference's arrow-csv reader feeding DataFusion.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import Batch

__all__ = ["read_csv"]


def read_csv(
    path: str,
    schema: Optional[T.Schema] = None,
    delimiter: str = ",",
    header: bool = True,
    quote: str = '"',
    escape: Optional[str] = None,
    null_value: str = "",
    projection: Optional[Sequence[str]] = None,
    string_widths: Optional[Dict[str, int]] = None,
    capacity: Optional[int] = None,
) -> Batch:
    """Read a CSV file into a Batch. With no ``schema``, types are inferred
    by the arrow reader then mapped onto engine types (strings get padded
    widths from the observed maximum unless ``string_widths`` pins them)."""
    import pyarrow as pa
    import pyarrow.csv as pacsv

    from datafusion_comet_tpu.io.parquet import arrow_table_to_batch, arrow_to_engine_schema

    read_opts = pacsv.ReadOptions(autogenerate_column_names=not header)
    parse_opts = pacsv.ParseOptions(
        delimiter=delimiter,
        quote_char=quote if quote else False,
        escape_char=escape if escape else False,
    )
    convert_kwargs = dict(null_values=[null_value], strings_can_be_null=True)
    if schema is not None:
        col_types = {}
        for f in schema.fields:
            col_types[f.name] = _engine_to_arrow_type(f.dtype)
        convert_opts = pacsv.ConvertOptions(column_types=col_types, **convert_kwargs)
    else:
        convert_opts = pacsv.ConvertOptions(**convert_kwargs)
    table = pacsv.read_csv(
        path, read_options=read_opts, parse_options=parse_opts, convert_options=convert_opts
    )
    if projection is not None:
        table = table.select(list(projection))
        if schema is not None:
            schema = T.Schema([schema.field(n) for n in projection])
    if schema is None:
        widths = dict(string_widths or {})
        for i, f in enumerate(table.schema):
            if pa.types.is_string(f.type) and f.name not in widths:
                col = table.column(i)
                widths[f.name] = max(
                    (len(str(v)) for v in col.to_pylist() if v is not None), default=1
                )
        schema = arrow_to_engine_schema(table.schema, widths)
    return arrow_table_to_batch(table, schema, capacity=capacity)


def _engine_to_arrow_type(dt: T.DataType):
    import pyarrow as pa

    m = {
        "BOOL": pa.bool_(),
        "INT8": pa.int8(),
        "INT16": pa.int16(),
        "INT32": pa.int32(),
        "INT64": pa.int64(),
        "FLOAT": pa.float32(),
        "DOUBLE": pa.float64(),
        "DATE": pa.date32(),
        "TIMESTAMP": pa.timestamp("us", tz="UTC"),
        "TIMESTAMP_NTZ": pa.timestamp("us"),
    }
    if dt.type_id in m:
        return m[dt.type_id]
    if dt.is_decimal:
        return pa.decimal128(dt.precision, dt.scale)
    if dt.is_binary:
        return pa.string()
    raise NotImplementedError(f"csv type {dt!r}")
