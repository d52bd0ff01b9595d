"""CSV scan tests (reference: csv_scan.rs CsvScanExec + CometCsvScanSuite)."""

import os

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import to_numpy
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.io.csv import read_csv
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P


@pytest.fixture
def csv_path(tmp_path):
    p = tmp_path / "t.csv"
    p.write_text(
        "id,name,price,flag\n"
        "1,alpha,1.50,true\n"
        "2,beta,2.25,false\n"
        "3,,0.10,true\n"
        "4,delta,,false\n"
    )
    return str(p)


class TestReadCsv:
    def test_inferred_schema(self, csv_path):
        b = read_csv(csv_path)
        out = to_numpy(b)
        assert list(out["id"]) == [1, 2, 3, 4]
        assert list(out["name"]) == ["alpha", "beta", None, "delta"]
        assert list(out["flag"]) == [True, False, True, False]
        assert list(out["price__valid"]) == [True, True, True, False]

    def test_explicit_schema_decimal(self, csv_path):
        schema = T.Schema([
            T.Field("id", T.INT32),
            T.Field("name", T.string(8)),
            T.Field("price", T.decimal(7, 2)),
            T.Field("flag", T.BOOL),
        ])
        b = read_csv(csv_path, schema=schema)
        out = to_numpy(b)
        assert list(out["price"][:3]) == [150, 225, 10]  # scaled int64

    def test_projection(self, csv_path):
        b = read_csv(csv_path, projection=["name", "id"])
        assert b.schema.names == ["name", "id"]

    def test_delimiter_no_header(self, tmp_path):
        p = tmp_path / "d.csv"
        p.write_text("1|x\n2|y\n")
        b = read_csv(str(p), delimiter="|", header=False)
        out = to_numpy(b)
        assert list(out["f0"]) == [1, 2]
        assert list(out["f1"]) == ["x", "y"]

    def test_query_over_csv(self, csv_path):
        s = Session()
        s.register_csv("t", csv_path)
        schema = s.table_schema("t")
        out = s.collect(
            P.Scan("t", schema).filter(E.col("flag") == E.lit(True)).project([E.col("id")])
        )
        assert list(out["id"]) == [1, 3]
