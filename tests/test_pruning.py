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
