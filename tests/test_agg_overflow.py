"""Aggregate group-capacity overflow: detected and re-planned, never silent
(the static-capacity analog of dynamic hash-table growth)."""

import numpy as np

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P


def test_overflowing_groups_replanned():
    n = 3000  # 3000 distinct groups, max_groups = 64 → must re-plan
    schema = T.Schema([T.Field("k", T.INT64), T.Field("x", T.INT64)])
    s = Session()
    s.register_numpy("t", {"k": np.arange(n, dtype=np.int64),
                           "x": np.ones(n, np.int64)}, schema)
    agg = P.Scan("t", schema).aggregate([E.col("k")], [E.AggExpr("sum", E.col("x"), "s")])
    agg.max_groups = 64
    out = s.collect(agg)
    assert len(out["k"]) == n  # every group present after re-planning
    assert all(v == 1 for v in out["s"])


def test_exact_capacity_no_retry():
    n = 64
    schema = T.Schema([T.Field("k", T.INT64)])
    s = Session()
    s.register_numpy("t", {"k": np.arange(n, dtype=np.int64)}, schema)
    agg = P.Scan("t", schema).aggregate([E.col("k")], [E.AggExpr("count", None, "c")])
    agg.max_groups = 1024
    out = s.collect(agg)
    assert len(out["k"]) == n
