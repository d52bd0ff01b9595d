"""HBM budget enforcement (exec/memory.py wired into Session.execute):
over-budget stages with a streamable aggregate subtree run tiled
(exec/streaming.py) over device-resident slices; results match direct
execution. Reference analog: memory_pools reservations + spill — here the
budget is enforced by planning batch shapes up front."""

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.conf import CONF, MEMORY_FRACTION
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P

SCH = T.Schema([T.Field("g", T.INT64, False), T.Field("v", T.INT64, False)])


def make_session(n=4096):
    rng = np.random.default_rng(9)
    s = Session()
    s.register_numpy("t", {"g": rng.integers(0, 50, n).astype(np.int64),
                           "v": rng.integers(-100, 100, n).astype(np.int64)}, SCH)
    return s


def make_plan():
    agg = (P.Scan("t", SCH).filter(E.col("v") > E.lit(-50))
           .aggregate([E.col("g")], [E.AggExpr("sum", E.col("v"), "sv"),
                                     E.AggExpr("count", None, "n")]))
    agg.max_groups = 64
    return agg.sort([E.SortOrder(E.col("g"))])


def test_budget_streams_aggregate(monkeypatch):
    s = make_session()
    direct = s.collect(make_plan())

    import datafusion_comet_tpu.exec.streaming as ST
    calls = []
    orig = ST.TiledAggregator.run

    def counting(self, tiles):
        calls.append(1)
        return orig(self, tiles)

    monkeypatch.setattr(ST.TiledAggregator, "run", counting)
    old = CONF.get(MEMORY_FRACTION)
    CONF.set("comet.memory.fraction", 2.0e-5)  # ~86 KiB budget on CPU
    try:
        streamed = s.collect(make_plan())
    finally:
        CONF.set("comet.memory.fraction", old)
    assert calls, "tiled aggregate was not used under a tiny budget"
    for k in direct:
        np.testing.assert_array_equal(np.asarray(direct[k]),
                                      np.asarray(streamed[k]))


def test_within_budget_runs_direct(monkeypatch):
    s = make_session()
    import datafusion_comet_tpu.exec.streaming as ST
    calls = []
    orig = ST.TiledAggregator.run
    monkeypatch.setattr(ST.TiledAggregator, "run",
                        lambda self, tiles: calls.append(1) or orig(self, tiles))
    out = s.collect(make_plan())
    assert not calls
    assert len(out["g"]) == 50


def test_non_streamable_over_budget_warns(monkeypatch):
    s = make_session()
    # a join root is not streamable: proceeds with a warning
    plan = P.HashJoin(P.Scan("t", SCH),
                      P.Scan("t", SCH).project([E.col("g").alias("g2"),
                                                E.col("v").alias("v2")]),
                      (E.col("g"),), (E.col("g2"),), P.JoinType.LEFT_SEMI, "right")
    old = CONF.get(MEMORY_FRACTION)
    CONF.set("comet.memory.fraction", 2.0e-5)
    try:
        with pytest.warns(UserWarning, match="exceeds HBM budget"):
            out = s.collect(plan)
    finally:
        CONF.set("comet.memory.fraction", old)
    assert len(out["g"]) == 4096
