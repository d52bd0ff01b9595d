"""Sort-order propagation (ir/ordering.py) + its two consumers: redundant
Sort elision and the SortMergeJoin presorted-build merge path (reference:
DataFusion output_ordering / EquivalenceProperties, SortMergeJoinExec)."""

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P
from datafusion_comet_tpu.ir.ordering import ordering_satisfies, out_ordering

SCH = T.Schema([T.Field("g", T.INT64, False), T.Field("h", T.INT64, True),
                T.Field("v", T.INT64, False)])


def make_session(n=512):
    rng = np.random.default_rng(11)
    s = Session()
    h = rng.integers(0, 6, n).astype(np.int64)
    s.register_numpy("t", {
        "g": rng.integers(0, 9, n).astype(np.int64),
        "h": h,
        "v": rng.integers(-40, 40, n).astype(np.int64),
    }, SCH, validity={"h": rng.random(n) > 0.1})
    return s


def test_aggregate_output_is_ordered():
    agg = P.Scan("t", SCH).aggregate(
        [E.col("g"), E.col("h")], [E.AggExpr("sum", E.col("v"), "sv")])
    agg.max_groups = 128
    bound = P.bind_plan(agg)
    ord_ = out_ordering(bound)
    assert ord_[0] == ("g", True, None)       # non-nullable: placement free
    assert ord_[1] == ("h", True, False)      # nullable: null group LAST
    assert ordering_satisfies(ord_, [("g", True, True)])   # prefix, non-null
    assert not ordering_satisfies(ord_, [("h", True, True)])  # wrong prefix


def test_sort_elision_over_aggregate():
    s = make_session()
    agg = P.Scan("t", SCH).aggregate(
        [E.col("g")], [E.AggExpr("sum", E.col("v"), "sv")])
    agg.max_groups = 32
    plan = agg.sort([E.SortOrder(E.col("g"))])
    stages = s._plan_stages(plan)
    assert not isinstance(stages[-1][1], P.Sort), "Sort should be elided"
    out = s.collect(plan)
    gs = list(out["g"])
    assert gs == sorted(gs)
    # fetch converts to a Limit over the ordered aggregate
    plan2 = agg.sort([E.SortOrder(E.col("g"))], fetch=3)
    stages2 = s._plan_stages(plan2)
    assert isinstance(stages2[-1][1], P.Limit)
    out2 = s.collect(plan2)
    assert list(out2["g"]) == gs[:3]


def test_no_elision_for_nullable_nulls_first():
    s = make_session()
    agg = P.Scan("t", SCH).aggregate(
        [E.col("h")], [E.AggExpr("sum", E.col("v"), "sv")])
    agg.max_groups = 32
    # default ASC = NULLS FIRST, but the aggregate emits the null group
    # last and h is nullable: the Sort must stay
    plan = agg.sort([E.SortOrder(E.col("h"))])
    stages = s._plan_stages(plan)
    assert isinstance(stages[-1][1], P.Sort)
    out = s.collect(plan)
    valid = list(out["h__valid"])
    assert not valid[0]  # null group sorted first per Spark default


def test_no_elision_for_descending():
    s = make_session()
    agg = P.Scan("t", SCH).aggregate(
        [E.col("g")], [E.AggExpr("sum", E.col("v"), "sv")])
    agg.max_groups = 32
    plan = agg.sort([E.SortOrder(E.col("g"), ascending=False)])
    stages = s._plan_stages(plan)
    assert isinstance(stages[-1][1], P.Sort)


def test_smj_merge_path_presorted_build():
    s = make_session()
    rng = np.random.default_rng(7)
    s.register_numpy("d", {
        "k": rng.permutation(np.arange(9)).astype(np.int64),
        "name": np.array([f"n{i}" for i in range(9)], object),
    }, T.Schema([T.Field("k", T.INT64, False), T.Field("name", T.string(4), False)]))

    sorted_dim = P.Scan("d", s.tables["d"].schema).sort([E.SortOrder(E.col("k"))])
    smj = P.SortMergeJoin(
        P.Scan("t", SCH), sorted_dim, (E.col("g"),), (E.col("k"),),
        P.JoinType.INNER,
    )
    agg = smj.aggregate([E.col("name")], [E.AggExpr("sum", E.col("v"), "sv")])
    agg.max_groups = 32
    plan = agg.sort([E.SortOrder(E.col("name"))])

    stages = s._plan_stages(plan)

    def find_smj(p):
        if isinstance(p, P.SortMergeJoin):
            return p
        for c in p.children():
            r = find_smj(c)
            if r is not None:
                return r
        return None

    node = find_smj(stages[-1][1])
    assert node is not None and getattr(node, "presorted_build", False), \
        "merge path not engaged on a pre-sorted build side"
    out = s.collect(plan)

    # differential vs plain HashJoin
    hj = P.HashJoin(P.Scan("t", SCH),
                    P.Scan("d", s.tables["d"].schema),
                    (E.col("g"),), (E.col("k"),), P.JoinType.INNER, "right")
    agg2 = hj.aggregate([E.col("name")], [E.AggExpr("sum", E.col("v"), "sv")])
    agg2.max_groups = 32
    ref = s.collect(agg2.sort([E.SortOrder(E.col("name"))]))
    assert list(out["name"]) == list(ref["name"])
    assert list(out["sv"]) == list(ref["sv"])
