"""Capacity/overflow logic at realistic cardinality (round-1 verdict: the
differential suites ran at SF=0.001 where the overflow/skew machinery never
fires). Here SF=0.05 (~300k lineitem rows) runs capacity-sensitive queries
twice — stats-derived capacities vs deliberately undersized capacities that
force the overflow re-planning loop — and requires identical results. A
distributed 8-device run of the skew-heavy q18/q21 must also match."""

import numpy as np
import pytest

from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import plan as P
from datafusion_comet_tpu.models import tpch

SF = 0.05
TABLES = ["lineitem", "orders", "customer", "supplier", "nation", "region", "part", "partsupp"]


@pytest.fixture(scope="module")
def data():
    return tpch.generate_tables(TABLES, SF)


@pytest.fixture(scope="module")
def sess(data):
    s = Session()
    for name, cols in data.items():
        s.register_numpy(name, cols, tpch.SCHEMAS[name])
    return s


def _undersize(plan: P.PlanNode) -> P.PlanNode:
    """Set every aggregate/join capacity below the data's needs so the first
    attempt overflows and the re-planning loop (4x per retry, maxRetries=4)
    must recover — q3/q18 need ~75k order groups at this SF, so 4096 forces
    two growth rounds while staying recoverable."""
    if isinstance(plan, P.HashAggregate):
        plan.max_groups = 4096
    if isinstance(plan, (P.HashJoin, P.SortMergeJoin)):
        plan.fanout_hint = 1
        plan.unique_build_hint = False
    for c in plan.children():
        _undersize(c)
    return plan


def canon(out):
    rows = []
    n = len(next(iter(out.values()))) if out else 0
    keys = [k for k in out if not k.endswith("__valid")]
    for i in range(n):
        rows.append(tuple(
            None if (f"{k}__valid" in out and not out[f"{k}__valid"][i])
            else (out[k][i].item() if hasattr(out[k][i], "item") else out[k][i])
            for k in keys))
    return rows


@pytest.mark.parametrize("qname", ["q1", "q3", "q18", "q21"])
def test_undersized_capacities_recover(sess, qname):
    make = tpch.QUERIES[qname]
    base = canon(sess.collect(make()))
    assert base, f"{qname} returned no rows at SF={SF}"
    stressed = canon(sess.collect(_undersize(make())))
    assert stressed == base


def test_distributed_parity_at_scale(data):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from datafusion_comet_tpu.parallel.executor import DistributedSession

    ds = DistributedSession()
    for name, cols in data.items():
        ds.register_numpy(name, cols, tpch.SCHEMAS[name])
    s = Session()
    for name, cols in data.items():
        s.register_numpy(name, cols, tpch.SCHEMAS[name])
    for qname in ["q18", "q21"]:
        got = canon(ds.collect(tpch.QUERIES[qname]()))
        exp = canon(s.collect(tpch.QUERIES[qname]()))
        assert sorted(map(str, got)) == sorted(map(str, exp)), qname


def test_inner_join_builds_on_smaller_side(sess):
    """RewriteJoin analog: stats walk flips an INNER join's build to the
    smaller input (2x margin); outer joins keep the preserved-side pinning."""
    from datafusion_comet_tpu.exec.stats import derive_capacities
    from datafusion_comet_tpu.ir import expr as E

    small = P.Scan("nation", tpch.SCHEMAS["nation"])
    big = P.Scan("lineitem", tpch.SCHEMAS["lineitem"])
    j = P.HashJoin(small, big, (E.col("n_nationkey"),), (E.col("l_suppkey"),))
    bound = P.bind_plan(j)
    derive_capacities(bound, sess.stats)
    assert bound.build_side == "left"
    # LEFT OUTER with small left: probe must stay the preserved (left) side
    jo = P.HashJoin(small, big, (E.col("n_nationkey"),), (E.col("l_suppkey"),),
                    join_type=P.JoinType.LEFT)
    bound = P.bind_plan(jo)
    derive_capacities(bound, sess.stats)
    assert bound.build_side == "right"


def test_swapped_build_side_result_parity(sess, data):
    """The same join executed with build=left (stats pick) and build=right
    (forced) must agree — q3's orders⋈lineitem shape."""
    import pandas as pd
    from datafusion_comet_tpu.ir import expr as E

    def q(build):
        j = P.HashJoin(
            P.Scan("supplier", tpch.SCHEMAS["supplier"]),
            P.Scan("lineitem", tpch.SCHEMAS["lineitem"]),
            (E.col("s_suppkey"),), (E.col("l_suppkey"),),
            build_side=build,
        )
        return j.aggregate(
            [E.col("s_nationkey")],
            [E.AggExpr("sum", E.col("l_quantity"), "q"),
             E.AggExpr("count", E.col("l_orderkey"), "c")],
        ).sort([E.SortOrder(E.col("s_nationkey"))])

    a = sess.collect(q("left"))
    b = sess.collect(q("right"))
    np.testing.assert_array_equal(a["s_nationkey"], b["s_nationkey"])
    np.testing.assert_array_equal(a["c"], b["c"])
    np.testing.assert_allclose(np.asarray(a["q"], float), np.asarray(b["q"], float))
