"""Plan IR serde round-trips (the protobuf-IR analog; reference:
QueryPlanSerde -> operator.proto -> planner.rs; plan-stability golden
pattern of CometPlanStabilitySuite)."""

import numpy as np
import pytest

from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P
from datafusion_comet_tpu.ir.serde import plan_from_json, plan_to_json
from datafusion_comet_tpu.models import tpch, tpcds


@pytest.mark.parametrize("qname", ["q1", "q3", "q6", "q14", "q18"])
def test_tpch_roundtrip_executes_identically(qname):
    plan = tpch.QUERIES[qname]()
    s = plan_to_json(plan)
    plan2 = plan_from_json(s)
    assert plan_to_json(plan2) == s  # stable fixed point

    sess = Session()
    for t in ("lineitem", "orders", "customer", "part", "supplier", "partsupp", "nation", "region"):
        sess.register_numpy(t, tpch.generate_table(t, 0.002), tpch.SCHEMAS[t])
    out1 = sess.collect(plan)
    out2 = sess.collect(plan2)
    for k in out1:
        np.testing.assert_array_equal(out1[k], out2[k])


@pytest.mark.parametrize("qname", ["q3", "q43", "q98", "q25"])
def test_tpcds_roundtrip_stable(qname):
    plan = tpcds.QUERIES[qname]()
    s = plan_to_json(plan)
    assert plan_to_json(plan_from_json(s)) == s


def test_nested_and_window_exprs():
    plan = (
        P.Explode(
            P.Scan("t", __import__("datafusion_comet_tpu.types", fromlist=["x"]).Schema([])),
            E.ArrayExpr("array", (E.lit(1), E.lit(2))),
            outer=True, pos=True,
        )
    )
    s = plan_to_json(plan)
    assert plan_to_json(plan_from_json(s)) == s


def test_version_check():
    with pytest.raises(ValueError):
        plan_from_json('{"version": 99, "plan": {}}')
