"""Operator/expression registry + per-node config gates (reference:
operator_registry.rs:32 builder registration; CometConf.scala:209-243
per-operator/per-expression enabled toggles; withFallbackReason surface,
CometSparkSessionExtensions.scala:301)."""

import dataclasses

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.conf import CONF, generate_docs
from datafusion_comet_tpu.exec import registry as REG
from datafusion_comet_tpu.exec.engine import Session, UnsupportedPlanError
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P

SCH = T.Schema([T.Field("k", T.INT64, False), T.Field("v", T.INT64, False)])


@pytest.fixture()
def sess():
    s = Session()
    s.register_numpy("t", {"k": np.arange(8, dtype=np.int64),
                           "v": np.arange(8, dtype=np.int64) * 10}, SCH)
    return s


def _plan():
    return (P.Scan("t", SCH).filter(E.col("k") > E.lit(2))
            .aggregate([], [E.AggExpr("sum", E.col("v"), "s")]))


def test_operator_gate_blocks_execute_and_validate(sess):
    key = "comet.exec.operator.HashAggregate.enabled"
    CONF.set(key, False)
    try:
        reasons = sess.validate(_plan())
        assert reasons == [f"operator HashAggregate disabled by {key}"]
        with pytest.raises(UnsupportedPlanError) as ei:
            sess.collect(_plan())
        assert ei.value.reasons == reasons
    finally:
        CONF.set(key, True)
    assert sess.validate(_plan()) == []
    assert int(sess.collect(_plan())["s"][0]) == 250


def test_expression_gate_blocks_with_reason(sess):
    key = "comet.expr.gt.enabled"
    CONF.set(key, False)
    try:
        assert sess.validate(_plan()) == [f"expression gt disabled by {key}"]
        with pytest.raises(UnsupportedPlanError):
            sess.collect(_plan())
    finally:
        CONF.set(key, True)


def test_function_expression_gate(sess):
    plan = P.Scan("t", SCH).project(
        [E.MathFunc("sqrt", (E.col("v").cast(T.FLOAT64),)).alias("r")])
    key = "comet.expr.sqrt.enabled"
    CONF.set(key, False)
    try:
        assert sess.validate(plan) == [f"expression sqrt disabled by {key}"]
    finally:
        CONF.set(key, True)
    assert sess.validate(plan) == []


def test_custom_operator_extension(sess):
    """A downstream extension registers a new plan node + executor without
    touching the engine (the operator_registry.rs extension contract)."""

    @dataclasses.dataclass(eq=False)
    class EveryOther(P.PlanNode):
        child: P.PlanNode

        def children(self):
            return (self.child,)

        def with_children(self, kids):
            return EveryOther(kids[0])

    if EveryOther not in REG.OPERATORS.registered():
        @REG.OPERATORS.register(EveryOther, name="EveryOther")
        def _exec_every_other(plan, tables, ctx, flags, fanout, metrics):
            import jax.numpy as jnp
            from datafusion_comet_tpu.exec.engine import run_plan

            child = run_plan(plan.child, tables, ctx, flags, fanout)
            keep = (jnp.arange(child.capacity) % 2) == 0
            return child.with_mask(child.row_mask & keep)

    node = EveryOther(P.Scan("t", SCH))
    node.schema = SCH
    bound = P.bind_plan(P.Projection(node, (E.col("v"),)))
    out = sess.collect(bound)
    assert list(out["v"]) == [0, 20, 40, 60]


def test_unregistered_node_reports_reason():
    @dataclasses.dataclass(eq=False)
    class Mystery(P.PlanNode):
        child: P.PlanNode

        def children(self):
            return (self.child,)

    with pytest.raises(UnsupportedPlanError) as ei:
        REG.OPERATORS.resolve(Mystery)
    assert "no registered executor" in ei.value.reasons[0]


def test_gates_in_generated_docs():
    docs = generate_docs()
    assert "comet.exec.operator.HashJoin.enabled" in docs
    assert "comet.expr.substring.enabled" in docs
    # the gate expansion is the bulk of the CometConf-style surface
    from datafusion_comet_tpu.conf import _REGISTRY
    assert len(_REGISTRY) >= 75
