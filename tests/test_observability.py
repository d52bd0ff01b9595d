"""Config registry, Chrome-trace recorder, and metrics-annotated explain."""

import json
import os

import numpy as np

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.conf import CONF, Config, JOIN_FANOUT, generate_docs
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P
from datafusion_comet_tpu.observability.trace import Tracer, with_trace


class TestConfig:
    def test_defaults_and_set(self):
        c = Config()
        assert c.get(JOIN_FANOUT) == 4
        c.set("comet.exec.join.maxBuildMatches", 8)
        assert c.get(JOIN_FANOUT) == 8

    def test_unknown_key_and_type(self):
        c = Config()
        for bad in [("nope.key", 1)]:
            try:
                c.set(*bad)
                raise AssertionError("should raise")
            except KeyError:
                pass
        try:
            c.set("comet.exec.join.maxBuildMatches", "x")
            raise AssertionError("should raise")
        except TypeError:
            pass

    def test_docs(self):
        docs = generate_docs()
        assert "comet.shuffle.slotSlack" in docs


class TestTrace:
    def test_spans_and_counters(self, tmp_path):
        path = str(tmp_path / "trace.json")
        t = Tracer(path, enabled=True)
        with with_trace("op", t, detail="x"):
            t.counter("mem", t=t) if False else t.counter("mem", hbm=123)
        raw = open(path).read().rstrip().rstrip(",")
        events = json.loads(raw + "]") if raw.startswith("[") else None
        assert events and events[0]["ph"] == "B" and events[-1]["ph"] == "E"
        assert any(e["ph"] == "C" for e in events)


class TestExplain:
    def test_explain_with_metrics(self):
        sess = Session()
        sess.register_numpy(
            "t",
            {"k": np.arange(10, dtype=np.int32), "v": np.arange(10, dtype=np.int64)},
            T.Schema([T.Field("k", T.INT32), T.Field("v", T.INT64)]),
        )
        plan = (
            P.Scan("t", sess.table_schema("t"))
            .filter(E.col("k") < 5)
            .aggregate([], [E.AggExpr("sum", E.col("v"), "sv")])
        )
        plan.max_groups = 8
        txt = sess.explain(plan)
        assert "Filter" in txt and "Scan" in txt
        txt2 = sess.explain(plan, with_metrics=True)
        assert "rows=1" in txt2  # global agg emits one group
        assert "rows=5" in txt2  # filter keeps 5 rows


class TestOperatorMetrics:
    """Per-operator bytes + marginal timing (reference: metrics/utils.rs:30
    elapsed/memory counters pushed per operator)."""

    def _sess_plan(self):
        import numpy as np

        from datafusion_comet_tpu import types as T
        from datafusion_comet_tpu.exec.engine import Session
        from datafusion_comet_tpu.ir import expr as E
        from datafusion_comet_tpu.ir import plan as P

        s = T.Schema([T.Field("k", T.INT64), T.Field("v", T.FLOAT64)])
        sess = Session()
        sess.register_numpy(
            "t", {"k": np.arange(1000) % 7, "v": np.ones(1000)}, s)
        scan = P.Scan(table="t", source_schema=s)
        flt = P.Filter(child=scan, predicate=E.bind(
            (E.col("k") > E.lit(2, T.INT64)), s))
        return sess, P.bind_plan(flt)

    def test_explain_reports_capacity_and_bytes(self):
        sess, plan = self._sess_plan()
        tree = sess.explain(plan, with_metrics=True, as_tree=True)
        assert tree.output_bytes is not None and tree.output_bytes > 0
        assert tree.capacity is not None and tree.capacity >= 1000
        assert "bytes=" in tree.render() and "cap=" in tree.render()
        d = tree.to_dict()
        assert d["op"] == "Filter" and d["children"][0]["op"] == "Scan"

    def test_profile_ops_fills_marginal_elapsed(self):
        sess, plan = self._sess_plan()
        tree = sess.explain(plan, with_metrics=True, profile_ops=True,
                            as_tree=True)
        assert tree.elapsed_ms is not None and tree.elapsed_ms >= 0
        assert tree.children[0].elapsed_ms is not None


class TestDebugBatchChecker:
    """DebugBatchStream analog: per-operator batch invariant validation."""

    def test_valid_plan_passes_and_bad_batch_raises(self):
        import numpy as np

        from datafusion_comet_tpu import types as T
        from datafusion_comet_tpu.conf import CONF, DEBUG_VALIDATE_BATCHES
        from datafusion_comet_tpu.exec.batch import Batch, ColumnVector
        from datafusion_comet_tpu.exec.debug import BatchInvariantError, check_batch
        from datafusion_comet_tpu.exec.engine import Session
        from datafusion_comet_tpu.ir import expr as E
        from datafusion_comet_tpu.ir import plan as P

        s = T.Schema([T.Field("k", T.INT64)])
        sess = Session()
        sess.register_numpy("t", {"k": np.arange(100) % 5}, s)
        plan = P.Scan("t", s).filter(E.col("k") > E.lit(1, T.INT64)).aggregate(
            [E.col("k")], [E.AggExpr("count", None, "c")])
        old = CONF.get(DEBUG_VALIDATE_BATCHES)
        try:
            CONF.set(DEBUG_VALIDATE_BATCHES, True)
            out = sess.collect(plan)
            assert len(out["k"]) == 3
        finally:
            CONF.set(DEBUG_VALIDATE_BATCHES, old)

        import jax.numpy as jnp

        bad = Batch(
            (ColumnVector(jnp.zeros((4, 8), jnp.uint8), jnp.ones(4, bool),
                          jnp.full(4, 99, jnp.int32), T.string(8)),),
            jnp.ones(4, bool), T.Schema([T.Field("s", T.string(8))]))
        try:
            check_batch(bad, "Test")
            assert False, "expected BatchInvariantError"
        except BatchInvariantError as e:
            assert "lengths outside" in str(e)
