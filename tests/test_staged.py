"""Staged execution: join-heavy plans split into multiple compiled programs
with device-resident intermediates (comet.exec.stage.maxJoinsPerProgram).

Differential contract: staged output == monolithic output, bit-exact, for
the join-heaviest TPC-H queries (the ones whose monolithic XLA programs
exceed the TPU compiler's practical limits — q5, q18 class)."""

import numpy as np
import pytest

from datafusion_comet_tpu.conf import CONF, STAGE_MAX_JOINS
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.models import tpch

SF = 0.001


@pytest.fixture(scope="module")
def data():
    return tpch.generate_tables(
        ["lineitem", "orders", "customer", "supplier", "nation", "region",
         "part", "partsupp"], SF
    )


@pytest.fixture(scope="module")
def sess(data):
    s = Session()
    for name, cols in data.items():
        s.register_numpy(name, cols, tpch.SCHEMAS[name])
    return s


def _run(sess, plan, max_joins):
    prev = CONF.get(STAGE_MAX_JOINS)
    CONF.set(STAGE_MAX_JOINS, max_joins)
    try:
        return sess.collect(plan)
    finally:
        CONF.set(STAGE_MAX_JOINS, prev)


def assert_same(a, b):
    assert set(a.keys()) == set(b.keys())
    for k in a:
        av, bv = a[k], b[k]
        if av.dtype == object or bv.dtype == object:
            assert list(av) == list(bv), k
        else:
            np.testing.assert_array_equal(av, bv, err_msg=k)


@pytest.mark.parametrize("qname", ["q2", "q5", "q7", "q8", "q9", "q18", "q21"])
def test_staged_matches_monolithic(sess, qname):
    plan_fn = getattr(tpch, qname)
    mono = _run(sess, plan_fn(), 0)      # one program
    staged = _run(sess, plan_fn(), 1)    # one join per program
    assert_same(staged, mono)


def test_stage_temp_tables_freed(sess):
    before = set(sess.tables)
    _run(sess, tpch.q5(), 1)
    after = set(sess.tables)
    assert before == after, "stage temp tables must be freed after execute"


def test_plan_not_mutated_by_staging(sess):
    plan = tpch.q5()
    first = _run(sess, plan, 1)
    # same plan object re-executes fine (staging must not mutate the tree)
    second = _run(sess, plan, 1)
    assert_same(first, second)


def test_fanout_hint_avoids_retries():
    """Stats-derived per-join K sizes attempt 0 correctly for multi-match
    joins (every overflow retry would recompile the stage — minutes on the
    tunnel TPU)."""
    import numpy as np

    from datafusion_comet_tpu import types as T
    from datafusion_comet_tpu.exec.engine import Session
    from datafusion_comet_tpu.ir import expr as E
    from datafusion_comet_tpu.ir import plan as P

    s = Session()
    n_fact = 4096
    rng = np.random.default_rng(3)
    s.register_numpy("dim", {
        "k": np.arange(64, dtype=np.int64),
        "name": np.array([f"d{i}" for i in range(64)], object),
    }, T.Schema([T.Field("k", T.INT64, False), T.Field("name", T.string(4), False)]))
    s.register_numpy("fact", {
        "fk": rng.integers(0, 64, n_fact).astype(np.int64),
        "v": rng.integers(0, 100, n_fact).astype(np.int64),
    }, T.Schema([T.Field("fk", T.INT64, False), T.Field("v", T.INT64, False)]))
    # probe = dim, build = fact: ~64 matches per probe row >> default K=4
    plan = P.HashJoin(
        P.Scan("dim", s.tables["dim"].schema), P.Scan("fact", s.tables["fact"].schema),
        (E.col("k"),), (E.col("fk"),), P.JoinType.INNER, "right",
    ).aggregate([], [E.AggExpr("sum", E.col("v"), "sv")])

    compiles = []
    orig = Session.compile

    def counting(self, p, **kw):
        compiles.append(kw.get("join_fanout"))
        return orig(self, p, **kw)

    Session.compile = counting
    try:
        out = s.collect(plan)
    finally:
        Session.compile = orig
    assert len(compiles) == 1, f"expected attempt-0 success, compiles={compiles}"
    import pandas as pd

    fact_v = np.asarray(s.collect(P.Scan("fact", s.tables["fact"].schema))["v"])
    assert int(out["sv"][0]) == int(fact_v.sum())


def test_scalar_subquery_reuse():
    """ReuseSubquery analog: structurally equal scalar subqueries share one
    id and execute once."""
    import numpy as np

    from datafusion_comet_tpu import types as T
    from datafusion_comet_tpu.exec.engine import Session
    from datafusion_comet_tpu.ir import expr as E
    from datafusion_comet_tpu.ir import plan as P

    sch = T.Schema([T.Field("v", T.INT64, False)])
    s = Session()
    s.register_numpy("t", {"v": np.arange(16, dtype=np.int64)}, sch)
    sub = lambda: P.Scan("t", sch).aggregate([], [E.AggExpr("max", E.col("v"), "m")])  # noqa: E731
    a = s.scalar_subquery(sub())
    b = s.scalar_subquery(sub())
    assert a.subquery_id == b.subquery_id
    c = s.scalar_subquery(P.Scan("t", sch).aggregate([], [E.AggExpr("min", E.col("v"), "m")]))
    assert c.subquery_id != a.subquery_id
    out = s.collect(P.Scan("t", sch).project([(E.col("v") + a).alias("x"),
                                              (E.col("v") + b).alias("y")]))
    assert list(out["x"]) == list(out["y"]) == [15 + i for i in range(16)]


class TestAqeStageShrink:
    """Stage-boundary adaptive compaction: a drastically-selective filter
    between stages shrinks the temp table to its runtime size, and the
    prepared runner reproduces the same results through the cached jitted
    compaction (q18's qty>300 shape)."""

    def test_prepare_shrinks_and_stays_correct(self):
        import numpy as np

        from datafusion_comet_tpu import types as T
        from datafusion_comet_tpu.conf import CONF, STAGE_MAX_JOINS
        from datafusion_comet_tpu.exec.engine import Session
        from datafusion_comet_tpu.ir import expr as E
        from datafusion_comet_tpu.ir import plan as P

        rng = np.random.default_rng(3)
        n = 60_000
        fact = {"k": rng.integers(0, 5000, n).astype(np.int64),
                "v": rng.integers(0, 100, n).astype(np.int64)}
        dim = {"k2": np.arange(5000, dtype=np.int64),
               "w": rng.integers(0, 9, 5000).astype(np.int64)}
        fs = T.Schema([T.Field("k", T.INT64), T.Field("v", T.INT64)])
        ds = T.Schema([T.Field("k2", T.INT64), T.Field("w", T.INT64)])
        sess = Session()
        sess.register_numpy("fact", fact, fs)
        sess.register_numpy("dim", dim, ds)
        # per-key agg -> filter keeping a handful -> join back -> join dim
        per = P.Scan("fact", fs).aggregate(
            [E.col("k")], [E.AggExpr("sum", E.col("v"), "sv")])
        big = P.Filter(per, E.col("sv") > E.lit(4600, T.INT64))  # ~top few
        j1 = P.HashJoin(P.Scan("fact", fs), big, (E.col("k"),), (E.col("k"),),
                        P.JoinType.LEFT_SEMI, "right")
        j2 = P.HashJoin(j1, P.Scan("dim", ds), (E.col("k"),), (E.col("k2"),),
                        P.JoinType.INNER, "right")
        plan = j2.aggregate([], [E.AggExpr("count", None, "c"),
                                 E.AggExpr("sum", E.col("w"), "sw")])
        prev = CONF.get(STAGE_MAX_JOINS)
        try:
            CONF.set(STAGE_MAX_JOINS, 1)  # force stage boundaries
            direct = sess.collect(plan)
            run = sess.prepare(plan)
            import jax

            out1 = run()
            out2 = run()  # the cached jitted shrink must reproduce
            from datafusion_comet_tpu.exec.batch import to_numpy

            for got in (to_numpy(out1), to_numpy(out2)):
                assert got["c"][0] == direct["c"][0]
                assert got["sw"][0] == direct["sw"][0]
        finally:
            CONF.set(STAGE_MAX_JOINS, prev)
