"""Operator differential tests vs a pandas oracle.

Mirrors the reference's dominant test pattern (SURVEY.md §4): run the same
query through the engine and through pandas, assert identical rows. Small
static capacities keep CPU-backend compiles fast.
"""

import numpy as np
import pandas as pd
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P


def sorted_rows(d, keys):
    df = pd.DataFrame({k: v for k, v in d.items() if not k.endswith("__valid")})
    return df.sort_values(keys, kind="stable").reset_index(drop=True)


@pytest.fixture(scope="module")
def sess():
    s = Session()
    rng = np.random.default_rng(7)
    n = 200
    s.register_numpy(
        "t",
        {
            "k": rng.integers(0, 8, n).astype(np.int32),
            "v": rng.normal(size=n),
            "i": rng.integers(-100, 100, n).astype(np.int64),
            "s": np.array([f"s{x:02d}" for x in rng.integers(0, 30, n)], object),
            "d": (9000 + rng.integers(0, 1000, n)).astype(np.int32),
        },
        T.Schema(
            [
                T.Field("k", T.INT32),
                T.Field("v", T.FLOAT64),
                T.Field("i", T.INT64),
                T.Field("s", T.string(4)),
                T.Field("d", T.DATE),
            ]
        ),
    )
    return s


def _pdf(sess):
    from datafusion_comet_tpu.exec.batch import to_numpy

    d = to_numpy(sess.tables["t"])
    return pd.DataFrame({k: v for k, v in d.items() if not k.endswith("__valid")})


SCHEMA_T = T.Schema(
    [
        T.Field("k", T.INT32),
        T.Field("v", T.FLOAT64),
        T.Field("i", T.INT64),
        T.Field("s", T.string(4)),
        T.Field("d", T.DATE),
    ]
)


class TestBasicOps:
    def test_filter_project(self, sess):
        plan = (
            P.Scan("t", SCHEMA_T)
            .filter((E.col("k") > 2) & (E.col("v") < 0.5))
            .project([E.col("k"), (E.col("i") + 1).alias("i1"), E.col("s")])
        )
        out = sess.collect(plan)
        df = _pdf(sess)
        exp = df[(df.k > 2) & (df.v < 0.5)]
        np.testing.assert_array_equal(out["k"], exp.k.values)
        np.testing.assert_array_equal(out["i1"], exp.i.values + 1)
        assert list(out["s"]) == list(exp.s.values)

    def test_sort_multi_key(self, sess):
        plan = P.Scan("t", SCHEMA_T).sort(
            [E.SortOrder(E.col("k")), E.SortOrder(E.col("v"), ascending=False)]
        )
        out = sess.collect(plan)
        df = _pdf(sess).sort_values(["k", "v"], ascending=[True, False], kind="stable")
        np.testing.assert_array_equal(out["k"], df.k.values)
        np.testing.assert_allclose(out["v"], df.v.values)

    def test_sort_strings_desc_fetch(self, sess):
        plan = P.Scan("t", SCHEMA_T).sort([E.SortOrder(E.col("s"), ascending=False)], fetch=7)
        out = sess.collect(plan)
        df = _pdf(sess).sort_values("s", ascending=False, kind="stable").head(7)
        assert list(out["s"]) == list(df.s.values)

    def test_limit_offset(self, sess):
        plan = P.Scan("t", SCHEMA_T).sort([E.SortOrder(E.col("i"))]).limit(5, offset=3)
        out = sess.collect(plan)
        df = _pdf(sess).sort_values("i", kind="stable").iloc[3:8]
        np.testing.assert_array_equal(out["i"], df.i.values)

    def test_union(self, sess):
        a = P.Scan("t", SCHEMA_T).filter(E.col("k") == 1)
        b = P.Scan("t", SCHEMA_T).filter(E.col("k") == 2)
        plan = P.Union((a, b)).sort([E.SortOrder(E.col("i")), E.SortOrder(E.col("v"))])
        out = sess.collect(plan)
        df = _pdf(sess)
        exp = pd.concat([df[df.k == 1], df[df.k == 2]]).sort_values(["i", "v"], kind="stable")
        np.testing.assert_array_equal(out["k"], exp.k.values)

    def test_expand(self, sess):
        plan = P.Expand(
            P.Scan("t", SCHEMA_T).limit(4),
            projections=(
                (E.col("k"), E.lit(0)),
                (E.col("k"), E.lit(1)),
            ),
            names=("k", "tag"),
        )
        out = sess.collect(plan)
        assert len(out["k"]) == 8
        np.testing.assert_array_equal(out["tag"][:2], [0, 1])


class TestAggregate:
    def test_sum_count_avg(self, sess):
        plan = P.Scan("t", SCHEMA_T).aggregate(
            [E.col("k")],
            [
                E.AggExpr("sum", E.col("i"), "si"),
                E.AggExpr("count", None, "c"),
                E.AggExpr("avg", E.col("v"), "av"),
                E.AggExpr("min", E.col("v"), "mn"),
                E.AggExpr("max", E.col("s"), "mx"),
            ],
        ).sort([E.SortOrder(E.col("k"))])
        out = sess.collect(plan)
        df = _pdf(sess)
        g = df.groupby("k").agg(si=("i", "sum"), c=("i", "size"), av=("v", "mean"),
                                mn=("v", "min"), mx=("s", "max")).reset_index()
        np.testing.assert_array_equal(out["k"], g.k.values)
        np.testing.assert_array_equal(out["si"], g.si.values)
        np.testing.assert_array_equal(out["c"], g.c.values)
        np.testing.assert_allclose(out["av"], g.av.values, rtol=1e-12)
        np.testing.assert_allclose(out["mn"], g.mn.values)
        assert list(out["mx"]) == list(g.mx.values)

    def test_agg_filter_clause(self, sess):
        plan = P.Scan("t", SCHEMA_T).aggregate(
            [E.col("k")],
            [E.AggExpr("sum", E.col("i"), "si", filter=E.col("v") > 0)],
        ).sort([E.SortOrder(E.col("k"))])
        out = sess.collect(plan)
        df = _pdf(sess)
        g = df.assign(ii=np.where(df.v > 0, df.i, 0)).groupby("k").ii.sum().reset_index()
        np.testing.assert_array_equal(out["si"], g.ii.values)

    def test_global_agg_variance(self, sess):
        plan = P.Scan("t", SCHEMA_T).aggregate(
            [],
            [
                E.AggExpr("var_samp", E.col("v"), "vs"),
                E.AggExpr("stddev_pop", E.col("v"), "sp"),
                E.AggExpr("corr", E.col("v"), "co", extra=(E.col("i"),)),
            ],
        )
        out = sess.collect(plan)
        df = _pdf(sess)
        np.testing.assert_allclose(out["vs"][0], df.v.var(ddof=1), rtol=1e-9)
        np.testing.assert_allclose(out["sp"][0], df.v.std(ddof=0), rtol=1e-9)
        np.testing.assert_allclose(out["co"][0], df.v.corr(df.i), rtol=1e-9)

    def test_partial_final_roundtrip(self, sess):
        """Two-phase aggregation must equal single-phase (the exchange
        contract, operator.proto:480)."""
        base = P.Scan("t", SCHEMA_T)
        single = base.aggregate(
            [E.col("k")],
            [E.AggExpr("sum", E.col("v"), "sv"), E.AggExpr("avg", E.col("i"), "ai"),
             E.AggExpr("var_samp", E.col("v"), "vv")],
        ).sort([E.SortOrder(E.col("k"))])
        partial = base.aggregate(
            [E.col("k")],
            [E.AggExpr("sum", E.col("v"), "sv"), E.AggExpr("avg", E.col("i"), "ai"),
             E.AggExpr("var_samp", E.col("v"), "vv")],
            mode=P.AggMode.PARTIAL,
        )
        bound_partial = P.bind_plan(partial)
        final = P.HashAggregate(
            bound_partial,
            tuple(E.col("k") for _ in [0]),
            bound_partial.agg_exprs,
            P.AggMode.FINAL,
            1 << 16,
        )
        plan = P.Sort(final, (E.SortOrder(E.col("k")),))
        a = sess.collect(single)
        b = sess.collect(plan)
        np.testing.assert_array_equal(a["k"], b["k"])
        np.testing.assert_allclose(a["sv"], b["sv"], rtol=1e-12)
        np.testing.assert_allclose(a["ai"], b["ai"], rtol=1e-12)
        np.testing.assert_allclose(a["vv"], b["vv"], rtol=1e-9)


class TestJoin:
    @pytest.fixture(scope="class")
    def jsess(self):
        s = Session(join_fanout=2)
        s.register_numpy(
            "f",
            {"fk": np.array([1, 2, 3, 4, 5, 2, 2, 9], np.int64), "x": np.arange(8, dtype=np.int64)},
            T.Schema([T.Field("fk", T.INT64), T.Field("x", T.INT64)]),
        )
        s.register_numpy(
            "dim",
            {"pk": np.array([1, 2, 3, 4], np.int64), "nm": np.array(["a", "b", "c", "d"], object)},
            T.Schema([T.Field("pk", T.INT64), T.Field("nm", T.string(2))]),
        )
        s.register_numpy(
            "dup",
            {"pk": np.array([2, 2, 2, 2, 2, 3], np.int64), "y": np.arange(6, dtype=np.int64)},
            T.Schema([T.Field("pk", T.INT64), T.Field("y", T.INT64)]),
        )
        return s

    def test_inner(self, jsess):
        plan = P.HashJoin(
            P.Scan("f", jsess.table_schema("f")),
            P.Scan("dim", jsess.table_schema("dim")),
            (E.col("fk"),), (E.col("pk"),), P.JoinType.INNER, "right",
        ).sort([E.SortOrder(E.col("x"))])
        out = jsess.collect(plan)
        np.testing.assert_array_equal(out["x"], [0, 1, 2, 3, 5, 6])
        assert list(out["nm"]) == ["a", "b", "c", "d", "b", "b"]

    def test_left_outer(self, jsess):
        plan = P.HashJoin(
            P.Scan("f", jsess.table_schema("f")),
            P.Scan("dim", jsess.table_schema("dim")),
            (E.col("fk"),), (E.col("pk"),), P.JoinType.LEFT, "right",
        ).sort([E.SortOrder(E.col("x"))])
        out = jsess.collect(plan)
        assert len(out["x"]) == 8
        assert out["nm"][4] is None and out["nm"][7] is None  # fk=5, fk=9

    def test_semi_anti(self, jsess):
        semi = P.HashJoin(
            P.Scan("f", jsess.table_schema("f")),
            P.Scan("dim", jsess.table_schema("dim")),
            (E.col("fk"),), (E.col("pk"),), P.JoinType.LEFT_SEMI, "right",
        ).sort([E.SortOrder(E.col("x"))])
        anti = P.HashJoin(
            P.Scan("f", jsess.table_schema("f")),
            P.Scan("dim", jsess.table_schema("dim")),
            (E.col("fk"),), (E.col("pk"),), P.JoinType.LEFT_ANTI, "right",
        ).sort([E.SortOrder(E.col("x"))])
        np.testing.assert_array_equal(jsess.collect(semi)["x"], [0, 1, 2, 3, 5, 6])
        np.testing.assert_array_equal(jsess.collect(anti)["x"], [4, 7])

    def test_duplicate_build_overflow_replan(self, jsess):
        """5 duplicate build keys with fanout=2 must trigger host re-plan."""
        plan = P.HashJoin(
            P.Scan("f", jsess.table_schema("f")),
            P.Scan("dup", jsess.table_schema("dup")),
            (E.col("fk"),), (E.col("pk"),), P.JoinType.INNER, "right",
        ).sort([E.SortOrder(E.col("x")), E.SortOrder(E.col("y"))])
        out = jsess.collect(plan)
        # fk=2 rows (x=1,5,6) × 5 matches + fk=3 (x=2) × 1 match = 16 pairs
        assert len(out["x"]) == 16
        np.testing.assert_array_equal(out["y"][:5], [0, 1, 2, 3, 4])

    def test_join_condition(self, jsess):
        plan = P.HashJoin(
            P.Scan("f", jsess.table_schema("f")),
            P.Scan("dup", jsess.table_schema("dup")),
            (E.col("fk"),), (E.col("pk"),), P.JoinType.INNER, "right",
            condition=E.col("y") > E.col("x"),
        ).sort([E.SortOrder(E.col("x")), E.SortOrder(E.col("y"))])
        out = jsess.collect(plan)
        assert all(y > x for x, y in zip(out["x"], out["y"]))

    def test_nested_loop(self, jsess):
        right = P.Scan("dup", jsess.table_schema("dup")).project(
            [E.col("pk").alias("dk"), E.col("y")]
        )
        plan = P.BroadcastNestedLoopJoin(
            P.Scan("dim", jsess.table_schema("dim")),
            right,
            P.JoinType.INNER,
            condition=E.col("pk") < E.col("y"),
        )
        out = jsess.collect(plan)
        assert len(out["pk"]) == 10  # pairs with dim.pk < dup.y
        assert all(p < y for p, y in zip(out["pk"], out["y"]))


class TestWindow:
    def test_ranking_and_running(self, sess):
        w1 = E.WindowExpr("row_number", None, "rn", partition_by=(E.col("k"),),
                          order_by=(E.SortOrder(E.col("v")),))
        w2 = E.WindowExpr("rank", None, "rk", partition_by=(E.col("k"),),
                          order_by=(E.SortOrder(E.col("s")),))
        w3 = E.WindowExpr("sum", E.col("i"), "rs", partition_by=(E.col("k"),),
                          order_by=(E.SortOrder(E.col("v")),),
                          frame=E.WindowFrame("rows", None, 0))
        plan = P.Window(P.Scan("t", SCHEMA_T), (w1, w2, w3)).sort(
            [E.SortOrder(E.col("k")), E.SortOrder(E.col("v"))]
        )
        out = sess.collect(plan)
        df = _pdf(sess)
        df = df.sort_values(["k", "v"], kind="stable")
        exp_rn = df.groupby("k").cumcount() + 1
        np.testing.assert_array_equal(out["rn"], exp_rn.values)
        exp_rs = df.groupby("k").i.cumsum()
        np.testing.assert_array_equal(out["rs"], exp_rs.values)
        dfr = _pdf(sess)
        exp_rk = dfr.groupby("k").s.rank(method="min").astype(int)
        got = pd.DataFrame({"k": out["k"], "v": out["v"], "rk": out["rk"]})
        chk = dfr.sort_values(["k", "v"], kind="stable")
        np.testing.assert_array_equal(out["rk"], exp_rk[chk.index].values)

    def test_lag_lead(self, sess):
        w = E.WindowExpr("lag", E.col("i"), "lg", partition_by=(E.col("k"),),
                         order_by=(E.SortOrder(E.col("v")),), offset=1)
        plan = P.Window(P.Scan("t", SCHEMA_T), (w,)).sort(
            [E.SortOrder(E.col("k")), E.SortOrder(E.col("v"))]
        )
        out = sess.collect(plan)
        df = _pdf(sess).sort_values(["k", "v"], kind="stable")
        exp = df.groupby("k").i.shift(1)
        got = np.where(out["lg__valid"], out["lg"].astype(float), np.nan)
        np.testing.assert_allclose(got, exp.values, equal_nan=True)


def test_sample_with_replacement_poisson():
    """Poisson sampling: mean output size ≈ fraction × n (distributional)."""
    import numpy as np

    from datafusion_comet_tpu import types as T
    from datafusion_comet_tpu.exec.engine import Session
    from datafusion_comet_tpu.ir import plan as P

    n = 4000
    schema = T.Schema([T.Field("x", T.INT64)])
    s = Session()
    s.register_numpy("t", {"x": np.arange(n, dtype=np.int64)}, schema)
    plan = P.Sample(P.Scan("t", schema), 0.0, 0.5, True, 42)
    out = s.collect(plan)
    got = len(out["x"])
    assert abs(got - 0.5 * n) < 0.1 * n  # within 10% of the mean
    # duplicates must exist with high probability at fraction 0.5
    assert len(set(out["x"].tolist())) < got


def test_collect_limit_and_take_ordered():
    """Hybrid-sink nodes (reference: CometCollectLimitExec /
    CometTakeOrderedAndProjectExec) lower to Limit / Sort(fetch)+Projection."""
    import numpy as np

    from datafusion_comet_tpu import types as T
    from datafusion_comet_tpu.exec.engine import Session
    from datafusion_comet_tpu.ir import expr as E
    from datafusion_comet_tpu.ir import plan as P
    from datafusion_comet_tpu.ir.serde import plan_from_json, plan_to_json

    sch = T.Schema([T.Field("k", T.INT64, False), T.Field("v", T.INT64, False)])
    s = Session()
    s.register_numpy("t", {"k": np.array([5, 3, 9, 1, 7], np.int64),
                           "v": np.arange(5, dtype=np.int64)}, sch)

    cl = P.CollectLimit(P.Scan("t", sch), 3)
    out = s.collect(cl)
    assert len(out["k"]) == 3

    top = P.TakeOrderedAndProject(
        P.Scan("t", sch), (E.SortOrder(E.col("k")),), 2,
        (E.col("k"), (E.col("v") * E.lit(10)).alias("v10")))
    out = s.collect(top)
    assert list(out["k"]) == [1, 3] and list(out["v10"]) == [30, 10]

    # serde roundtrip keeps the node type
    rt = plan_from_json(plan_to_json(top))
    assert isinstance(rt, P.TakeOrderedAndProject)
    out2 = s.collect(rt)
    assert list(out2["k"]) == [1, 3]
