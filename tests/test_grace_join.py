"""Grace (hash-partitioned) out-of-HBM join: exec/grace.py.

Differential tests in the reference's checkSparkAnswer style
(CometTestBase.scala:162): the same plan runs once under a normal budget
(direct in-HBM join) and once under a tiny monkeypatched budget that forces
the partitioned path; results must match row-for-row. Reference anchor for
the capability: spill-on-pressure partitioned shuffle buffering
(native/shuffle/src/shuffle_writer.rs:52) — the reference runs any join
shape at SF1000 by partitioning; this engine partitions in HBM.
"""

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P

N_FACT = 5000
N_DIM = 700


def _make_session(rng):
    s = Session()
    fk = rng.integers(0, 1000, N_FACT).astype(np.int64)
    s.register_numpy(
        "fact",
        {"fk": fk, "x": np.arange(N_FACT, dtype=np.int64),
         "v": rng.normal(size=N_FACT)},
        T.Schema([T.Field("fk", T.INT64), T.Field("x", T.INT64),
                  T.Field("v", T.FLOAT64)]),
    )
    pk = rng.permutation(1000)[:N_DIM].astype(np.int64)
    s.register_numpy(
        "dim",
        {"pk": pk, "w": rng.integers(0, 50, N_DIM).astype(np.int64)},
        T.Schema([T.Field("pk", T.INT64), T.Field("w", T.INT64)]),
    )
    # duplicate-keyed dim: fan-out > 1 exercises pair-list compaction
    dpk = np.repeat(pk[:100], 3)
    s.register_numpy(
        "dup",
        {"pk": dpk, "y": np.arange(len(dpk), dtype=np.int64)},
        T.Schema([T.Field("pk", T.INT64), T.Field("y", T.INT64)]),
    )
    return s


def _join_plan(s, right="dim", join_type=P.JoinType.INNER, sort_cols=("x",)):
    rschema = s.table_schema(right)
    rkeys = (E.col("pk"),)
    plan = P.HashJoin(
        P.Scan("fact", s.table_schema("fact")),
        P.Scan(right, rschema),
        (E.col("fk"),), rkeys, join_type, "right",
    )
    order = [E.SortOrder(E.col(c)) for c in sort_cols]
    return plan.sort(order)


def _force_grace(monkeypatch, budget=1 << 19):
    from datafusion_comet_tpu.exec import memory

    monkeypatch.setattr(memory, "device_budget_bytes",
                        lambda device=None: budget)


def _assert_same(expected, got):
    """Compare collect() outputs column-by-column, masking NULL slots
    (invalid slots hold unspecified buffer values)."""
    for c in expected:
        if c.endswith("__valid"):
            np.testing.assert_array_equal(expected[c], got[c],
                                          err_msg=f"validity {c}")
            continue
        vkey = c + "__valid"
        e, g = np.asarray(expected[c]), np.asarray(got[c])
        if vkey in expected and e.dtype != object:
            m = np.asarray(expected[vkey], bool)
            e, g = e[m], g[m]
        if e.dtype != object and np.issubdtype(e.dtype, np.floating):
            # partial-state merges re-associate float sums across partitions
            np.testing.assert_allclose(e, g, rtol=1e-9, atol=1e-12,
                                       err_msg=f"column {c}")
        else:
            np.testing.assert_array_equal(e, g, err_msg=f"column {c}")


class TestGraceJoin:
    @pytest.mark.parametrize("jt,cols", [
        (P.JoinType.INNER, ("x", "w")),
        (P.JoinType.LEFT, ("x",)),
        (P.JoinType.LEFT_SEMI, ("x",)),
        (P.JoinType.LEFT_ANTI, ("x",)),
    ])
    def test_matches_direct(self, rng, monkeypatch, jt, cols):
        s = _make_session(rng)
        plan = _join_plan(s, join_type=jt, sort_cols=cols[:1])
        expected = s.collect(plan)
        s2 = _make_session(np.random.default_rng(42))
        _force_grace(monkeypatch)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            got = s2.collect(_join_plan(s2, join_type=jt,
                                        sort_cols=cols[:1]))
        _assert_same(expected, got)

    def test_duplicate_build_keys(self, rng, monkeypatch):
        s = _make_session(rng)
        plan = _join_plan(s, right="dup", sort_cols=("x", "y"))
        expected = s.collect(plan)
        s2 = _make_session(np.random.default_rng(42))
        _force_grace(monkeypatch)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            got = s2.collect(_join_plan(s2, right="dup", sort_cols=("x", "y")))
        np.testing.assert_array_equal(expected["x"], got["x"])
        np.testing.assert_array_equal(expected["y"], got["y"])

    def test_agg_above_grace_join(self, rng, monkeypatch):
        """HashAggregate above the partitioned join: the union temp table
        feeds the rest of the stage."""
        def build(sess):
            j = P.HashJoin(
                P.Scan("fact", sess.table_schema("fact")),
                P.Scan("dim", sess.table_schema("dim")),
                (E.col("fk"),), (E.col("pk"),), P.JoinType.INNER, "right",
            )
            return j.aggregate(
                [E.col("w")],
                [E.AggExpr("sum", E.col("v"), "sv"),
                 E.AggExpr("count", E.col("x"), "cnt")],
            ).sort([E.SortOrder(E.col("w"))])

        s = _make_session(rng)
        expected = s.collect(build(s))
        s2 = _make_session(np.random.default_rng(42))
        _force_grace(monkeypatch)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            got = s2.collect(build(s2))
        np.testing.assert_array_equal(expected["w"], got["w"])
        np.testing.assert_array_equal(expected["cnt"], got["cnt"])
        np.testing.assert_allclose(expected["sv"], got["sv"], rtol=1e-9)

    def test_prepare_reruns_partitioned_path(self, rng, monkeypatch):
        """prepare()'s runner must re-execute the grace prestep each call
        (benchmark honesty) and produce stable results."""
        s = _make_session(rng)
        plan = _join_plan(s)
        expected = s.collect(plan)
        s2 = _make_session(np.random.default_rng(42))
        _force_grace(monkeypatch)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            run = s2.prepare(_join_plan(s2))
            from datafusion_comet_tpu.exec.batch import to_numpy

            for _ in range(2):
                got = to_numpy(run())
                live = np.asarray(got["x"]) is not None
                np.testing.assert_array_equal(expected["x"], got["x"])
                np.testing.assert_array_equal(expected["w"], got["w"])

    def test_mixed_int_width_keys(self, rng, monkeypatch):
        """INT32 fact key vs INT64 dim key: both sides must hash into the
        same partitions (grace_key_cast widens to INT64)."""
        s = Session()
        fk = rng.integers(0, 300, 2000).astype(np.int32)
        s.register_numpy(
            "f32", {"fk": fk, "x": np.arange(2000, dtype=np.int64)},
            T.Schema([T.Field("fk", T.INT32), T.Field("x", T.INT64)]))
        pk = np.arange(0, 300, 2, dtype=np.int64)
        s.register_numpy(
            "d64", {"pk": pk},
            T.Schema([T.Field("pk", T.INT64)]))

        def build(sess):
            return P.HashJoin(
                P.Scan("f32", sess.table_schema("f32")),
                P.Scan("d64", sess.table_schema("d64")),
                (E.col("fk"),), (E.col("pk"),), P.JoinType.INNER, "right",
            ).sort([E.SortOrder(E.col("x"))])

        expected = s.collect(build(s))
        _force_grace(monkeypatch, budget=1 << 17)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            got = s.collect(build(s))
        np.testing.assert_array_equal(expected["x"], got["x"])

    def test_string_keys(self, rng, monkeypatch):
        s = Session()
        names = np.array([f"k{i:03d}" for i in range(200)], object)
        fk = names[rng.integers(0, 200, 3000)]
        s.register_numpy(
            "fs", {"fk": fk, "x": np.arange(3000, dtype=np.int64)},
            T.Schema([T.Field("fk", T.string(8)), T.Field("x", T.INT64)]))
        s.register_numpy(
            "ds", {"pk": names[:120], "w": np.arange(120, dtype=np.int64)},
            T.Schema([T.Field("pk", T.string(8)), T.Field("w", T.INT64)]))

        def build(sess):
            return P.HashJoin(
                P.Scan("fs", sess.table_schema("fs")),
                P.Scan("ds", sess.table_schema("ds")),
                (E.col("fk"),), (E.col("pk"),), P.JoinType.INNER, "right",
            ).sort([E.SortOrder(E.col("x"))])

        expected = s.collect(build(s))
        _force_grace(monkeypatch, budget=1 << 17)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            got = s.collect(build(s))
        np.testing.assert_array_equal(expected["x"], got["x"])
        np.testing.assert_array_equal(expected["w"], got["w"])


class TestGraceDownstreamPushdown:
    """Partition-wise aggregation (exec/grace.py plan_grace_downstream):
    the stage's post-join aggregate (and partition-local top-K) runs inside
    the per-pair programs — no program ever sees the unioned join result.
    The q3 (group key = join key, top-K root) and q5 (small global groups)
    SF10 shapes, shrunk."""

    def _q3_shape(self, s):
        """Sort(fetch)(Agg(group incl. join key)(Join))."""
        j = P.HashJoin(
            P.Scan("fact", s.table_schema("fact")),
            P.Scan("dim", s.table_schema("dim")),
            (E.col("fk"),), (E.col("pk"),), P.JoinType.INNER, "right",
        )
        agg = j.aggregate(
            [E.col("fk"), E.col("w")],
            [E.AggExpr("sum", E.col("v"), "rev"),
             E.AggExpr("count", E.col("x"), "n")],
        )
        return agg.sort([E.SortOrder(E.col("rev"), ascending=False),
                         E.SortOrder(E.col("fk"))], fetch=10)

    def _q5_shape(self, s):
        """Agg(small groups NOT containing the join key)(Join) + sort."""
        j = P.HashJoin(
            P.Scan("fact", s.table_schema("fact")),
            P.Scan("dim", s.table_schema("dim")),
            (E.col("fk"),), (E.col("pk"),), P.JoinType.INNER, "right",
        )
        agg = j.aggregate(
            [E.col("w")],
            [E.AggExpr("sum", E.col("v"), "rev"),
             E.AggExpr("avg", E.col("x"), "ax")],
        )
        agg.max_groups = 64
        return agg.sort([E.SortOrder(E.col("w"))])

    @pytest.mark.parametrize("shape,mode", [("_q3_shape", "local"),
                                            ("_q5_shape", "partial")])
    def test_pushdown_matches_direct(self, rng, monkeypatch, shape, mode):
        s = _make_session(rng)
        build = getattr(self, shape)
        expected = s.collect(build(s))
        s2 = _make_session(np.random.default_rng(42))
        _force_grace(monkeypatch)
        # assert the intended mode is actually selected
        from datafusion_comet_tpu.exec import grace as G

        seen = []
        orig = G.plan_grace_downstream

        def spy(stage, gj):
            r = orig(stage, gj)
            seen.append(r[0] if r else None)
            return r

        monkeypatch.setattr(G, "plan_grace_downstream", spy)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            got = s2.collect(build(s2))
        assert seen and seen[0] == mode, seen
        _assert_same(expected, got)

    def test_local_mode_with_skip(self, rng, monkeypatch):
        s = _make_session(rng)

        def build(sess):
            p = self._q3_shape(sess)
            p.skip = 5
            p.fetch = 7
            return p

        expected = s.collect(build(s))
        s2 = _make_session(np.random.default_rng(42))
        _force_grace(monkeypatch)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            got = s2.collect(build(s2))
        _assert_same(expected, got)

    def test_local_mode_agg_root(self, rng, monkeypatch):
        """Partition-local groups with the aggregate AT the stage root
        (no sort): union of per-pair aggs is the stage output."""
        def build(sess):
            j = P.HashJoin(
                P.Scan("fact", sess.table_schema("fact")),
                P.Scan("dim", sess.table_schema("dim")),
                (E.col("fk"),), (E.col("pk"),), P.JoinType.INNER, "right",
            )
            return j.aggregate(
                [E.col("fk")],
                [E.AggExpr("sum", E.col("v"), "rev")],
            ).sort([E.SortOrder(E.col("fk"))])

        s = _make_session(rng)
        expected = s.collect(build(s))
        s2 = _make_session(np.random.default_rng(42))
        _force_grace(monkeypatch)
        from datafusion_comet_tpu.exec import grace as G

        seen = []
        orig = G.plan_grace_downstream

        def spy(stage, gj):
            r = orig(stage, gj)
            seen.append(r[0] if r else None)
            return r

        monkeypatch.setattr(G, "plan_grace_downstream", spy)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            got = s2.collect(build(s2))
        assert "local" in seen or "partial" in seen, seen
        _assert_same(expected, got)
