"""Distributed coverage additions: explode + window over the 8-device mesh."""

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P
from datafusion_comet_tpu.parallel.executor import DistributedSession

SCHEMA = T.Schema([T.Field("id", T.INT32), T.Field("xs", T.list_(T.INT32, 4))])


def test_distributed_explode_matches_local():
    rng = np.random.default_rng(3)
    n = 400
    data = {
        "id": np.arange(n, dtype=np.int32),
        "xs": [list(rng.integers(0, 9, rng.integers(0, 4))) for _ in range(n)],
    }
    plan = P.Explode(P.Scan("t", SCHEMA), E.col("xs"), pos=True).sort(
        [E.SortOrder(E.col("id")), E.SortOrder(E.col("pos"))]
    )
    d = DistributedSession()
    d.register_numpy("t", data, SCHEMA)
    got = d.collect(plan)
    s = Session()
    s.register_numpy("t", data, SCHEMA)
    ref = s.collect(plan)
    np.testing.assert_array_equal(got["id"], ref["id"])
    np.testing.assert_array_equal(got["col"], ref["col"])


def test_distributed_window_matches_local():
    rng = np.random.default_rng(5)
    n = 600
    schema = T.Schema([T.Field("g", T.INT32), T.Field("x", T.INT64)])
    data = {"g": rng.integers(0, 6, n).astype(np.int32),
            "x": rng.integers(0, 1000, n).astype(np.int64)}
    w = E.WindowExpr("rank", None, "r", partition_by=(E.col("g"),),
                     order_by=(E.SortOrder(E.col("x")),))
    # window needs whole partitions per device: hash-exchange on g first
    plan = P.Window(
        P.ShuffleExchange(P.Scan("t", schema), "hash", (E.col("g"),)),
        (w,),
    ).sort([E.SortOrder(E.col("g")), E.SortOrder(E.col("x")), E.SortOrder(E.col("r"))])
    d = DistributedSession()
    d.register_numpy("t", data, schema)
    got = d.collect(plan)
    local_plan = P.Window(P.Scan("t", schema), (w,)).sort(
        [E.SortOrder(E.col("g")), E.SortOrder(E.col("x")), E.SortOrder(E.col("r"))]
    )
    s = Session()
    s.register_numpy("t", data, schema)
    ref = s.collect(local_plan)
    np.testing.assert_array_equal(got["r"], ref["r"])
    np.testing.assert_array_equal(got["x"], ref["x"])


def test_distributed_bnlj_matches_local():
    import numpy as np

    from datafusion_comet_tpu import types as T

    rng = np.random.default_rng(9)
    schema_l = T.Schema([T.Field("a", T.INT64)])
    schema_r = T.Schema([T.Field("b", T.INT64)])
    dl = {"a": rng.integers(0, 50, 300).astype(np.int64)}
    dr = {"b": rng.integers(0, 50, 20).astype(np.int64)}
    for jt in (P.JoinType.INNER, P.JoinType.LEFT, P.JoinType.FULL):
        plan = P.BroadcastNestedLoopJoin(
            P.Scan("l", schema_l), P.Scan("r", schema_r), jt,
            E.col("a") < E.col("b"),
        ).sort([E.SortOrder(E.col("a")), E.SortOrder(E.col("b"))])
        d = DistributedSession()
        d.register_numpy("l", dl, schema_l)
        d.register_numpy("r", dr, schema_r)
        got = d.collect(plan)
        s = Session()
        s.register_numpy("l", dl, schema_l)
        s.register_numpy("r", dr, schema_r)
        ref = s.collect(plan)
        for k in ("a", "b"):
            assert [x if ok else None for x, ok in zip(got[k], got[k + "__valid"])] == \
                   [x if ok else None for x, ok in zip(ref[k], ref[k + "__valid"])], jt


class TestOuterJoinsHashPartitioned:
    """FULL/outer-on-build-side joins stay hash co-partitioned on both sides
    (no single-partition cliff): unmatched rows emit exactly once because
    every key — incl. null-keyed outer rows — lives on one device."""

    def _data(self):
        rng = np.random.default_rng(11)
        n = 5000
        lk = rng.integers(0, 800, n).astype(np.float64)
        lk[rng.random(n) < 0.05] = np.nan  # null keys via __valid below
        l_valid = ~np.isnan(lk)
        lk = np.where(l_valid, lk, 0).astype(np.int64)
        rk = rng.integers(400, 1200, 1500).astype(np.int64)
        return (
            {"lk": lk, "lk__valid": l_valid, "lv": np.arange(n, dtype=np.int64)},
            {"rk": rk, "rv": np.arange(1500, dtype=np.int64)},
        )

    def _run(self, sess_cls, jt, build, *args):
        ldata, rdata = self._data()
        ls = T.Schema([T.Field("lk", T.INT64), T.Field("lv", T.INT64)])
        rs = T.Schema([T.Field("rk", T.INT64), T.Field("rv", T.INT64)])
        sess = sess_cls(*args)
        sess.register_numpy("l", ldata, ls)
        sess.register_numpy("r", rdata, rs)
        plan = P.HashJoin(
            P.Scan(table="l", source_schema=ls),
            P.Scan(table="r", source_schema=rs),
            (E.bind(E.col("lk"), ls),), (E.bind(E.col("rk"), rs),),
            jt, build)
        out = sess.collect(P.bind_plan(plan))
        rows = []
        n = len(out["lv"])
        for i in range(n):
            rows.append(tuple(
                None if not out.get(f"{c}__valid", np.ones(n, bool))[i]
                else int(out[c][i]) for c in ("lk", "lv", "rk", "rv")))
        return sorted(rows, key=lambda t: tuple((x is None, x) for x in t))

    @pytest.mark.parametrize("jt,build,single_build", [
        (P.JoinType.FULL, "right", "right"),
        (P.JoinType.FULL, "left", "left"),
        (P.JoinType.RIGHT, "right", "left"),
        # LEFT with build=left is never produced single-node (probe must be
        # the outer side); the single-device oracle flips the build side,
        # which is result-equivalent
        (P.JoinType.LEFT, "left", "right"),
    ])
    def test_outer_join_matches_single_device(self, jt, build, single_build):
        from datafusion_comet_tpu.parallel.executor import DistributedSession
        from datafusion_comet_tpu.parallel.mesh import make_mesh

        single = self._run(Session, jt, single_build)
        dist = self._run(DistributedSession, jt, build, make_mesh(8))
        assert dist == single

    def test_full_join_plan_has_no_single_exchange(self):
        from datafusion_comet_tpu.parallel.executor import distribute

        ls = T.Schema([T.Field("lk", T.INT64), T.Field("lv", T.INT64)])
        rs = T.Schema([T.Field("rk", T.INT64), T.Field("rv", T.INT64)])
        plan = P.bind_plan(P.HashJoin(
            P.Scan(table="l", source_schema=ls),
            P.Scan(table="r", source_schema=rs),
            (E.bind(E.col("lk"), ls),), (E.bind(E.col("rk"), rs),),
            P.JoinType.FULL, "right"))
        d = distribute(plan, 8)
        kinds = []

        def walk(n):
            if isinstance(n, P.ShuffleExchange):
                kinds.append(n.partitioning)
            for c in n.children():
                walk(c)

        walk(d)
        assert kinds == ["hash", "hash"]


def test_2d_dcn_ici_mesh_matches_single():
    """Multi-host-shaped (dcn, ici) mesh: collectives ride the flattened
    axis tuple; results match the single-device session (the DCN story —
    outer axis spans hosts, inner axis one host's chips)."""
    from datafusion_comet_tpu.models import tpch
    from datafusion_comet_tpu.parallel.mesh import make_mesh_2d

    data = tpch.generate_tables(["lineitem"], 0.002)
    d = DistributedSession(make_mesh_2d(2, 4))
    s = Session()
    for n, cols in data.items():
        d.register_numpy(n, cols, tpch.SCHEMAS[n])
        s.register_numpy(n, cols, tpch.SCHEMAS[n])
    got = d.collect(tpch.q1())
    want = s.collect(tpch.q1())
    for k in want:
        if k.endswith("__valid"):
            continue
        if np.issubdtype(np.asarray(want[k]).dtype, np.floating):
            np.testing.assert_allclose(got[k], want[k], rtol=1e-9)
        else:
            np.testing.assert_array_equal(got[k], want[k])
