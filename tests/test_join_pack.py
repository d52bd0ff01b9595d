"""Composite-key join packing: stats-derived range packing of multi-column
integer keys into one sort limb (q9/q16 shape); out-of-range retry path."""

import numpy as np
import pandas as pd
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P


def _session(n_fact=20000, n_dim=3000):
    rng = np.random.default_rng(4)
    fact = {"a": rng.integers(10, 500, n_fact).astype(np.int64),
            "b": rng.integers(-50, 50, n_fact).astype(np.int64),
            "v": rng.normal(size=n_fact)}
    dim = {"x": rng.integers(10, 500, n_dim).astype(np.int64),
           "y": rng.integers(-50, 50, n_dim).astype(np.int64),
           "w": np.arange(n_dim, dtype=np.int64)}
    fs = T.Schema([T.Field("a", T.INT64), T.Field("b", T.INT64), T.Field("v", T.FLOAT64)])
    ds = T.Schema([T.Field("x", T.INT64), T.Field("y", T.INT64), T.Field("w", T.INT64)])
    sess = Session()
    sess.register_numpy("fact", fact, fs)
    sess.register_numpy("dim", dim, ds)
    return sess, fact, dim, fs, ds


def _plan(fs, ds, jt=P.JoinType.INNER):
    return P.HashJoin(
        P.Scan(table="fact", source_schema=fs), P.Scan(table="dim", source_schema=ds),
        (E.bind(E.col("a"), fs), E.bind(E.col("b"), fs)),
        (E.bind(E.col("x"), ds), E.bind(E.col("y"), ds)),
        jt, "right")


def test_pack_hint_derived_and_correct():
    sess, fact, dim, fs, ds = _session()
    plan = P.bind_plan(_plan(fs, ds))
    from datafusion_comet_tpu.exec.stats import derive_capacities

    derive_capacities(plan, sess.stats)
    kp = getattr(plan, "key_pack", None)
    assert kp is not None and len(kp) == 2
    assert kp[0][0] <= 10 and kp[0][1] >= 499 and kp[1] == (-50, 49)
    out = sess.collect(P.bind_plan(_plan(fs, ds)))
    o = pd.DataFrame(fact).merge(pd.DataFrame(dim),
                                 left_on=["a", "b"], right_on=["x", "y"])
    assert len(out["v"]) == len(o)
    assert abs(out["v"].sum() - o["v"].sum()) < 1e-6
    assert int(out["w"].sum()) == int(o["w"].sum())


def test_left_join_with_packing_matches_oracle():
    sess, fact, dim, fs, ds = _session(5000, 200)
    out = sess.collect(P.bind_plan(_plan(fs, ds, P.JoinType.LEFT)))
    o = pd.DataFrame(fact).merge(pd.DataFrame(dim), how="left",
                                 left_on=["a", "b"], right_on=["x", "y"])
    assert len(out["v"]) == len(o)
    wv = out["w__valid"]
    assert int(out["w"][wv].sum()) == int(o["w"].sum())


class TestCompactPairList:
    """Direct hash_join(compact_rows=...) contract: output capacity equals
    the requested compact capacity, results match the oracle, and an
    undersized capacity raises the overflow flag."""

    def _batches(self, n_probe=5000, n_build=800):
        from datafusion_comet_tpu.exec.batch import from_numpy

        rng = np.random.default_rng(9)
        probe = {"pk": rng.integers(0, 300, n_probe).astype(np.int64),
                 "pv": np.arange(n_probe, dtype=np.int64)}
        build = {"bk": rng.integers(100, 400, n_build).astype(np.int64),
                 "bv": np.arange(n_build, dtype=np.int64)}
        ps = T.Schema([T.Field("pk", T.INT64), T.Field("pv", T.INT64)])
        bs = T.Schema([T.Field("bk", T.INT64), T.Field("bv", T.INT64)])
        return (from_numpy(probe, ps), ps, probe,
                from_numpy(build, bs), bs, build)

    def test_inner_compact_matches_oracle(self):
        import pandas as pd

        from datafusion_comet_tpu.exec.batch import to_numpy
        from datafusion_comet_tpu.exec.operators.join import hash_join

        pb, ps, pdata, bb, bs, bdata = self._batches()
        out_schema = T.Schema(list(ps.fields) + list(bs.fields))
        out, ovf = hash_join(
            pb, bb, (E.bind(E.col("pk"), ps),), (E.bind(E.col("bk"), bs),),
            P.JoinType.INNER, "right", out_schema,
            max_build_matches=16, compact_rows=1 << 15)
        assert out.capacity == 1 << 15
        assert not bool(ovf)
        got = to_numpy(out)
        o = pd.DataFrame(pdata).merge(pd.DataFrame(bdata),
                                      left_on="pk", right_on="bk")
        assert len(got["pv"]) == len(o)
        assert int(got["bv"].sum()) == int(o["bv"].sum())

    def test_undersized_capacity_overflows(self):
        from datafusion_comet_tpu.exec.operators.join import hash_join

        pb, ps, _, bb, bs, _ = self._batches()
        out_schema = T.Schema(list(ps.fields) + list(bs.fields))
        _, ovf = hash_join(
            pb, bb, (E.bind(E.col("pk"), ps),), (E.bind(E.col("bk"), bs),),
            P.JoinType.INNER, "right", out_schema,
            max_build_matches=16, compact_rows=64)
        assert bool(ovf)
