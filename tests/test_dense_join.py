"""Dense-domain join paths (join.py): when a single int join key has an
exact stats range, unique-build INNER/LEFT joins take a scatter/gather
position table, semi/anti take a membership bitmap, and decomposable-
condition semis take scatter-min/max tables — all replacing concat sorts.
Differential: results must match both a pandas oracle and the generic
carry-range path (same data registered without stats → no ranges)."""

import numpy as np
import pandas as pd
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import from_numpy
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P


def _mk(seed=0, n_probe=20000, n_build=3000, dup_build=False, key_lo=100):
    rng = np.random.default_rng(seed)
    bkeys = np.arange(key_lo, key_lo + n_build, dtype=np.int64)
    if dup_build:
        bkeys = np.concatenate([bkeys, bkeys[: n_build // 10]])
    rng.shuffle(bkeys)
    build = {
        "bk": bkeys,
        "bv": rng.integers(-50, 50, len(bkeys)).astype(np.int64),
    }
    probe = {
        # some probe keys outside the build range (must not match)
        "pk": rng.integers(0, key_lo + n_build + 500, n_probe).astype(np.int64),
        "pv": rng.integers(-50, 50, n_probe).astype(np.int64),
    }
    # nulls on both sides
    probe_reg = dict(probe)
    probe_reg["pk"] = [None if rng.random() < 0.03 else int(v) for v in probe["pk"]]
    build_reg = dict(build)
    build_reg["bk"] = [None if rng.random() < 0.03 else int(v) for v in build["bk"]]
    ps = T.Schema([T.Field("pk", T.INT64), T.Field("pv", T.INT64)])
    bs = T.Schema([T.Field("bk", T.INT64), T.Field("bv", T.INT64)])
    return probe_reg, build_reg, ps, bs


def _sessions(probe_reg, build_reg, ps, bs):
    """(dense-eligible session with stats, stats-free session)."""
    s1 = Session()
    s1.register_numpy("p", probe_reg, ps)
    s1.register_numpy("b", build_reg, bs)
    s2 = Session()
    s2.register_batch("p", from_numpy(probe_reg, ps))
    s2.register_batch("b", from_numpy(build_reg, bs))
    return s1, s2


def _df(reg):
    return pd.DataFrame({k: [np.nan if v is None else v for v in vals]
                         if isinstance(vals, list) else vals
                         for k, vals in reg.items()})


def _sorted_rows(out, cols):
    rows = list(zip(*[out[c].tolist() for c in cols]))
    return sorted(rows)


@pytest.mark.parametrize("jt", [P.JoinType.INNER, P.JoinType.LEFT])
def test_dense_unique_build(jt):
    probe_reg, build_reg, ps, bs = _mk()
    s1, s2 = _sessions(probe_reg, build_reg, ps, bs)
    plan = lambda: P.HashJoin(
        P.Scan("p", ps), P.Scan("b", bs),
        (E.col("pk"),), (E.col("bk"),), jt, "right",
    ).aggregate([], [E.AggExpr("count", None, "n"),
                     E.AggExpr("sum", E.col("pv"), "sp"),
                     E.AggExpr("sum", E.col("bv"), "sb")])
    a = s1.collect(plan())
    b = s2.collect(plan())
    assert a["n"].tolist() == b["n"].tolist()
    assert a["sp"].tolist() == b["sp"].tolist()
    assert a["sb"].tolist() == b["sb"].tolist()
    # pandas oracle
    pdf, bdf = _df(probe_reg), _df(build_reg)
    how = "inner" if jt == P.JoinType.INNER else "left"
    # pandas merges NaN==NaN; SQL null keys never match — drop build nulls
    m = pdf.merge(bdf.dropna(subset=["bk"]), left_on="pk", right_on="bk", how=how)
    assert int(a["n"][0]) == len(m)
    assert int(a["sp"][0]) == int(m.pv.sum())


def test_dense_unique_build_dup_detect():
    """Duplicate build keys must flow through the overflow retry to the
    general path and still produce exact results."""
    probe_reg, build_reg, ps, bs = _mk(dup_build=True)
    s1, s2 = _sessions(probe_reg, build_reg, ps, bs)
    plan = lambda: P.HashJoin(
        P.Scan("p", ps), P.Scan("b", bs),
        (E.col("pk"),), (E.col("bk"),), P.JoinType.INNER, "right",
    ).aggregate([], [E.AggExpr("count", None, "n"),
                     E.AggExpr("sum", E.col("bv"), "sb")])
    a = s1.collect(plan())
    b = s2.collect(plan())
    assert a["n"].tolist() == b["n"].tolist()
    assert a["sb"].tolist() == b["sb"].tolist()


@pytest.mark.parametrize("jt", [P.JoinType.LEFT_SEMI, P.JoinType.LEFT_ANTI])
def test_dense_semi_anti(jt):
    probe_reg, build_reg, ps, bs = _mk(seed=2, dup_build=True)
    s1, s2 = _sessions(probe_reg, build_reg, ps, bs)
    plan = lambda: P.HashJoin(
        P.Scan("p", ps), P.Scan("b", bs),
        (E.col("pk"),), (E.col("bk"),), jt, "right",
    ).aggregate([], [E.AggExpr("count", None, "n"),
                     E.AggExpr("sum", E.col("pv"), "sp")])
    a = s1.collect(plan())
    b = s2.collect(plan())
    assert a["n"].tolist() == b["n"].tolist()
    assert a["sp"].tolist() == b["sp"].tolist()
    # oracle
    pdf, bdf = _df(probe_reg), _df(build_reg)
    keys = set(bdf.bk.dropna())
    hit = pdf.pk.isin(keys)
    keep = pdf[hit] if jt == P.JoinType.LEFT_SEMI else pdf[~hit]
    assert int(a["n"][0]) == len(keep)
    assert int(a["sp"][0]) == int(keep.pv.sum())


@pytest.mark.parametrize("op,expr", [
    ("ne", lambda: E.col("bv") != E.col("pv")),
    ("gt", lambda: E.col("bv") > E.col("pv")),
    ("le", lambda: E.col("bv") <= E.col("pv")),
])
def test_dense_minmax_condition_semi(op, expr):
    """q21 shape: semi/anti with a single-comparison condition against one
    build column — dense scatter-min/max variant must match the sort-based
    carry and the oracle."""
    probe_reg, build_reg, ps, bs = _mk(seed=3, dup_build=True, n_probe=8000)
    s1, s2 = _sessions(probe_reg, build_reg, ps, bs)
    for jt in (P.JoinType.LEFT_SEMI, P.JoinType.LEFT_ANTI):
        plan = lambda: P.HashJoin(
            P.Scan("p", ps), P.Scan("b", bs),
            (E.col("pk"),), (E.col("bk"),), jt, "right",
            condition=expr(),
        ).aggregate([], [E.AggExpr("count", None, "n"),
                         E.AggExpr("sum", E.col("pv"), "sp")])
        a = s1.collect(plan())
        b = s2.collect(plan())
        assert a["n"].tolist() == b["n"].tolist(), (op, jt)
        assert a["sp"].tolist() == b["sp"].tolist(), (op, jt)
        # oracle: EXISTS b: b.bk == p.pk AND (b.bv OP p.pv)
        pdf, bdf = _df(probe_reg), _df(build_reg)
        bb = bdf.dropna(subset=["bk"])
        gmin = bb.groupby("bk").bv.min()
        gmax = bb.groupby("bk").bv.max()
        mn = pdf.pk.map(gmin)
        mx = pdf.pk.map(gmax)
        if op == "ne":
            ex = (mn != pdf.pv) | (mx != pdf.pv)
        elif op == "gt":
            ex = mx > pdf.pv
        else:
            ex = mn <= pdf.pv
        ex = ex & mn.notna() & pdf.pk.notna()
        keep = pdf[ex] if jt == P.JoinType.LEFT_SEMI else pdf[~ex.fillna(False)]
        assert int(a["n"][0]) == len(keep), (op, jt)


def test_dense_with_extra_condition_inner():
    """Unique-build dense INNER join with a residual non-equi condition:
    the condition evaluates on the K=1 pair block downstream."""
    probe_reg, build_reg, ps, bs = _mk(seed=4)
    s1, s2 = _sessions(probe_reg, build_reg, ps, bs)
    plan = lambda: P.HashJoin(
        P.Scan("p", ps), P.Scan("b", bs),
        (E.col("pk"),), (E.col("bk"),), P.JoinType.INNER, "right",
        condition=E.col("pv") < E.col("bv"),
    ).aggregate([], [E.AggExpr("count", None, "n")])
    a = s1.collect(plan())
    b = s2.collect(plan())
    assert a["n"].tolist() == b["n"].tolist()
    pdf, bdf = _df(probe_reg), _df(build_reg)
    m = pdf.merge(bdf.dropna(subset=["bk"]), left_on="pk", right_on="bk")
    assert int(a["n"][0]) == len(m[m.pv < m.bv])
