"""Runtime semi-join filter injection (exec/runtime_filter.py): the
bloom-filter join-pushdown analog (reference: spark-expr/src/bloom_filter/,
Spark InjectRuntimeFilter). Differential: every query must produce identical
results with the rewrite on and off, and the host dim-filter evaluator must
match engine filter execution exactly."""

import numpy as np
import pandas as pd
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.conf import CONF
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.exec.runtime_filter import RUNTIME_FILTER_ENABLED
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P

import contextlib


@contextlib.contextmanager
def _flag(entry, value):
    old = CONF.get(entry)
    CONF.set(entry.key, value)
    try:
        yield
    finally:
        CONF.set(entry.key, old)


def _mk_session(seed=3, n_fact=300_000, n_dim=4000):
    rng = np.random.default_rng(seed)
    fact = {
        "fk": rng.integers(1, n_dim + 1, n_fact).astype(np.int64),
        "qty": rng.integers(1, 50, n_fact).astype(np.int64),
        "price": rng.integers(100, 10000, n_fact).astype(np.int64),
    }
    # some null FKs (must not affect results either way)
    null_fk = rng.random(n_fact) < 0.01
    dim = {
        "dk": np.arange(1, n_dim + 1, dtype=np.int64),
        "brand": rng.integers(0, 25, n_dim).astype(np.int64),
        "name": np.array(
            ["alpha green box", "red steel crate", "plain tin can",
             "green forest pack"][:4] * (n_dim // 4) +
            ["spare"] * (n_dim % 4), dtype=object),
    }
    fs = T.Schema([T.Field("fk", T.INT64), T.Field("qty", T.INT64),
                   T.Field("price", T.INT64)])
    ds = T.Schema([T.Field("dk", T.INT64), T.Field("brand", T.INT64),
                   T.Field("name", T.string(20))])
    sess = Session()
    fact_reg = dict(fact)
    fact_reg["fk"] = [None if m else int(v) for m, v in zip(null_fk, fact["fk"])]
    sess.register_numpy("fact", fact_reg, fs)
    sess.register_numpy("dim", dim, ds)
    pdf = pd.DataFrame({k: (fact_reg[k] if k == "fk" else v)
                        for k, v in fact.items()})
    ddf = pd.DataFrame(dim)
    return sess, pdf, ddf


def _q_join_agg():
    """q17 shape: fact ⋈ filtered dim, plus fact aggregate keyed on fk
    joined back — the aggregate input is the runtime-filter target."""
    d = P.Scan("dim", _dim_schema()).filter(E.col("brand") == E.lit(7))
    f = P.Scan("fact", _fact_schema())
    avgq = f.aggregate([E.col("fk")], [E.AggExpr("avg", E.col("qty"), "avg_qty")])
    fd = P.HashJoin(f, d, (E.col("fk"),), (E.col("dk"),), P.JoinType.INNER, "right")
    j = P.HashJoin(fd, avgq, (E.col("fk"),), (E.col("fk"),), P.JoinType.INNER, "right",
                   condition=E.col("qty").cast(T.FLOAT64)
                   < E.lit(2.0) * E.col("avg_qty").cast(T.FLOAT64))
    agg = j.aggregate([], [E.AggExpr("sum", E.col("price"), "s"),
                           E.AggExpr("count", None, "n")])
    return agg


def _fact_schema():
    return T.Schema([T.Field("fk", T.INT64), T.Field("qty", T.INT64),
                     T.Field("price", T.INT64)])


def _dim_schema():
    return T.Schema([T.Field("dk", T.INT64), T.Field("brand", T.INT64),
                     T.Field("name", T.string(20))])


def _collect(sess, plan):
    return sess.collect(plan)


def test_join_agg_differential_and_oracle():
    sess, pdf, ddf = _mk_session()
    with _flag(RUNTIME_FILTER_ENABLED, False):
        off = _collect(sess, _q_join_agg())
    with _flag(RUNTIME_FILTER_ENABLED, True):
        on = _collect(sess, _q_join_agg())
    assert off["s"].tolist() == on["s"].tolist()
    assert off["n"].tolist() == on["n"].tolist()
    # pandas oracle
    sel = ddf[ddf.brand == 7]
    f = pdf.dropna(subset=["fk"])
    avg = f.groupby("fk")["qty"].mean().rename("avg_qty")
    fd = f[f.fk.isin(set(sel.dk))].join(avg, on="fk")
    keep = fd[fd.qty < 2.0 * fd.avg_qty]
    assert int(on["s"][0]) == int(keep.price.sum())
    assert int(on["n"][0]) == len(keep)


def test_rf_injected_plan_shape():
    """The rewrite must actually fire for the join-agg shape (guards
    against silently-dead optimization)."""
    from datafusion_comet_tpu.exec.runtime_filter import inject_runtime_filters

    sess, _, _ = _mk_session()
    plan = _q_join_agg()
    with _flag(RUNTIME_FILTER_ENABLED, True):
        new = inject_runtime_filters(plan, sess)

    semis = []

    def walk(p):
        if isinstance(p, P.HashJoin) and p.join_type == P.JoinType.LEFT_SEMI:
            semis.append(p)
        for c in p.children():
            walk(c)

    walk(new)
    assert semis, "runtime filter did not inject any semi join"
    assert any(getattr(s, "rf_dense_range", None) for s in semis)
    # rf key table registered and tiny
    rf_tables = [t for t in sess.tables if t.startswith("__rf_")]
    assert rf_tables
    for t in rf_tables:
        assert sess.tables[t].capacity <= 1 << 12


def test_rf_like_filter_and_anti_soundness():
    """LIKE-filtered dim (host evaluator's vectorized contains path) and a
    query whose fact rows carry NULL keys: results must match the flag-off
    run row-for-row."""
    sess, pdf, ddf = _mk_session(seed=11)
    d = P.Scan("dim", _dim_schema()).filter(E.col("name").like("%green%"))
    f = P.Scan("fact", _fact_schema())
    j = P.HashJoin(f, d, (E.col("fk"),), (E.col("dk"),), P.JoinType.INNER, "right")
    agg = j.aggregate([E.col("brand")], [E.AggExpr("sum", E.col("qty"), "q"),
                                         E.AggExpr("count", None, "n")])
    plan = agg.sort([E.SortOrder(E.col("brand"))])
    with _flag(RUNTIME_FILTER_ENABLED, False):
        off = _collect(sess, plan)
    with _flag(RUNTIME_FILTER_ENABLED, True):
        on = _collect(sess, plan)
    for k in ("brand", "q", "n"):
        assert off[k].tolist() == on[k].tolist()


def test_host_filter_matches_engine():
    """exec/host_filter.py must agree with device Filter execution on the
    supported predicate family (superset-soundness is only allowed for
    UNSUPPORTED conjuncts; these are all supported)."""
    from datafusion_comet_tpu.exec.host_filter import eval_dim_filter

    rng = np.random.default_rng(5)
    n = 5000
    names = np.array([f"{w} {c}" for w, c in zip(
        rng.choice(["green", "red", "blue", "chartreuse"], n),
        rng.choice(["box", "crate", "tin"], n))], dtype=object)
    data = {
        "k": np.arange(n, dtype=np.int64),
        "v": rng.integers(-100, 100, n).astype(np.int64),
        "s": names,
    }
    # nulls in v
    data_reg = dict(data)
    data_reg["v"] = [None if rng.random() < 0.1 else int(x) for x in data["v"]]
    schema = T.Schema([T.Field("k", T.INT64), T.Field("v", T.INT64),
                       T.Field("s", T.string(20))])
    sess = Session()
    sess.register_numpy("t", data_reg, schema)
    preds = [
        E.col("v") > E.lit(10),
        (E.col("v") >= E.lit(-50)) & (E.col("v") < E.lit(50)),
        E.col("s") == E.lit("green box"),
        E.col("s").like("green%"),
        E.col("s").like("%tin"),
        E.col("s").like("%art%"),
        E.col("s").like("g_een %"),
        E.col("v").isin(1, 2, 3, 99),
        E.UnaryOp("isnull", E.col("v")),
        E.UnaryOp("isnotnull", E.col("v")),
        (E.col("v") > E.lit(0)) | E.col("s").like("%blue%"),
        E.Like(E.col("s"), "%crate%", negated=True),
    ]
    batch = sess.tables["t"]
    for pred in preds:
        plan = P.Scan("t", schema).filter(pred).project([E.col("k")])
        got = set(sess.collect(plan)["k"].tolist())
        mask, applied = eval_dim_filter(batch, [pred])
        assert applied, f"host filter skipped supported predicate {pred}"
        kvals = np.asarray(batch.columns[0].data)
        want = set(kvals[mask].tolist())
        assert got == want, f"host/device mismatch for {pred}"


def test_rf_disabled_for_small_or_unfiltered():
    from datafusion_comet_tpu.exec.runtime_filter import inject_runtime_filters

    sess, _, _ = _mk_session(n_fact=2000)  # below min target rows
    plan = _q_join_agg()
    with _flag(RUNTIME_FILTER_ENABLED, True):
        new = inject_runtime_filters(plan, sess)

    found = []

    def walk(p):
        if isinstance(p, P.HashJoin) and p.join_type == P.JoinType.LEFT_SEMI:
            found.append(p)
        for c in p.children():
            walk(c)

    walk(new)
    assert not found, "runtime filter fired on a tiny fact table"
