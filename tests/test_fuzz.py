"""Fuzz differential testing: random schemas/data with edge values, random
query shapes, engine vs pandas oracle.

Mirrors the reference's fuzz strategy (SURVEY.md §4: FuzzDataGenerator seeds
edge values — NaN, ±Inf, int bounds, nulls, empty strings — and runs random
select/filter/agg/order-by/join shapes Comet-vs-Spark). Deterministic seeds
keep failures reproducible.
"""

import numpy as np
import pandas as pd
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P

N_ROWS = 150

EDGE_INTS = [0, 1, -1, 2**31 - 1, -(2**31), 2**62, -(2**62), 42]
# note: subnormals (|x| < 2.23e-308) are flushed to zero by XLA (FTZ/DAZ) and
# excluded here — the engine-wide documented deviation (see sortkeys.py)
EDGE_FLOATS = [0.0, -0.0, 1.5, -2.5, np.nan, np.inf, -np.inf, 1e-300, 1e300, 2.3e-308]
EDGE_STRS = ["", "a", "A", "zz", " lead", "trail ", "longer-string", "0", "%_"]


def gen_table(rng):
    n = N_ROWS
    mixed_i = np.where(rng.random(n) < 0.3, rng.choice(EDGE_INTS, n), rng.integers(-50, 50, n)).astype(np.int64)
    mixed_f = np.where(rng.random(n) < 0.3, rng.choice(EDGE_FLOATS, n), rng.normal(size=n))
    strs = np.array(
        [EDGE_STRS[i] if rng.random() < 0.3 else f"s{rng.integers(0, 20):02d}" for i in rng.integers(0, len(EDGE_STRS), n)],
        object,
    )
    valid_i = rng.random(n) > 0.15
    valid_f = rng.random(n) > 0.15
    valid_s = rng.random(n) > 0.15
    k = rng.integers(0, 6, n).astype(np.int32)
    schema = T.Schema(
        [
            T.Field("k", T.INT32, False),
            T.Field("i", T.INT64),
            T.Field("f", T.FLOAT64),
            T.Field("s", T.string(16)),
        ]
    )
    data = {"k": k, "i": mixed_i, "f": mixed_f, "s": strs}
    validity = {"i": valid_i, "f": valid_f, "s": valid_s}
    pdf = pd.DataFrame(
        {
            "k": k,
            "i": pd.array(np.where(valid_i, mixed_i, 0), dtype="Int64"),
            "f": np.where(valid_f, mixed_f, np.nan),
            "s": [s if v else None for s, v in zip(strs, valid_s)],
        }
    )
    pdf.loc[~valid_i, "i"] = pd.NA
    pdf.loc[~valid_f, "f"] = np.nan  # pandas uses NaN for null float
    return data, validity, schema, pdf


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_agg(seed):
    rng = np.random.default_rng(1000 + seed)
    data, validity, schema, pdf = gen_table(rng)
    sess = Session()
    from datafusion_comet_tpu.exec.batch import from_numpy

    sess.register_batch("t", from_numpy(data, schema, validity=validity))
    plan = P.Scan("t", schema).aggregate(
        [E.col("k")],
        [
            E.AggExpr("sum", E.col("i"), "si"),
            E.AggExpr("count", E.col("i"), "ci"),
            E.AggExpr("min", E.col("i"), "mi"),
            E.AggExpr("max", E.col("i"), "xi"),
        ],
    ).sort([E.SortOrder(E.col("k"))])
    out = sess.collect(plan)
    g = pdf.groupby("k").agg(
        si=("i", "sum"), ci=("i", "count"), mi=("i", "min"), xi=("i", "max")
    ).reset_index()
    np.testing.assert_array_equal(out["k"], g.k.values)
    np.testing.assert_array_equal(out["ci"], g.ci.values)
    # sum over Int64 with all-null group → pandas 0 with count 0; ours null
    has = g.ci.values > 0
    np.testing.assert_array_equal(out["si"][has], g.si.values[has].astype(np.int64))
    np.testing.assert_array_equal(out["mi"][has], g.mi.values[has].astype(np.int64))
    np.testing.assert_array_equal(out["xi"][has], g.xi.values[has].astype(np.int64))
    assert not out["si__valid"][~has].any()


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_sort_floats(seed):
    """Spark float order: NaN greatest, nulls per SortOrder; -0.0 == 0.0."""
    rng = np.random.default_rng(2000 + seed)
    data, validity, schema, pdf = gen_table(rng)
    sess = Session()
    from datafusion_comet_tpu.exec.batch import from_numpy

    sess.register_batch("t", from_numpy(data, schema, validity=validity))
    asc = bool(rng.random() < 0.5)
    plan = P.Scan("t", schema).sort([E.SortOrder(E.col("f"), ascending=asc)])
    out = sess.collect(plan)
    got = np.where(out["f__valid"], out["f"], None)
    # oracle: nulls first iff ascending; NaN greatest; desc flips values
    sign = 1.0 if asc else -1.0
    keys = [
        (0 if (v is None) == asc else 2 if v is None else 1,
         sign * ((2 if np.isnan(v) else 1) if v is not None else 0),
         0.0 if v is None or np.isnan(v) else sign * (v + 0.0))
        for v in got
    ]
    assert keys == sorted(keys), f"seed {seed} order violated"
    # multiset of non-null values preserved
    vals = sorted(x for x in got if x is not None and not np.isnan(x))
    src = np.where(np.asarray([validity["f"]])[0], data["f"], np.nan)
    exp = sorted(x for x in src if not np.isnan(x))
    np.testing.assert_allclose(vals, exp)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_filter_strings(seed):
    rng = np.random.default_rng(3000 + seed)
    data, validity, schema, pdf = gen_table(rng)
    sess = Session()
    from datafusion_comet_tpu.exec.batch import from_numpy

    sess.register_batch("t", from_numpy(data, schema, validity=validity))
    pivot = EDGE_STRS[rng.integers(0, len(EDGE_STRS))] or "a"
    plan = P.Scan("t", schema).filter(E.col("s") > E.lit(pivot)).project([E.col("s")])
    out = sess.collect(plan)
    exp = sorted(s for s, v in zip(data["s"], validity["s"]) if v and s > pivot)
    assert sorted(out["s"]) == exp


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_join(seed):
    rng = np.random.default_rng(4000 + seed)
    n = 80
    lk = np.where(rng.random(n) < 0.2, -1, rng.integers(0, 20, n)).astype(np.int64)
    lvalid = rng.random(n) > 0.1
    rk = rng.integers(0, 25, 30).astype(np.int64)
    schema_l = T.Schema([T.Field("lk", T.INT64), T.Field("lv", T.INT64, False)])
    schema_r = T.Schema([T.Field("rk", T.INT64, False), T.Field("rv", T.INT64, False)])
    sess = Session(join_fanout=1)
    from datafusion_comet_tpu.exec.batch import from_numpy

    sess.register_batch(
        "L", from_numpy({"lk": lk, "lv": np.arange(n)}, schema_l, validity={"lk": lvalid})
    )
    sess.register_batch("R", from_numpy({"rk": rk, "rv": np.arange(30)}, schema_r))
    jt = [P.JoinType.INNER, P.JoinType.LEFT, P.JoinType.LEFT_SEMI, P.JoinType.LEFT_ANTI][
        rng.integers(0, 4)
    ]
    plan = P.HashJoin(
        P.Scan("L", schema_l), P.Scan("R", schema_r), (E.col("lk"),), (E.col("rk"),), jt, "right"
    ).sort([E.SortOrder(E.col("lv"))])
    out = sess.collect(plan)
    ldf = pd.DataFrame({"lk": [k if v else None for k, v in zip(lk, lvalid)], "lv": np.arange(n)})
    rdf = pd.DataFrame({"rk": rk, "rv": np.arange(30)})
    if jt == P.JoinType.INNER:
        exp = ldf.dropna().merge(rdf, left_on="lk", right_on="rk").sort_values(["lv", "rv"], kind="stable")
        got = pd.DataFrame({"lv": out["lv"], "rv": out["rv"]}).sort_values(["lv", "rv"], kind="stable")
        np.testing.assert_array_equal(got.lv.values, exp.lv.values)
        np.testing.assert_array_equal(got.rv.values, exp.rv.values)
    elif jt == P.JoinType.LEFT:
        matched = set(ldf.dropna().merge(rdf, left_on="lk", right_on="rk").lv)
        counts = ldf.dropna().merge(rdf, left_on="lk", right_on="rk").groupby("lv").size()
        expected_n = int(counts.sum()) + (n - len(matched))
        assert len(out["lv"]) == expected_n
    elif jt == P.JoinType.LEFT_SEMI:
        exp = sorted(set(ldf.dropna().merge(rdf, left_on="lk", right_on="rk").lv))
        np.testing.assert_array_equal(out["lv"], exp)
    else:
        matched = set(ldf.dropna().merge(rdf, left_on="lk", right_on="rk").lv)
        exp = [v for v in range(n) if v not in matched]
        np.testing.assert_array_equal(out["lv"], exp)
