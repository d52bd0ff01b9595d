"""Differential fuzzing for higher-order array/map functions (the
CometFuzzTestSuite pattern, SURVEY §4): random ragged lists with nulls vs a
pure-Python oracle across transform/filter/exists/forall/aggregate/zip_with/
array_sort and map transform_values/map_filter."""

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import from_numpy, to_numpy
from datafusion_comet_tpu.exec.evaluator import evaluate
from datafusion_comet_tpu.ir import expr as E

N = 400
E_CAP = 5


def _rand_lists(rng, null_p=0.15, elem_null_p=0.1):
    out = []
    for _ in range(N):
        if rng.random() < null_p:
            out.append(None)
            continue
        k = int(rng.integers(0, E_CAP + 1))
        row = [None if rng.random() < elem_null_p else int(rng.integers(-50, 50))
               for _ in range(k)]
        out.append(row)
    return out


def _run(expr, data, schema):
    b = from_numpy(data, schema)
    cv = evaluate(E.bind(expr, schema), b)
    out = to_numpy(type(b)((cv,), b.row_mask, T.Schema([T.Field("o", cv.dtype)])))
    return [v if ok else None for v, ok in zip(out["o"], out["o__valid"])]


SCHEMA = T.Schema([T.Field("xs", T.list_(T.INT64, E_CAP)), T.Field("c", T.INT64)])


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(123)
    return {"xs": _rand_lists(rng), "c": rng.integers(-5, 5, N).astype(np.int64)}


def hof(func, args, params, body):
    return E.HigherOrderFunc(func, tuple(args), tuple(params), body)


def test_fuzz_transform_with_capture(data):
    got = _run(hof("transform", (E.col("xs"),), ("x",),
                   E.LambdaVar("x") * E.lit(3, T.INT64) + E.col("c")), data, SCHEMA)
    for row, xs, c in zip(got, data["xs"], data["c"]):
        if xs is None:
            assert row is None
        else:
            assert row == [None if v is None else v * 3 + int(c) for v in xs]


def test_fuzz_filter(data):
    got = _run(hof("filter", (E.col("xs"),), ("x",),
                   (E.LambdaVar("x") % E.lit(2, T.INT64)) == E.lit(0, T.INT64)),
               data, SCHEMA)
    for row, xs in zip(got, data["xs"]):
        if xs is None:
            assert row is None
        else:
            assert row == [v for v in xs if v is not None and v % 2 == 0]


def test_fuzz_exists_forall_three_valued(data):
    ex = _run(hof("exists", (E.col("xs"),), ("x",),
                  E.LambdaVar("x") > E.lit(40, T.INT64)), data, SCHEMA)
    fa = _run(hof("forall", (E.col("xs"),), ("x",),
                  E.LambdaVar("x") > E.lit(-60, T.INT64)), data, SCHEMA)
    for e_, f_, xs in zip(ex, fa, data["xs"]):
        if xs is None:
            assert e_ is None and f_ is None
            continue
        vals = [v for v in xs if v is not None]
        has_null = any(v is None for v in xs)
        true_e = any(v > 40 for v in vals)
        want_e = True if true_e else (None if has_null else False)
        assert e_ == want_e, (xs, e_, want_e)
        false_f = any(not (v > -60) for v in vals)
        want_f = False if false_f else (None if has_null else True)
        assert f_ == want_f, (xs, f_, want_f)


def test_fuzz_aggregate(data):
    got = _run(hof("aggregate", (E.col("xs"), E.lit(0, T.INT64)), ("acc", "x"),
                   E.LambdaVar("acc") + E.LambdaVar("x")), data, SCHEMA)
    for row, xs in zip(got, data["xs"]):
        if xs is None:
            assert row is None
        elif any(v is None for v in xs):
            assert row is None  # null element poisons the fold
        else:
            assert row == sum(xs)


def test_fuzz_array_sort(data):
    got = _run(hof("array_sort", (E.col("xs"),), (), None), data, SCHEMA)
    for row, xs in zip(got, data["xs"]):
        if xs is None:
            assert row is None
        else:
            vals = sorted(v for v in xs if v is not None)
            nulls = [None] * (len(xs) - len(vals))
            assert row == vals + nulls, (xs, row)


def test_fuzz_zip_with():
    rng = np.random.default_rng(7)
    s = T.Schema([T.Field("a", T.list_(T.INT64, 4)), T.Field("b", T.list_(T.INT64, 3))])
    data = {"a": _rand_lists(rng)[:200], "b": _rand_lists(rng)[:200]}
    data["a"] = [None if r is None else r[:4] for r in data["a"]]
    data["b"] = [None if r is None else r[:3] for r in data["b"]]
    got = _run(hof("zip_with", (E.col("a"), E.col("b")), ("x", "y"),
                   E.LambdaVar("x") + E.LambdaVar("y")), data, s)
    for row, a, b in zip(got, data["a"], data["b"]):
        if a is None or b is None:
            assert row is None
            continue
        n = max(len(a), len(b))
        want = []
        for i in range(n):
            x = a[i] if i < len(a) else None
            y = b[i] if i < len(b) else None
            want.append(None if x is None or y is None else x + y)
        assert row == want, (a, b, row, want)


def test_fuzz_map_hofs():
    rng = np.random.default_rng(11)
    s = T.Schema([T.Field("m", T.map_(T.string(4), T.INT64, 4))])
    rows = []
    for _ in range(200):
        if rng.random() < 0.15:
            rows.append(None)
            continue
        k = int(rng.integers(0, 5))
        rows.append({f"k{j}": int(rng.integers(-20, 20)) for j in range(k)})
    data = {"m": rows}
    got = _run(hof("transform_values", (E.col("m"),), ("k", "v"),
                   E.LambdaVar("v") * E.lit(2, T.INT64)), data, s)
    for row, m in zip(got, rows):
        if m is None:
            assert row is None
        else:
            assert row == {k: v * 2 for k, v in m.items()}
    got = _run(hof("map_filter", (E.col("m"),), ("k", "v"),
                   E.LambdaVar("v") > E.lit(0, T.INT64)), data, s)
    for row, m in zip(got, rows):
        if m is None:
            assert row is None
        else:
            assert row == {k: v for k, v in m.items() if v > 0}
