"""Round-3 math kernels: inverse-hyperbolic/cot/csc/sec, bround/rint,
factorial, bit_count/getbit/shiftrightunsigned, nanvl, 2-arg log, and the
Spark null-on-nonpositive log contract (reference: spark-expr math_funcs)."""

import math

import numpy as np

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import from_numpy
from datafusion_comet_tpu.exec.evaluator import evaluate
from datafusion_comet_tpu.ir import expr as E


def ev(func, data, dtype=T.FLOAT64, extra=()):
    s = T.Schema([T.Field("x", dtype)])
    b = from_numpy({"x": np.asarray(data)}, s)
    expr = E.bind(E.MathFunc(func, (E.col("x"),) + tuple(extra)), s)
    cv = evaluate(expr, b)
    n = len(data)
    return np.asarray(cv.data)[:n], np.asarray(cv.validity)[:n]


def test_inverse_hyperbolic_and_recip_trig():
    v, ok = ev("acosh", [1.0, 2.0, 10.0])
    np.testing.assert_allclose(v, [math.acosh(1), math.acosh(2), math.acosh(10)])
    v, _ = ev("asinh", [0.5, -2.0])
    np.testing.assert_allclose(v, [math.asinh(0.5), math.asinh(-2.0)])
    v, _ = ev("atanh", [0.5, -0.9])
    np.testing.assert_allclose(v, [math.atanh(0.5), math.atanh(-0.9)])
    v, _ = ev("cot", [1.0])
    np.testing.assert_allclose(v, [1 / math.tan(1.0)])
    v, _ = ev("csc", [1.0])
    np.testing.assert_allclose(v, [1 / math.sin(1.0)])
    v, _ = ev("sec", [1.0])
    np.testing.assert_allclose(v, [1 / math.cos(1.0)])


def test_log_family_null_on_nonpositive():
    for f in ("ln", "log10", "log2"):
        _, ok = ev(f, [1.0, 0.0, -3.0])
        assert list(ok) == [True, False, False], f


def test_two_arg_log():
    s = T.Schema([T.Field("b", T.FLOAT64), T.Field("x", T.FLOAT64)])
    b = from_numpy({"b": np.array([2.0, 10.0, -1.0]),
                    "x": np.array([8.0, 1000.0, 5.0])}, s)
    cv = evaluate(E.bind(E.MathFunc("log", (E.col("b"), E.col("x"))), s), b)
    v, ok = np.asarray(cv.data)[:3], np.asarray(cv.validity)[:3]
    np.testing.assert_allclose(v[:2], [3.0, 3.0])
    assert list(ok) == [True, True, False]


def test_bround_half_even_and_rint():
    v, _ = ev("bround", [2.5, 3.5, -2.5, 1.25], extra=(E.lit(0, T.INT32),))
    np.testing.assert_array_equal(v, [2.0, 4.0, -2.0, 1.0])
    v, _ = ev("bround", [1.25, 1.35], extra=(E.lit(1, T.INT32),))
    np.testing.assert_allclose(v, [1.2, 1.4])
    v, _ = ev("rint", [2.5, 3.5, -0.5])
    np.testing.assert_array_equal(v, [2.0, 4.0, -0.0])


def test_factorial():
    v, ok = ev("factorial", np.array([0, 5, 20, 21, -1], np.int64), T.INT64)
    assert v[0] == 1 and v[1] == 120 and v[2] == 2432902008176640000
    assert list(ok) == [True, True, True, False, False]


def test_bit_count_getbit_srl():
    v, _ = ev("bit_count", np.array([0, 1, 255, -1], np.int64), T.INT64)
    assert list(v) == [0, 1, 8, 64]
    s = T.Schema([T.Field("x", T.INT64)])
    b = from_numpy({"x": np.array([0b1010], np.int64)}, s)
    for pos, want in ((1, 1), (2, 0), (3, 1)):
        cv = evaluate(E.bind(E.MathFunc("getbit", (E.col("x"), E.lit(pos, T.INT32))), s), b)
        assert int(np.asarray(cv.data)[0]) == want
    cv = evaluate(E.bind(E.MathFunc(
        "shiftrightunsigned", (E.col("x"), E.lit(1, T.INT32))), s),
        from_numpy({"x": np.array([-2], np.int64)}, s))
    assert int(np.asarray(cv.data)[0]) == (2**64 - 2) >> 1


def test_nanvl():
    s = T.Schema([T.Field("a", T.FLOAT64), T.Field("b", T.FLOAT64)])
    b = from_numpy({"a": np.array([1.0, np.nan, np.nan]),
                    "b": np.array([9.0, 7.0, 8.0])}, s)
    cv = evaluate(E.bind(E.MathFunc("nanvl", (E.col("a"), E.col("b"))), s), b)
    np.testing.assert_array_equal(np.asarray(cv.data)[:3], [1.0, 7.0, 8.0])
