"""float/double → string: Java shortest-repr (Ryu) oracle tests.

Oracle: Python/numpy's shortest round-trip digits (same uniqueness contract
as Java's Ryu) reformatted under Java Double.toString layout rules
(plain for 1e-3 <= |v| < 1e7, else 'd.dddE±x'; '.0' retained; specials)."""

import math

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from datafusion_comet_tpu.exec.ryu import double_to_string, float_to_string

W = 32


def _shortest(v, f32=False):
    """(digits str, sci exponent) of the shortest repr."""
    s = np.format_float_scientific(
        np.float32(v) if f32 else np.float64(v), unique=True, trim="-")
    mant, _, exp = s.partition("e")
    mant = mant.lstrip("-")
    digits = mant.replace(".", "").lstrip("0") or "0"
    digits = digits.rstrip("0") or "0"
    sci = int(exp) if exp else 0
    return digits, sci


def java_str(v, f32=False):
    x = float(np.float32(v)) if f32 else float(v)
    if math.isnan(x):
        return "NaN"
    if math.isinf(x):
        return "Infinity" if x > 0 else "-Infinity"
    if x == 0.0:
        return "-0.0" if math.copysign(1.0, x) < 0 else "0.0"
    digits, sci = _shortest(abs(x), f32)
    sign = "-" if x < 0 else ""
    if -3 <= sci <= 6:
        if sci >= 0:
            ip = digits[: sci + 1].ljust(sci + 1, "0")
            fp = digits[sci + 1:] or "0"
            return f"{sign}{ip}.{fp}"
        return f"{sign}0.{'0' * (-sci - 1)}{digits}"
    fp = digits[1:] or "0"
    return f"{sign}{digits[0]}.{fp}E{sci}"


def run_double(vals):
    chars, lens = double_to_string(jnp.asarray(np.asarray(vals, np.float64)), W)
    chars, lens = np.asarray(chars), np.asarray(lens)
    return [bytes(chars[i, : lens[i]]).decode() for i in range(len(vals))]


def run_float(vals):
    chars, lens = float_to_string(jnp.asarray(np.asarray(vals, np.float32)), W)
    chars, lens = np.asarray(chars), np.asarray(lens)
    return [bytes(chars[i, : lens[i]]).decode() for i in range(len(vals))]


EDGE = [0.0, -0.0, 1.0, -1.0, 0.1, 0.5, 2.0, 10.0, 100.0, 1e-3, 9.99e-4,
        1e7, 9999999.0, 9999999.5, 1e16, 1e-5, 123.456, -123.456,
        3.141592653589793, 2.718281828459045, 1e300, 1e-300,
        1.7976931348623157e308, 2.2250738585072014e-308,
        float("nan"), float("inf"), float("-inf"), 12345678.0, 1234567.0,
        0.001, 0.0001, 6.02214076e23, -2.5, 0.3333333333333333]


class TestDouble:
    def test_edge_values(self):
        got = run_double(EDGE)
        for v, g in zip(EDGE, got):
            assert g == java_str(v), (v, g, java_str(v))

    def test_random_bit_patterns(self):
        rng = np.random.default_rng(0)
        bits = rng.integers(0, 2 ** 63, 3000, dtype=np.int64)
        signs = rng.integers(0, 2, 3000, dtype=np.int64) << 63
        vals = (bits | signs).view(np.float64)
        vals = vals[np.isfinite(vals)]
        vals = vals[np.abs(vals) > 2.3e-308]  # XLA DAZ flushes subnormals
        got = run_double(vals)
        for v, g in zip(vals, got):
            assert g == java_str(v), (v.hex(), g, java_str(v))

    def test_round_trip(self):
        rng = np.random.default_rng(1)
        vals = rng.normal(size=2000) * np.exp(rng.normal(size=2000) * 50)
        got = run_double(vals)
        for v, g in zip(vals, got):
            assert float(g.replace("E", "e")) == v, (v, g)


class TestSubnormals:
    def test_double_subnormal_flushes_documented(self):
        """XLA enables DAZ/FTZ on CPU and TPU: subnormal doubles read as 0
        inside compiled programs, so they print "0.0" (documented
        incompatibility; Spark prints the shortest subnormal repr)."""
        got = run_double([5e-324, 4.9406564584e-314])
        for g in got:
            assert g in ("0.0", java_str(5e-324)), g


class TestFloat:
    def test_edge_values(self):
        vals = [0.0, -0.0, 1.0, 0.1, 1e7, 1e-3, 3.14159, 1e38, 1e-38,
                float("nan"), float("inf"), 123.456, -0.5, 1234567.0,
                12345678.0]
        got = run_float(vals)
        for v, g in zip(vals, got):
            assert g == java_str(v, f32=True), (v, g, java_str(v, f32=True))

    def test_random(self):
        rng = np.random.default_rng(2)
        bits = rng.integers(0, 2 ** 31, 3000, dtype=np.int32)
        vals = bits.view(np.float32)
        vals = vals[np.isfinite(vals) & (np.abs(vals) > 1e-37)]
        got = run_float(vals)
        for v, g in zip(vals, got):
            assert g == java_str(v, f32=True), (v, g, java_str(v, f32=True))

    def test_f32_round_trip(self):
        rng = np.random.default_rng(3)
        vals = (rng.normal(size=2000) * np.exp(rng.normal(size=2000) * 20)).astype(np.float32)
        got = run_float(vals)
        for v, g in zip(vals, got):
            assert np.float32(g.replace("E", "e")) == v, (v, g)


class TestCastIntegration:
    def test_cast_double_to_string_e2e(self):
        import jax.numpy as jnp

        from datafusion_comet_tpu import types as T
        from datafusion_comet_tpu.exec.batch import from_numpy, to_numpy
        from datafusion_comet_tpu.exec.evaluator import evaluate
        from datafusion_comet_tpu.ir import expr as E

        vals = np.array([1.5, -0.0, 1e7, 123.456, float("nan"), 1e-4], np.float64)
        s = T.Schema([T.Field("x", T.FLOAT64)])
        b = from_numpy({"x": vals}, s)
        e = E.bind(E.Cast(E.col("x"), T.string(32)), s)
        cv = evaluate(e, b)
        got = to_numpy(
            type(b)((cv,), b.row_mask, T.Schema([T.Field("s", T.string(32))])))["s"]
        assert list(got) == [java_str(v) for v in vals]

    def test_cast_float_to_string_e2e(self):
        from datafusion_comet_tpu import types as T
        from datafusion_comet_tpu.exec.batch import from_numpy, to_numpy
        from datafusion_comet_tpu.exec.evaluator import evaluate
        from datafusion_comet_tpu.ir import expr as E

        vals = np.array([2.5, -1e10, 0.1], np.float32)
        s = T.Schema([T.Field("x", T.FLOAT32)])
        b = from_numpy({"x": vals}, s)
        e = E.bind(E.Cast(E.col("x"), T.string(32)), s)
        cv = evaluate(e, b)
        got = to_numpy(
            type(b)((cv,), b.row_mask, T.Schema([T.Field("s", T.string(32))])))["s"]
        assert list(got) == [java_str(v, f32=True) for v in vals]
