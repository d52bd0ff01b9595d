"""Device format_number — differential vs the Python-format host bridge
(ints, decimals, doubles incl. specials, negative zero, grouping)."""

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import QueryExecutionError, Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import functions as F
from datafusion_comet_tpu.ir import plan as P


def run(expr, vals, dtype, validity=None):
    s = Session()
    schema = T.Schema([T.Field("v", dtype)])
    s.register_numpy("t", {"v": vals}, schema)
    out = s.collect(P.Scan("t", schema).project([expr.alias("o")]))
    return [v if ok else None for v, ok in zip(out["o"], out["o__valid"])]


@pytest.mark.parametrize("d", [0, 1, 2, 5])
def test_ints_vs_host(d):
    vals = np.array([0, 1, -1, 999, 1000, -1000, 123456789, -987654321,
                     10**12, -(10**12)], np.int64)
    got = run(F.format_number(E.col("v"), d), vals, T.INT64)
    want = run(F.format_number_host(E.col("v"), d), vals, T.INT64)
    assert got == want


def test_scaled_overflow_raises():
    vals = np.array([10**15], np.int64)  # x 10^5 exceeds int64
    with pytest.raises(QueryExecutionError):
        run(F.format_number(E.col("v"), 5), vals, T.INT64)


@pytest.mark.parametrize("d", [0, 2])
def test_doubles_vs_host(d):
    vals = np.array([0.0, -0.0, 1.5, 2.5, -2.5, 0.125, -0.4, 1234.5678,
                     -98765.4321, 1e12], np.float64)
    got = run(F.format_number(E.col("v"), d), vals, T.FLOAT64)
    want = run(F.format_number_host(E.col("v"), d), vals, T.FLOAT64)
    assert got == want


def test_double_specials():
    vals = np.array([np.nan, np.inf, -np.inf, 1.0], np.float64)
    got = run(F.format_number(E.col("v"), 2), vals, T.FLOAT64)
    want = run(F.format_number_host(E.col("v"), 2), vals, T.FLOAT64)
    assert got == want


def test_decimal_rescale_half_even():
    # DECIMAL(9,3) values; format to 1 decimal (downscale HALF_EVEN)
    dt = T.decimal(9, 3)
    vals = np.array([1250, 1350, -1250, 999999, 50, -50, 0], np.int64)
    got = run(F.format_number(E.col("v"), 1), vals, dt)
    # oracle via python Decimal HALF_EVEN
    import decimal as _d
    want = []
    for v in vals:
        q = (_d.Decimal(int(v)) / 1000).quantize(
            _d.Decimal("0.1"), rounding=_d.ROUND_HALF_EVEN)
        want.append(format(q, ",.1f"))
    assert got == want


def test_fuzz_vs_host():
    rng = np.random.default_rng(21)
    vals = rng.integers(-(10**12), 10**12, 500).astype(np.int64)
    for d in (0, 3):
        got = run(F.format_number(E.col("v"), d), vals, T.INT64)
        want = run(F.format_number_host(E.col("v"), d), vals, T.INT64)
        assert got == want, d
    fv = (rng.random(500) - 0.5) * 1e7
    got = run(F.format_number(E.col("v"), 2), fv, T.FLOAT64)
    want = run(F.format_number_host(E.col("v"), 2), fv, T.FLOAT64)
    assert got == want


def test_too_wide_raises():
    vals = np.array([10**15], np.int64)
    with pytest.raises(QueryExecutionError):
        run(F.format_number(E.col("v"), 2, out_len=8), vals, T.INT64)
