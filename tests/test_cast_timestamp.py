"""Timestamp <-> string casts (reference: conversion_funcs/cast.rs timestamp
formatter + stringToTimestamp; CometNativeCastSuite coverage)."""

from datetime import datetime, timezone

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P

MICROS = [
    0,
    1_609_459_200_000_000,          # 2021-01-01 00:00:00
    1_609_459_200_123_456,          # .123456
    1_609_459_200_120_000,          # .12 (trailing zeros trimmed)
    -86_400_000_000,                # 1969-12-31
    1_723_459_261_000_001,
]
SCHEMA = T.Schema([T.Field("ts", T.TIMESTAMP), T.Field("s", T.string(30))])
STRINGS = [
    "2021-01-01",
    "2021-01-01 12:34:56",
    "2021-01-01T12:34:56.789",
    "2021-06-30 23:59:59.999999",
    "not a date",
    "2021-13-01",
]
DATA = {"ts": np.array(MICROS, np.int64), "s": STRINGS}


def run(expr, name="out"):
    s = Session()
    s.register_numpy("t", DATA, SCHEMA)
    out = s.collect(P.Scan("t", SCHEMA).project([expr.alias(name)]))
    return [v if ok else None for v, ok in zip(out[name], out[name + "__valid"])]


def oracle_fmt(us):
    dt = datetime.fromtimestamp(us // 1_000_000, tz=timezone.utc)
    base = dt.strftime("%Y-%m-%d %H:%M:%S")
    frac = us % 1_000_000
    if frac == 0:
        return base
    return base + (".%06d" % frac).rstrip("0")


class TestTimestampToString:
    def test_format(self):
        got = run(E.col("ts").cast(T.string(30)))
        assert got == [oracle_fmt(us) for us in MICROS]


class TestStringToTimestamp:
    def test_parse(self):
        got = run(E.col("s").cast(T.TIMESTAMP))
        expect = []
        for s in STRINGS:
            try:
                fmt = "%Y-%m-%d"
                s2 = s.replace("T", " ")
                if len(s2) > 19:
                    fmt = "%Y-%m-%d %H:%M:%S.%f"
                elif len(s2) > 10:
                    fmt = "%Y-%m-%d %H:%M:%S"
                dt = datetime.strptime(s2, fmt).replace(tzinfo=timezone.utc)
                expect.append(int(dt.timestamp() * 1e6))
            except ValueError:
                expect.append(None)
        assert [None if g is None else int(g) for g in got] == expect

    def test_roundtrip(self):
        fmt = E.col("ts").cast(T.string(30))
        got = run(fmt.cast(T.TIMESTAMP))
        assert [int(g) for g in got] == MICROS


class TestNumericTimestampCasts:
    """Spark cast semantics: numeric <-> timestamp is SECONDS since epoch
    (reference: cast.rs numeric/timestamp arms)."""

    def _eval(self, data, frm, to):
        import jax.numpy as jnp

        from datafusion_comet_tpu.exec.batch import from_numpy
        from datafusion_comet_tpu.exec.evaluator import evaluate

        s = T.Schema([T.Field("x", frm)])
        b = from_numpy({"x": data}, s)
        return evaluate(E.bind(E.Cast(E.col("x"), to), s), b)

    def test_long_to_timestamp_seconds(self):
        out = self._eval(np.array([0, 1, -5, 1700000000], np.int64),
                         T.INT64, T.TIMESTAMP)
        np.testing.assert_array_equal(
            np.asarray(out.data)[:4],
            np.array([0, 1_000_000, -5_000_000, 1_700_000_000_000_000]))

    def test_double_to_timestamp_fractional(self):
        out = self._eval(np.array([1.5, -0.25, np.nan, np.inf]),
                         T.FLOAT64, T.TIMESTAMP)
        got = np.asarray(out.data)
        ok = np.asarray(out.validity)
        assert got[0] == 1_500_000 and got[1] == -250_000
        assert not ok[2] and not ok[3]  # NaN/Inf -> null

    def test_timestamp_to_long_floors_seconds(self):
        out = self._eval(np.array([1_500_000, -1_500_000, 0], np.int64),
                         T.TIMESTAMP, T.INT64)
        np.testing.assert_array_equal(np.asarray(out.data)[:3], [1, -2, 0])

    def test_timestamp_to_double_seconds(self):
        out = self._eval(np.array([1_500_000, -250_000], np.int64),
                         T.TIMESTAMP, T.FLOAT64)
        np.testing.assert_allclose(np.asarray(out.data)[:2], [1.5, -0.25])

    def test_roundtrip(self):
        out = self._eval(np.array([123456789], np.int64), T.INT64, T.TIMESTAMP)
        back = self._eval(np.asarray(out.data), T.TIMESTAMP, T.INT64)
        assert int(np.asarray(back.data)[0]) == 123456789
