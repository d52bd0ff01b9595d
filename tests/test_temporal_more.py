"""Round-3 temporal kernels: weekday, unix_seconds, timestampadd/diff,
convert_timezone, date_format (reference: datetime_funcs)."""

from datetime import datetime, timezone

import numpy as np

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import from_numpy
from datafusion_comet_tpu.exec.evaluator import evaluate
from datafusion_comet_tpu.ir import expr as E


def micros(*a):
    return int(datetime(*a, tzinfo=timezone.utc).timestamp() * 1_000_000)


def ev(expr, data, dtype):
    s = T.Schema([T.Field("x", dtype)] + (
        [T.Field("y", dtype)] if "y" in data else []))
    b = from_numpy(data, s)
    cv = evaluate(E.bind(expr, s), b)
    n = len(data["x"])
    return np.asarray(cv.data)[:n], np.asarray(cv.validity)[:n]


def test_weekday():
    days = np.array([0, 1, 2, 3], np.int32)  # Thu Fri Sat Sun
    v, _ = ev(E.TemporalFunc("weekday", (E.col("x"),)), {"x": days}, T.DATE)
    assert list(v) == [3, 4, 5, 6]


def test_unix_seconds():
    ts = np.array([micros(2020, 1, 1, 0, 0, 1), -1_500_000], np.int64)
    v, _ = ev(E.TemporalFunc("unix_seconds", (E.col("x"),)), {"x": ts}, T.TIMESTAMP)
    assert v[0] == 1577836801 and v[1] == -2


def test_timestampadd_units():
    base = micros(2020, 1, 31, 12, 0, 0)
    data = {"x": np.array([base], np.int64)}
    for unit, want in [
        ("HOUR", micros(2020, 1, 31, 13, 0, 0)),
        ("DAY", micros(2020, 2, 1, 12, 0, 0)),
        ("MONTH", micros(2020, 2, 29, 12, 0, 0)),  # clamp to month end
        ("YEAR", micros(2021, 1, 31, 12, 0, 0)),
    ]:
        e = E.TemporalFunc("timestampadd", (E.col("x"), E.lit(1, T.INT64)),
                           unit=unit)
        v, _ = ev(e, data, T.TIMESTAMP)
        assert v[0] == want, unit


def test_timestampdiff():
    a = micros(2020, 1, 31, 0, 0, 0)
    b_ = micros(2020, 3, 1, 0, 0, 0)
    data = {"x": np.array([a], np.int64), "y": np.array([b_], np.int64)}
    e = E.TemporalFunc("timestampdiff", (E.col("x"), E.col("y")), unit="MONTH")
    v, _ = ev(e, data, T.TIMESTAMP)
    assert v[0] == 1  # Jan 31 -> Mar 1 is one whole month (+ a day)
    e = E.TemporalFunc("timestampdiff", (E.col("x"), E.col("y")), unit="DAY")
    v, _ = ev(e, data, T.TIMESTAMP)
    assert v[0] == 30


def test_convert_timezone():
    wall = micros(2020, 6, 1, 12, 0, 0)  # wall clock in src zone
    e = E.TemporalFunc("convert_timezone", (E.col("x"),),
                       tz="America/New_York", unit="UTC")
    v, _ = ev(e, {"x": np.array([wall], np.int64)}, T.TIMESTAMP_NTZ)
    # noon EDT == 16:00 UTC
    assert v[0] == micros(2020, 6, 1, 16, 0, 0)


def test_date_format():
    from datafusion_comet_tpu.ir import functions as F

    s = T.Schema([T.Field("x", T.TIMESTAMP)])
    b = from_numpy({"x": np.array([micros(2020, 3, 5, 7, 9, 11)], np.int64)}, s)
    cv = evaluate(E.bind(F.date_format(E.col("x"), "yyyy-MM-dd HH:mm:ss"), s), b)
    from datafusion_comet_tpu.exec.batch import to_numpy

    out = to_numpy(type(b)((cv,), b.row_mask, T.Schema([T.Field("o", cv.dtype)])))
    assert out["o"][0] == "2020-03-05 07:09:11"
