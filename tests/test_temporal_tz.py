"""Timezone-aware temporal functions: differential vs Python zoneinfo/datetime.

Mirrors CometTemporalExpressionSuite coverage; the oracle is the stdlib
(zoneinfo draws on the same tzdata the TZif parser reads).
"""

from datetime import datetime, timedelta, timezone
from zoneinfo import ZoneInfo

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P

# instants crossing DST transitions, year boundaries, pre-1970
INSTANTS = [
    0,
    1_000_000_000,          # 2001-09-09
    1_609_459_200,          # 2021-01-01 00:00 UTC
    1_615_694_400,          # 2021-03-14 04:00 UTC — US DST spring forward day
    1_636_264_800,          # 2021-11-07 06:00 UTC — US DST fall back
    1_720_000_000,
    -86400,                 # 1969-12-31
    883_612_800,            # 1998-01-01
]
MICROS = np.array([t * 1_000_000 for t in INSTANTS], np.int64)

SCHEMA = T.Schema([T.Field("ts", T.TIMESTAMP), T.Field("d", T.DATE), T.Field("n", T.INT32)])
DATES = np.array([0, 59, 365, 18993, -1, 11016, 18321, 100], np.int32)
NS = np.array([1, -1, 13, 25, -25, 0, 5, 2], np.int32)
DATA = {"ts": MICROS, "d": DATES, "n": NS}


def run(expr, name="out"):
    s = Session()
    s.register_numpy("t", DATA, SCHEMA)
    out = s.collect(P.Scan("t", SCHEMA).project([expr.alias(name)]))
    return [v if ok else None for v, ok in zip(out[name], out[name + "__valid"])]


def utc_dt(ts):
    return datetime.fromtimestamp(ts, tz=timezone.utc)


class TestTzConversion:
    @pytest.mark.parametrize("tz", ["America/New_York", "Europe/Berlin", "Asia/Kolkata", "+05:30", "UTC"])
    def test_from_utc_timestamp(self, tz):
        got = run(E.TemporalFunc("from_utc_timestamp", (E.col("ts"), E.lit(tz))))
        z = ZoneInfo(tz) if "/" in tz else timezone(timedelta(hours=5, minutes=30)) if tz == "+05:30" else timezone.utc
        for g, ts in zip(got, INSTANTS):
            local = utc_dt(ts).astimezone(z).replace(tzinfo=None)
            expect = int((local - datetime(1970, 1, 1)).total_seconds() * 1e6)
            assert int(g) == expect, (tz, ts)

    @pytest.mark.parametrize("tz", ["America/New_York", "Europe/Berlin"])
    def test_to_utc_roundtrip(self, tz):
        """from_utc then to_utc round-trips (away from gap instants)."""
        inner = E.TemporalFunc("from_utc_timestamp", (E.col("ts"), E.lit(tz)))
        got = run(E.TemporalFunc("to_utc_timestamp", (inner, E.lit(tz))))
        for g, ts in zip(got, INSTANTS):
            assert int(g) == ts * 1_000_000, (tz, ts)

    def test_hour_with_session_tz(self):
        got = run(E.TemporalFunc("hour", (E.col("ts"),), tz="America/New_York"))
        z = ZoneInfo("America/New_York")
        for g, ts in zip(got, INSTANTS):
            assert int(g) == utc_dt(ts).astimezone(z).hour, ts


class TestUnixConversions:
    def test_unix_timestamp(self):
        got = run(E.TemporalFunc("unix_timestamp", (E.col("ts"),)))
        assert [int(g) for g in got] == INSTANTS

    def test_timestamp_seconds_roundtrip(self):
        secs = E.TemporalFunc("unix_timestamp", (E.col("ts"),))
        got = run(E.TemporalFunc("timestamp_seconds", (secs,)))
        assert [int(g) for g in got] == [t * 1_000_000 for t in INSTANTS]

    def test_unix_millis_micros(self):
        got = run(E.TemporalFunc("unix_micros", (E.col("ts"),)))
        assert [int(g) for g in got] == [t * 1_000_000 for t in INSTANTS]
        got = run(E.TemporalFunc("unix_millis", (E.col("ts"),)))
        assert [int(g) for g in got] == [t * 1000 for t in INSTANTS]

    def test_from_unixtime(self):
        secs = E.TemporalFunc("unix_timestamp", (E.col("ts"),))
        got = run(E.TemporalFunc("from_unixtime", (secs,)))
        for g, ts in zip(got, INSTANTS):
            assert g == utc_dt(ts).strftime("%Y-%m-%d %H:%M:%S"), ts


class TestDateTrunc:
    @pytest.mark.parametrize("unit", ["year", "quarter", "month", "week", "day", "hour", "minute", "second"])
    def test_units_utc(self, unit):
        got = run(E.TemporalFunc("date_trunc", (E.lit(unit), E.col("ts"))))
        for g, ts in zip(got, INSTANTS):
            dt = utc_dt(ts)
            if unit == "year":
                ex = dt.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
            elif unit == "quarter":
                qm = (dt.month - 1) // 3 * 3 + 1
                ex = dt.replace(month=qm, day=1, hour=0, minute=0, second=0, microsecond=0)
            elif unit == "month":
                ex = dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
            elif unit == "week":
                ex = (dt - timedelta(days=dt.weekday())).replace(hour=0, minute=0, second=0, microsecond=0)
            elif unit == "day":
                ex = dt.replace(hour=0, minute=0, second=0, microsecond=0)
            elif unit == "hour":
                ex = dt.replace(minute=0, second=0, microsecond=0)
            elif unit == "minute":
                ex = dt.replace(second=0, microsecond=0)
            else:
                ex = dt.replace(microsecond=0)
            assert int(g) == int(ex.timestamp() * 1e6), (unit, ts)


class TestDateArithmetic:
    def test_add_months(self):
        got = run(E.TemporalFunc("add_months", (E.col("d"), E.col("n"))))
        for g, d, n in zip(got, DATES, NS):
            base = datetime(1970, 1, 1) + timedelta(days=int(d))
            y = base.year + (base.month - 1 + int(n)) // 12
            m = (base.month - 1 + int(n)) % 12 + 1
            # clamp to last day of month
            if m == 12:
                last = (datetime(y + 1, 1, 1) - timedelta(days=1)).day
            else:
                last = (datetime(y, m + 1, 1) - timedelta(days=1)).day
            ex = datetime(y, m, min(base.day, last))
            assert int(g) == (ex - datetime(1970, 1, 1)).days, (d, n)

    def test_next_day(self):
        got = run(E.TemporalFunc("next_day", (E.col("d"), E.lit("Monday"))))
        for g, d in zip(got, DATES):
            base = datetime(1970, 1, 1) + timedelta(days=int(d))
            delta = (0 - base.weekday()) % 7 or 7
            assert int(g) == int(d) + delta, d

    def test_make_date(self):
        expr = E.TemporalFunc("make_date", (E.lit(2021), E.lit(2), E.col("n")))
        got = run(expr)
        for g, n in zip(got, NS):
            try:
                ex = (datetime(2021, 2, int(n)) - datetime(1970, 1, 1)).days
            except ValueError:
                ex = None
            assert (None if g is None else int(g)) == ex, n

    def test_months_between(self):
        a = E.TemporalFunc("timestamp_seconds", (E.lit(int(datetime(2022, 3, 31).timestamp())),))
        b2 = E.TemporalFunc("timestamp_seconds", (E.lit(int(datetime(2022, 1, 31).timestamp())),))
        got = run(E.TemporalFunc("months_between", (a, b2)))
        assert got[0] == pytest.approx(2.0)  # both month-ends → integral
        c = E.TemporalFunc("timestamp_seconds", (E.lit(int(datetime(2022, 1, 15).timestamp())),))
        got = run(E.TemporalFunc("months_between", (a, c)))
        assert got[0] == pytest.approx(2.0 + 16.0 / 31.0)


class TestTzAwareCast:
    """Session-timezone Cast (Cast.timezone): timestamp→string/date rendering
    and string→timestamp parsing in a named zone, DST-transition exact
    (reference: cast.rs timestamp casts with timeZoneId)."""

    TZ = "America/Los_Angeles"

    def _render(self, times):
        import numpy as np

        from datafusion_comet_tpu.exec import batch as B
        from datafusion_comet_tpu.exec import evaluator as EV

        micros = np.array([int(t.timestamp() * 1_000_000) for t in times], np.int64)
        schema = T.Schema([T.Field("t", T.TIMESTAMP)])
        b = B.from_numpy({"t": micros}, schema)
        cv = EV.evaluate(E.bind(E.Cast(E.col("t"), T.string(30), timezone=self.TZ), schema), b)
        d, ln = np.asarray(cv.data), np.asarray(cv.lengths)
        return [bytes(d[i, : ln[i]]).decode() for i in range(len(times))]

    def test_timestamp_to_string_session_tz(self):
        from datetime import datetime, timezone
        from zoneinfo import ZoneInfo

        times = [
            datetime(2024, 3, 10, 9, 59, 59, tzinfo=timezone.utc),  # PST second
            datetime(2024, 3, 10, 10, 0, 1, tzinfo=timezone.utc),   # PDT second
            datetime(2023, 7, 4, 12, 30, 45, 123456, tzinfo=timezone.utc),
            datetime(1999, 12, 31, 23, 59, 59, tzinfo=timezone.utc),
        ]
        got = self._render(times)
        for g, t in zip(got, times):
            want = t.astimezone(ZoneInfo(self.TZ)).strftime("%Y-%m-%d %H:%M:%S")
            if t.microsecond:
                want += ("%.6f" % (t.microsecond / 1e6))[1:].rstrip("0")
            assert g == want

    def test_string_to_timestamp_session_tz(self):
        import numpy as np
        from datetime import datetime
        from zoneinfo import ZoneInfo

        from datafusion_comet_tpu.exec import batch as B
        from datafusion_comet_tpu.exec import evaluator as EV

        svals = ["2024-03-10 01:59:59", "2024-07-01 12:00:00", "2024-11-03 00:30:00"]
        schema = T.Schema([T.Field("s", T.string(20))])
        b = B.from_numpy({"s": np.array(svals, object)}, schema)
        cv = EV.evaluate(E.bind(E.Cast(E.col("s"), T.TIMESTAMP, timezone=self.TZ), schema), b)
        for s, g in zip(svals, np.asarray(cv.data)):
            want = int(datetime.strptime(s, "%Y-%m-%d %H:%M:%S")
                       .replace(tzinfo=ZoneInfo(self.TZ)).timestamp() * 1e6)
            assert int(g) == want, s

    def test_timestamp_to_date_session_tz(self):
        import numpy as np
        from datetime import datetime, timezone

        from datafusion_comet_tpu.exec import batch as B
        from datafusion_comet_tpu.exec import evaluator as EV

        t0 = datetime(2024, 1, 1, 5, 0, 0, tzinfo=timezone.utc)  # Dec 31 21:00 PST
        schema = T.Schema([T.Field("t", T.TIMESTAMP)])
        b = B.from_numpy({"t": np.array([int(t0.timestamp() * 1e6)], np.int64)}, schema)
        cv = EV.evaluate(E.bind(E.Cast(E.col("t"), T.DATE, timezone=self.TZ), schema), b)
        assert int(np.asarray(cv.data)[0]) == (datetime(2023, 12, 31) - datetime(1970, 1, 1)).days

    def test_date_to_timestamp_session_tz(self):
        import numpy as np
        from datetime import datetime
        from zoneinfo import ZoneInfo

        from datafusion_comet_tpu.exec import batch as B
        from datafusion_comet_tpu.exec import evaluator as EV

        days = (datetime(2024, 7, 1) - datetime(1970, 1, 1)).days
        schema = T.Schema([T.Field("d", T.DATE)])
        b = B.from_numpy({"d": np.array([days], np.int32)}, schema)
        cv = EV.evaluate(E.bind(E.Cast(E.col("d"), T.TIMESTAMP, timezone=self.TZ), schema), b)
        want = int(datetime(2024, 7, 1, tzinfo=ZoneInfo(self.TZ)).timestamp() * 1e6)
        assert int(np.asarray(cv.data)[0]) == want
