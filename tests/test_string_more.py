"""String function additions: chr/space/left/right/btrim/concat_ws device
kernels + split_part/substring_index/soundex/format_number/str_to_map host
bridges (reference: spark-expr/src/string_funcs/)."""

import numpy as np

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import functions as F
from datafusion_comet_tpu.ir import plan as P

SCHEMA = T.Schema([T.Field("s", T.string(20)), T.Field("n", T.INT32)])
DATA = {
    "s": ["hello world", "xx-yy-zz", "  pad  ", "", None, "Robert"],
    "n": np.array([3, 0, -2, 5, 1, 2], np.int32),
}


def run(expr, name="o"):
    s = Session()
    s.register_numpy("t", DATA, SCHEMA)
    out = s.collect(P.Scan("t", SCHEMA).project([expr.alias(name)]))
    return [v if ok else None for v, ok in zip(out[name], out[name + "__valid"])]


def test_left_right():
    assert run(E.StringFunc("left", (E.col("s"), E.col("n")))) == [
        "hel", "", "", "", None, "Ro"]
    assert run(E.StringFunc("right", (E.col("s"), E.lit(3)))) == [
        "rld", "-zz", "d  ", "", None, "ert"]


def test_chr_space():
    assert run(E.StringFunc("chr", (E.lit(65),))) == ["A"] * 6
    assert run(E.StringFunc("chr", (E.lit(256 + 66),))) == ["B"] * 6
    assert run(E.StringFunc("space", (E.col("n"),))) == [
        "   ", "", "", "     ", " ", "  "]


def test_btrim():
    assert run(E.StringFunc("btrim", (E.col("s"),))) == [
        "hello world", "xx-yy-zz", "pad", "", None, "Robert"]
    assert run(E.StringFunc("btrim", (E.col("s"), E.lit("xz")))) == [
        "hello world", "-yy-", "  pad  ", "", None, "Robert"]


def test_concat_ws():
    got = run(E.StringFunc("concat_ws", (E.lit("/"), E.col("s"), E.lit("end"))))
    assert got == ["hello world/end", "xx-yy-zz/end", "  pad  /end", "/end", "end", "Robert/end"]


def test_split_part():
    assert run(F.split_part(E.col("s"), "-", 2)) == [
        "", "yy", "", "", None, ""]
    assert run(F.split_part(E.col("s"), "-", -1)) == [
        "hello world", "zz", "  pad  ", "", None, "Robert"]


def test_substring_index():
    assert run(F.substring_index(E.col("s"), "-", 2)) == [
        "hello world", "xx-yy", "  pad  ", "", None, "Robert"]
    assert run(F.substring_index(E.col("s"), "-", -1)) == [
        "hello world", "zz", "  pad  ", "", None, "Robert"]


def test_soundex():
    assert run(F.soundex(E.col("s")))[5] == "R163"


def test_format_number():
    got = run(F.format_number(E.col("n").cast(T.FLOAT64) * E.lit(1234.5), 2))
    assert got[0] == "3,703.50" and got[4] == "1,234.50"


def test_str_to_map():
    schema = T.Schema([T.Field("m", T.string(30))])
    data = {"m": ["a:1,b:2", "x:9", None]}
    s = Session()
    s.register_numpy("t", data, schema)
    out = s.collect(P.Scan("t", schema).project([F.str_to_map(E.col("m")).alias("o")]))
    got = [v if ok else None for v, ok in zip(out["o"], out["o__valid"])]
    assert got == [{"a": "1", "b": "2"}, {"x": "9"}, None]


class TestRound3HostBridge:
    """overlay/find_in_set/format_string/to_number/make_timestamp
    (string_funcs + ToNumber/MakeTimestamp analogs)."""

    def _run(self, expr, data, schema, name="o"):
        from datafusion_comet_tpu.exec.engine import Session
        from datafusion_comet_tpu.ir import plan as P

        s = Session()
        s.register_numpy("t", data, schema)
        out = s.collect(P.Scan("t", schema).project([expr.alias(name)]))
        return [v if ok else None
                for v, ok in zip(out[name], out[name + "__valid"])]

    def test_overlay(self):
        from datafusion_comet_tpu.ir import functions as F

        sch = T.Schema([T.Field("s", T.string(16))])
        got = self._run(F.overlay(E.col("s"), "XX", 2), {"s": ["abcdef", None]}, sch)
        assert got == ["aXXdef", None]

    def test_find_in_set(self):
        from datafusion_comet_tpu.ir import functions as F

        sch = T.Schema([T.Field("s", T.string(8)), T.Field("l", T.string(24))])
        got = self._run(F.find_in_set(E.col("s"), E.col("l")),
                        {"s": ["b", "z", "a,b"], "l": ["a,b,c"] * 3}, sch)
        assert got == [2, 0, 0]

    def test_format_string(self):
        from datafusion_comet_tpu.ir import functions as F

        sch = T.Schema([T.Field("a", T.INT64), T.Field("b", T.string(8))])
        got = self._run(F.format_string("%d-%s", E.col("a"), E.col("b")),
                        {"a": np.array([7], np.int64), "b": ["x"]}, sch)
        assert got == ["7-x"]

    def test_to_number_and_try(self):
        from datafusion_comet_tpu.ir import functions as F

        sch = T.Schema([T.Field("s", T.string(16))])
        got = self._run(F.to_number(E.col("s"), "999D99"),
                        {"s": ["123.45", "7.5"]}, sch)
        assert got == [12345, 750]  # unscaled decimal(5,2) ints
        got = self._run(F.try_to_number(E.col("s"), "999"),
                        {"s": ["12", "bogus"]}, sch)
        assert got[0] == 12 and got[1] is None

    def test_make_timestamp(self):
        from datetime import datetime, timezone

        from datafusion_comet_tpu.ir import functions as F

        sch = T.Schema([T.Field("y", T.INT32)])
        e = F.make_timestamp(E.col("y"), E.lit(3, T.INT32), E.lit(5, T.INT32),
                             E.lit(7, T.INT32), E.lit(9, T.INT32),
                             E.lit(11, T.INT32))
        got = self._run(e, {"y": np.array([2020, 0], np.int32)}, sch)
        want = int(datetime(2020, 3, 5, 7, 9, 11, tzinfo=timezone.utc)
                   .timestamp() * 1e6)
        assert got[0] == want and got[1] is None
