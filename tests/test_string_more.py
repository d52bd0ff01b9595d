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
