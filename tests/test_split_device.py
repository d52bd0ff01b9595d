"""Device split / split_part / substring_index (exec/split_device.py) —
differential vs the Python oracle (str.split semantics = the host-bridge
behavior), including multi-byte delimiters, overlap resolution, dict-coded
inputs, and the max_parts overflow error. Reference:
spark-expr/src/string_funcs/split.rs."""

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import Session, QueryExecutionError
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import functions as F
from datafusion_comet_tpu.ir import plan as P

SCHEMA = T.Schema([T.Field("s", T.string(24))])
VALS = ["a-b-c", "xx--yy", "-lead", "trail-", "", None, "nodelim",
        "a-b-c-d-e-f", "--", "aaa"]
DATA = {"s": VALS}


def run(expr, vals=None, name="o", width=24):
    s = Session()
    data = {"s": vals if vals is not None else VALS}
    schema = T.Schema([T.Field("s", T.string(width))])
    s.register_numpy("t", data, schema)
    out = s.collect(P.Scan("t", schema).project([expr.alias(name)]))
    return [v if ok else None for v, ok in zip(out[name], out[name + "__valid"])]


def test_split_literal_is_device_node():
    e = F.split(E.col("s"), "-")
    assert isinstance(e, E.Split)
    assert isinstance(F.split(E.col("s"), r"[-,]"), E.PythonUdf)
    assert isinstance(F.split(E.col("s"), "-", limit=2), E.PythonUdf)


def test_split_matches_oracle():
    got = run(F.split(E.col("s"), "-"))
    want = [None if v is None else v.split("-") for v in VALS]
    assert got == want


def test_split_multibyte_delim():
    vals = ["ab::cd::ef", "::x", "y::", "aaa", None, "::::"]
    got = run(F.split(E.col("s"), "::"), vals=vals)
    want = [None if v is None else v.split("::") for v in vals]
    assert got == want


def test_split_overlapping_delim():
    # "aaa".split("aa") in Java/Python: ["", "a"] — non-overlap left scan
    got = run(F.split(E.col("s"), "aa"), vals=["aaa", "aaaa", "baaab"])
    assert got == ["aaa".split("aa"), "aaaa".split("aa"), "baaab".split("aa")]


def test_split_part_device():
    e = F.split_part(E.col("s"), "-", 2)
    assert isinstance(e, E.SplitPart)
    want = [None if v is None else
            (v.split("-")[1] if len(v.split("-")) >= 2 else "")
            for v in VALS]
    assert run(e) == want


def test_split_part_negative_and_range():
    def oracle(v, k):
        if v is None:
            return None
        parts = v.split("-")
        i = k - 1 if k > 0 else len(parts) + k
        return parts[i] if 0 <= i < len(parts) else ""

    for k in (1, 2, 3, -1, -2, 99, -99):
        got = run(F.split_part(E.col("s"), "-", k))
        assert got == [oracle(v, k) for v in VALS], k


def test_split_part_zero_is_error():
    with pytest.raises(QueryExecutionError):
        run(F.split_part(E.col("s"), "-", 0))


def test_substring_index_device():
    def oracle(v, n):
        if v is None:
            return None
        if n == 0:
            return ""
        parts = v.split("-")
        return "-".join(parts[:n]) if n > 0 else "-".join(parts[n:])

    for n in (1, 2, 3, -1, -2, 0, 99, -99):
        got = run(F.substring_index(E.col("s"), "-", n))
        assert got == [oracle(v, n) for v in VALS], n


def test_substring_index_multibyte_positive():
    vals = ["a::b::c", "x", None, "::"]
    e = F.substring_index(E.col("s"), "::", 2)
    assert isinstance(e, E.SubstringIndex)
    got = run(e, vals=vals)
    assert got == ["a::b", "x", None, "::"]
    # negative + multibyte keeps the host bridge
    assert isinstance(F.substring_index(E.col("s"), "::", -1), E.PythonUdf)


def test_split_overflow_raises():
    vals = ["-".join(str(i) for i in range(20))]
    with pytest.raises(QueryExecutionError):
        run(F.split(E.col("s"), "-", max_elems=8), vals=vals, width=60)


def test_split_on_dict_column():
    # low-cardinality strings dictionary-encode at registration; the split
    # family evaluates over the K dictionary rows (_eval_on_dict)
    vals = (["AIR-1", "RAIL-2", "SHIP-3"] * 50) + [None]
    got = run(F.split_part(E.col("s"), "-", 2), vals=vals, width=12)
    want = [None if v is None else v.split("-")[1] for v in vals]
    assert got == want
    got2 = run(F.split(E.col("s"), "-"), vals=vals, width=12)
    assert got2 == [None if v is None else v.split("-") for v in vals]


def test_serde_roundtrip():
    from datafusion_comet_tpu.ir.serde import expr_from_dict, expr_to_dict

    for e in (E.Split(E.col("s"), "-", 8),
              E.SplitPart(E.col("s"), "::", -2),
              E.SubstringIndex(E.col("s"), ".", 3)):
        back = expr_from_dict(expr_to_dict(e))
        assert repr(back) == repr(e)


def test_soundex_device_matches_host():
    from datafusion_comet_tpu.ir.functions import soundex, soundex_host

    vals = ["Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak",
            "Pfister", "Honeyman", "", None, "1abc", "a", "HW", "lll-lll"]
    e = soundex(E.col("s"))
    assert isinstance(e, E.Soundex)
    got = run(e, vals=vals, width=12)
    want = run(soundex_host(E.col("s")), vals=vals, width=12)
    assert got == want
    assert got[0] == "R163"  # the canonical vector


def test_soundex_on_dict_column():
    from datafusion_comet_tpu.ir.functions import soundex, soundex_host

    vals = ["Robert", "Rupert", "Honeyman"] * 40 + [None]
    got = run(soundex(E.col("s")), vals=vals, width=12)
    want = run(soundex_host(E.col("s")), vals=vals, width=12)
    assert got == want
