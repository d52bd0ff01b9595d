"""Device regexp_replace (exec/regex_extract.py replace_device) —
differential vs Python re.sub over linear patterns with literal
replacements, including fuzz, non-overlap resolution, growth handling,
dict inputs, and host-bridge gating. Reference:
spark-expr/src/string_funcs regexp_replace."""

import re

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import QueryExecutionError, Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import functions as F
from datafusion_comet_tpu.ir import plan as P


def run(expr, vals, name="o", width=24):
    s = Session()
    schema = T.Schema([T.Field("s", T.string(width))])
    s.register_numpy("t", {"s": vals}, schema)
    out = s.collect(P.Scan("t", schema).project([expr.alias(name)]))
    return [v if ok else None for v, ok in zip(out[name], out[name + "__valid"])]


def oracle(vals, pattern, repl):
    rx = re.compile(pattern)
    return [None if v is None else rx.sub(repl, v) for v in vals]


def test_gating():
    assert isinstance(F.regexp_replace(E.col("s"), "[0-9]+", "#"),
                      E.RegexpReplace)
    # group refs keep the host bridge
    assert isinstance(F.regexp_replace(E.col("s"), "([0-9]+)", "$1x"),
                      E.PythonUdf)
    # patterns that can match empty keep the host bridge
    assert isinstance(F.regexp_replace(E.col("s"), "[0-9]*", "#"),
                      E.PythonUdf)
    # alternation doesn't linearize
    assert isinstance(F.regexp_replace(E.col("s"), "a|b", "#"),
                      E.PythonUdf)


def test_basic_vs_oracle():
    vals = ["a1b22c333", "no-digits", "", None, "999", "x5", "5x5x5x"]
    got = run(F.regexp_replace(E.col("s"), "[0-9]+", "#"), vals)
    assert got == oracle(vals, "[0-9]+", "#")


def test_literal_pattern_and_longer_replacement():
    vals = ["a-b-c", "---", "abc", None, "-"]
    got = run(F.regexp_replace(E.col("s"), "-", "<=>"), vals, width=8)
    assert got == oracle(vals, "-", "<=>")


def test_removal():
    vals = ["  spaced  out  ", "nospace", None]
    got = run(F.regexp_replace(E.col("s"), " +", ""), vals)
    assert got == oracle(vals, " +", "")


def test_nonoverlap_multibyte():
    vals = ["aaaa", "aaa", "baaab", "aa"]
    got = run(F.regexp_replace(E.col("s"), "aa", "X"), vals)
    assert got == oracle(vals, "aa", "X")


def test_anchored():
    vals = ["abc123", "123abc", "abc", None]
    got = run(F.regexp_replace(E.col("s"), "^[a-z]+", "_"), vals)
    assert got == oracle(vals, "^[a-z]+", "_")


def test_overflow_raises():
    with pytest.raises(QueryExecutionError):
        run(F.regexp_replace(E.col("s"), "x", "yyyyyyyyyy", out_len=6),
            ["xxxx"], width=6)


def test_dict_input():
    vals = ["MODE-AIR", "MODE-RAIL", "MODE-SHIP"] * 40 + [None]
    got = run(F.regexp_replace(E.col("s"), "MODE-", ""), vals, width=12)
    assert got == oracle(vals, "MODE-", "")


def test_fuzz_vs_re():
    rng = np.random.default_rng(17)
    alphabet = "ab1 -"
    pats = ["[0-9]+", "[a-b]+1", " -", "b[0-9]", "^a[a-b]*1"]
    for pat in pats:
        e = F.regexp_replace(E.col("s"), pat, "#")
        if not isinstance(e, E.RegexpReplace):
            continue
        vals = ["".join(rng.choice(list(alphabet), rng.integers(0, 16)))
                for _ in range(300)]
        got = run(e, vals, width=20)
        assert got == oracle(vals, pat, "#"), pat


def run_list(expr, vals, name="o", width=24):
    s = Session()
    schema = T.Schema([T.Field("s", T.string(width))])
    s.register_numpy("t", {"s": vals}, schema)
    out = s.collect(P.Scan("t", schema).project([expr.alias(name)]))
    return [v if ok else None for v, ok in zip(out[name], out[name + "__valid"])]


def test_extract_all_device_vs_oracle():
    e = F.regexp_extract_all(E.col("s"), "[0-9]+", 0)
    assert isinstance(e, E.RegexpExtractAll)
    vals = ["a1b22c333", "no", "", None, "9 8 7", "x"]
    got = run_list(e, vals)
    want = [None if v is None else re.findall("[0-9]+", v) for v in vals]
    assert got == want


def test_extract_all_group():
    e = F.regexp_extract_all(E.col("s"), "([a-z]+)=([0-9]+)", 2)
    if isinstance(e, E.RegexpExtractAll):
        vals = ["a=1 b=22", "x=5", "none", None]
        got = run_list(e, vals)
        want = [None if v is None else
                [m[1] for m in re.findall("([a-z]+)=([0-9]+)", v)]
                for v in vals]
        assert got == want


def test_extract_all_dict_and_overflow():
    vals = ["1-2-3", "4-5"] * 30
    got = run_list(F.regexp_extract_all(E.col("s"), "[0-9]", 0), vals, width=8)
    assert got == [re.findall("[0-9]", v) for v in vals]
    with pytest.raises(QueryExecutionError):
        run_list(F.regexp_extract_all(E.col("s"), "[0-9]", 0, max_elems=2),
                 ["1-2-3-4"], width=8)
