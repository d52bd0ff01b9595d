"""Device regexp_extract (exec/regex_extract.py): differential vs Python
``re`` over random strings for the linear backtracking-free subset, plus
linearize gating (patterns that could backtrack must fall back)."""

import re

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.exec.regex_extract import linearize
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import functions as F
from datafusion_comet_tpu.ir import plan as P

DEVICE_PATTERNS = [
    (r"(\d+)", 1),
    (r"(\d+)-(\d+)", 2),
    (r"([a-z]+)@([a-z.]+)", 1),
    (r"([a-z]+)@([a-z.]+)", 2),
    (r"^(\w+) ", 1),
    (r"x(\d{2,4})y", 1),
    (r"(\d)(\d)", 2),
    (r"ab(c*)d", 1),
    (r"v=(\d+)$", 1),
    (r"(\d+)", 0),
]

FALLBACK_PATTERNS = [
    (r"(a|b)+", 1),      # alternation
    (r"(\d+)(\d)", 1),   # backtracking required
    (r"((a)b)", 2),      # nested groups
    (r"(\d+)+", 1),      # repeated group
    (r"no(ne)?", 1),     # optional group (needs alternation)
]

STRINGS = [
    "abc 123-456 def", "x99y", "x12345y", "no digits here", "7",
    "user@mail.com host@a.b", "", "42-", "-42", "abcd", "abccccd",
    "v=7", "v=7 trailing", "none", "no", "x1y x22y x333y", "9-8 7-6",
]


def _run(expr, strings):
    schema = T.Schema([T.Field("s", T.string(24))])
    sess = Session()
    sess.register_numpy("t", {"s": list(strings)}, schema)
    plan = P.Scan("t", schema).project([expr.alias("r")])
    out = sess.collect(plan)
    return [v if ok else None for v, ok in zip(out["r"], out["r__valid"])]


@pytest.mark.parametrize("pat,idx", DEVICE_PATTERNS)
def test_device_matches_python_re(pat, idx):
    assert linearize(pat, idx) is not None, f"{pat} should linearize"
    expr = F.regexp_extract(E.col("s"), pat, idx)
    assert isinstance(expr, E.RegexpExtract), "device node not chosen"
    got = _run(expr, STRINGS)
    want = []
    for s in STRINGS:
        m = re.search(pat, s)
        if m is None:
            want.append("")
        else:
            g = m.group(idx)
            want.append(g if g is not None else "")
    assert got == want, (pat, idx, got, want)


@pytest.mark.parametrize("pat,idx", FALLBACK_PATTERNS)
def test_fallback_patterns_reject(pat, idx):
    assert linearize(pat, idx) is None, f"{pat} must not linearize"
    expr = F.regexp_extract(E.col("s"), pat, idx)
    assert isinstance(expr, E.PythonUdf)


def test_random_fuzz_vs_re():
    rng = np.random.default_rng(11)
    alphabet = list("ab1 2-.")
    strs = ["".join(rng.choice(alphabet, size=rng.integers(0, 20)))
            for _ in range(200)]
    pats = [r"(\d+)", r"([ab]+)", r"(\d+)-(\d+)", r"a(\d*)b", r"^([ab]*)"]
    for pat in pats:
        for idx in range(0, pat.count("(") + 1):
            if linearize(pat, idx) is None:
                continue
            expr = F.regexp_extract(E.col("s"), pat, idx)
            got = _run(expr, strs)
            want = []
            for s in strs:
                m = re.search(pat, s)
                want.append("" if m is None else (m.group(idx) or ""))
            assert got == want, (pat, idx)


def test_nulls_and_serde_roundtrip():
    from datafusion_comet_tpu.ir.serde import plan_to_json, plan_from_json

    schema = T.Schema([T.Field("s", T.string(16))])
    sess = Session()
    sess.register_numpy("t", {"s": ["a1", None, "b22"]}, schema)
    expr = F.regexp_extract(E.col("s"), r"(\d+)", 1)
    plan = P.Scan("t", schema).project([expr.alias("r")])
    rt = plan_from_json(plan_to_json(plan))
    out = sess.collect(rt)
    assert [v if ok else None for v, ok in zip(out["r"], out["r__valid"])] \
        == ["1", None, "22"]
