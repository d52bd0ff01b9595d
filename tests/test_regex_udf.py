"""RLIKE DFA matcher + host-UDF regexp/json functions: differential vs Python re.

Mirrors the reference's regexp coverage (CometStringExpressionSuite rlike
tests; spark-expr/src/predicate_funcs/rlike.rs unit tests): every DFA match
is cross-checked against Python ``re.search`` on the same inputs.
"""

import re

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.exec.regex_dfa import compile_dfa, dfa_match
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import functions as F
from datafusion_comet_tpu.ir import plan as P

STRINGS = [
    "hello world", "", "abc123", "A1B2C3", "foo.bar", "aaab", "xyzzy",
    "2024-01-15", "user@example.com", "  spaces  ", "tab\there", "ABC",
    "a", "ab", "ba", "aab", None, "123", "12.5", "-42",
]

SCHEMA = T.Schema([T.Field("s", T.string(32))])
DATA = {"s": STRINGS}


def run(expr, name="out", data=DATA, schema=SCHEMA):
    s = Session()
    s.register_numpy("t", data, schema)
    out = s.collect(P.Scan("t", schema).project([expr.alias(name)]))
    return [
        v if ok else None for v, ok in zip(out[name], out[name + "__valid"])
    ]


PATTERNS = [
    r"world",
    r"^abc",
    r"[0-9]+",
    r"^[A-Z]\d[A-Z]\d[A-Z]\d$",
    r"foo\.bar",
    r"a+b",
    r"a*b",
    r"colou?r",
    r"\d{4}-\d{2}-\d{2}",
    r"[a-z]+@[a-z]+\.[a-z]+",
    r"^\s+",
    r"\t",
    r"^(a|ba)+$",
    r"^-?\d+(\.\d+)?$",
    r"[^0-9]",
    r"(ab|ba){2}",
    r"^$",
    r"a{2,3}b",
]


class TestDfaVsPythonRe:
    @pytest.mark.parametrize("pat", PATTERNS)
    def test_pattern(self, pat):
        got = run(F.rlike(E.col("s"), pat))
        expect = [None if s is None else bool(re.search(pat, s)) for s in STRINGS]
        assert got == expect, f"pattern {pat!r}"

    def test_negated(self):
        got = run(F.rlike(E.col("s"), r"\d", negated=True))
        expect = [None if s is None else not re.search(r"\d", s) for s in STRINGS]
        assert got == expect

    def test_random_fuzz(self):
        rng = np.random.default_rng(7)
        alphabet = "abc01."
        strs = ["".join(rng.choice(list(alphabet), size=rng.integers(0, 12))) for _ in range(64)]
        pats = [r"a.c", r"[ab]+c", r"0\.1|b{2}", r"^a.*1$", r"(a|b)*c0"]
        schema = T.Schema([T.Field("s", T.string(16))])
        for pat in pats:
            got = run(F.rlike(E.col("s"), pat), data={"s": strs}, schema=schema)
            expect = [bool(re.search(pat, s)) for s in strs]
            assert got == expect, pat


class TestDfaUnit:
    def test_dfa_shapes(self):
        trans, acc = compile_dfa(r"ab+c")
        assert trans.shape[1] == 258 and acc.shape[0] == trans.shape[0]

    def test_anchors(self):
        import jax.numpy as jnp

        trans, acc = compile_dfa(r"^ab$")
        mat = np.zeros((3, 4), np.uint8)
        for i, s in enumerate([b"ab", b"xab", b"abx"]):
            mat[i, : len(s)] = list(s)
        lens = jnp.asarray(np.array([2, 3, 3], np.int32))
        got = np.asarray(dfa_match(jnp.asarray(mat), lens, trans, acc))
        assert list(got) == [True, False, False]


class TestHostRegexpFuncs:
    def test_regexp_extract(self):
        got = run(F.regexp_extract(E.col("s"), r"(\d+)", 1))
        expect = [
            None if s is None else (re.search(r"(\d+)", s).group(1) if re.search(r"(\d+)", s) else "")
            for s in STRINGS
        ]
        assert got == expect

    def test_regexp_replace(self):
        got = run(F.regexp_replace(E.col("s"), r"[aeiou]", "_"))
        expect = [None if s is None else re.sub(r"[aeiou]", "_", s) for s in STRINGS]
        assert got == expect

    def test_regexp_replace_group_ref(self):
        got = run(F.regexp_replace(E.col("s"), r"(\d)(\d)", r"$2$1"))
        expect = [None if s is None else re.sub(r"(\d)(\d)", r"\2\1", s) for s in STRINGS]
        assert got == expect

    def test_split(self):
        got = run(F.split(E.col("s"), r"[ .@-]"))
        expect = [None if s is None else re.split(r"[ .@-]", s) for s in STRINGS]
        assert got == expect

    def test_split_limit(self):
        got = run(F.split(E.col("s"), r" ", limit=2))
        expect = [None if s is None else s.split(" ", 1) for s in STRINGS]
        assert got == expect


class TestJson:
    JDATA = {
        "j": [
            '{"a": {"b": [1, 2, 3]}, "c": "x"}',
            '{"a": 1.5, "t": true}',
            '[10, 20]',
            'not json',
            None,
            '{"s": "hi", "o": {"k": "v"}}',
        ]
    }
    JSCHEMA = T.Schema([T.Field("j", T.string(64))])

    def test_get_json_object(self):
        # pin the host bridge: this corpus checks re-serialization semantics
        # (device-kernel span semantics are covered by test_json_device.py)
        from datafusion_comet_tpu.conf import CONF

        CONF.set("comet.expr.json.deviceEnabled", False)
        self._gate = True
        cases = [
            ("$.a.b[1]", ["2", None, None, None, None, None]),
            ("$.c", ["x", None, None, None, None, None]),
            ("$.a", ['{"b":[1,2,3]}', "1.5", None, None, None, None]),
            ("$[0]", [None, None, "10", None, None, None]),
            ("$.t", [None, "true", None, None, None, None]),
            ("$.o", [None, None, None, None, None, '{"k":"v"}']),
            ("$.missing", [None, None, None, None, None, None]),
        ]
        try:
            for path, expect in cases:
                got = run(F.get_json_object(E.col("j"), path), data=self.JDATA, schema=self.JSCHEMA)
                assert got == expect, path
        finally:
            CONF.set("comet.expr.json.deviceEnabled", True)

    def test_json_array_length(self):
        got = run(F.json_array_length(E.col("j")), data=self.JDATA, schema=self.JSCHEMA)
        assert [None if g is None else int(g) for g in got] == [None, None, 2, None, None, None]


class TestPythonUdf:
    def test_scalar_udf(self):
        schema = T.Schema([T.Field("x", T.INT32), T.Field("y", T.INT32)])
        data = {"x": np.arange(5, dtype=np.int32), "y": np.arange(5, dtype=np.int32) * 10}
        udf = F.python_udf(lambda a, b: a * 100 + b if a % 2 == 0 else None, (E.col("x"), E.col("y")), T.INT64)
        got = run(udf, data=data, schema=schema)
        assert [None if g is None else int(g) for g in got] == [0, None, 220, None, 440]

    def test_udf_in_filter(self):
        schema = T.Schema([T.Field("x", T.INT32)])
        data = {"x": np.arange(8, dtype=np.int32)}
        s = Session()
        s.register_numpy("t", data, schema)
        pred = F.python_udf(lambda v: v % 3 == 0, (E.col("x"),), T.BOOL)
        out = s.collect(P.Scan("t", schema).filter(pred))
        assert list(out["x"]) == [0, 3, 6]
