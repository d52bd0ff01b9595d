"""from_json/to_json/parse_url host bridges (json_funcs/url serde analogs)."""

import numpy as np

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import functions as F
from datafusion_comet_tpu.ir import plan as P


def run(expr, data, schema, name="o"):
    s = Session()
    s.register_numpy("t", data, schema)
    out = s.collect(P.Scan("t", schema).project([expr.alias(name)]))
    return [v if ok else None for v, ok in zip(out[name], out[name + "__valid"])]


def test_from_json_struct():
    schema = T.Schema([T.Field("j", T.string(64))])
    data = {"j": ['{"a": 1, "b": "x"}', '{"a": 2}', "bad", None]}
    st = T.struct(("a", T.INT32), ("b", T.string(8)))
    got = run(F.from_json(E.col("j"), st), data, schema)
    assert got == [{"a": 1, "b": "x"}, {"a": 2, "b": None}, None, None]


def test_from_json_then_get_field():
    schema = T.Schema([T.Field("j", T.string(64))])
    data = {"j": ['{"a": 10}', '{"a": 20}']}
    st = T.struct(("a", T.INT64),)
    expr = E.GetStructField(F.from_json(E.col("j"), st), "a")
    got = run(expr, data, schema)
    assert [int(g) for g in got] == [10, 20]


def test_to_json_roundtrip():
    schema = T.Schema([T.Field("m", T.map_(T.string(4), T.INT32, 4))])
    data = {"m": [{"a": 1, "b": 2}, {}]}
    got = run(F.to_json(E.MapExpr("map_entries", (E.col("m"),))), data, schema)
    import json
    assert json.loads(got[0]) == [{"key": "a", "value": 1}, {"key": "b", "value": 2}]


def test_parse_url():
    schema = T.Schema([T.Field("u", T.string(64))])
    data = {"u": ["https://example.com:8080/p/q?x=1&y=2#frag", "notaurl", None]}
    assert run(F.parse_url(E.col("u"), "HOST"), data, schema) == ["example.com", None, None]
    assert run(F.parse_url(E.col("u"), "PATH"), data, schema) == ["/p/q", "notaurl", None]
    assert run(F.parse_url(E.col("u"), "QUERY", "y"), data, schema) == ["2", None, None]
    assert run(F.parse_url(E.col("u"), "REF"), data, schema) == ["frag", None, None]
