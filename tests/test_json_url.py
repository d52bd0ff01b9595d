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


# ---- from_csv / to_csv (reference: csv_funcs, QueryPlanSerde.scala:345) ----


def test_from_csv_struct():
    schema = T.Schema([T.Field("c", T.string(32))])
    data = {"c": ["1,hello,2.5", "2,,3.5", "bad_int,x,y", None]}
    st = T.struct(("a", T.INT32), ("b", T.string(8)), ("v", T.FLOAT64))
    got = run(F.from_csv(E.col("c"), st), data, schema)
    assert got[0] == {"a": 1, "b": "hello", "v": 2.5}
    assert got[1] == {"a": 2, "b": None, "v": 3.5}
    assert got[2] == {"a": None, "b": "x", "v": None}
    assert got[3] is None


def test_from_csv_quoted_separator():
    schema = T.Schema([T.Field("c", T.string(32))])
    data = {"c": ['"a,b",2']}
    st = T.struct(("x", T.string(8)), ("y", T.INT32))
    got = run(F.from_csv(E.col("c"), st), data, schema)
    assert got[0] == {"x": "a,b", "y": 2}


def test_to_csv_roundtrip():
    schema = T.Schema([T.Field("c", T.string(32))])
    data = {"c": ["1,x,true", "2,y,false"]}
    st = T.struct(("a", T.INT32), ("b", T.string(4)), ("f", T.BOOL))
    expr = F.to_csv(F.from_csv(E.col("c"), st))
    got = run(expr, data, schema)
    assert got == ["1,x,true", "2,y,false"]


# ---- xpath family (reference: QueryPlanSerde.scala:348) --------------------


XML = "<root><a attr='1'>one</a><a>two</a><b><n>42</n></b></root>"


def test_xpath_array():
    schema = T.Schema([T.Field("x", T.string(64))])
    got = run(F.xpath(E.col("x"), "//a"), {"x": [XML, "<bad", None]}, schema)
    assert got[0] == ["one", "two"]
    assert got[1] is None and got[2] is None


def test_xpath_string_and_attr():
    schema = T.Schema([T.Field("x", T.string(64))])
    got = run(F.xpath_string(E.col("x"), "//b/n"), {"x": [XML]}, schema)
    assert got == ["42"]
    got = run(F.xpath_string(E.col("x"), "//a/@attr"), {"x": [XML]}, schema)
    assert got == ["1"]


def test_xpath_numeric_and_boolean():
    schema = T.Schema([T.Field("x", T.string(64))])
    assert run(F.xpath_long(E.col("x"), "//b/n"), {"x": [XML]}, schema) == [42]
    assert run(F.xpath_double(E.col("x"), "//b/n"), {"x": [XML]}, schema) == [42.0]
    assert run(F.xpath_boolean(E.col("x"), "//b"), {"x": [XML]}, schema) == [True]
    assert run(F.xpath_boolean(E.col("x"), "//zzz"), {"x": [XML]}, schema) == [False]


def test_round3_misc_host_funcs():
    schema = T.Schema([T.Field("s", T.string(32))])
    got = run(F.regexp_instr(E.col("s"), r"\d+"), {"s": ["ab12c", "none"]}, schema)
    assert got == [3, 0]
    got = run(F.schema_of_json(E.col("s")), {"s": ['{"a":1,"b":"x"}']}, schema)
    assert got == ["STRUCT<a: BIGINT, b: STRING>"]
    got = run(F.schema_of_csv(E.col("s")), {"s": ["1,abc,2.5"]}, schema)
    assert got == ["STRUCT<_c0: BIGINT, _c1: STRING, _c2: DOUBLE>"]
    got = run(F.empty2null(E.col("s")), {"s": ["", "x"]}, schema)
    assert got == [None, "x"]


def test_to_char():
    schema = T.Schema([T.Field("v", T.FLOAT64)])
    got = run(F.to_char(E.col("v"), "999,999D99"),
              {"v": np.array([12345.678, -7.1])}, schema)
    assert got == ["12,345.68", "-7.10"]


def test_from_json_columnar_matches_row_path():
    """The pyarrow columnar batch path (PythonUdf.batch_fn) must agree with
    the row-at-a-time fn on clean input — including missing fields, JSON
    nulls, and dead/null rows (reference: json_funcs/from_json.rs batch
    kernel vs scalar semantics)."""
    import json as _json

    n = 500
    docs = []
    for i in range(n):
        if i % 7 == 0:
            docs.append(None)
        elif i % 5 == 0:
            docs.append(_json.dumps({"a": i}))  # missing b, s
        elif i % 3 == 0:
            docs.append(_json.dumps({"a": None, "b": i * 0.5, "s": f"v{i}"}))
        else:
            docs.append(_json.dumps({"a": i, "b": i * 0.5, "s": f"v{i%10}"}))
    schema = T.Schema([T.Field("j", T.string(64))])
    st = T.struct(("a", T.INT64), ("b", T.FLOAT64), ("s", T.string(8)))
    data = {"j": np.array(docs, object)}

    fast = F.from_json(E.col("j"), st)
    slow = F.from_json(E.col("j"), st)
    import dataclasses
    slow = dataclasses.replace(slow, batch_fn=None)  # force the row loop
    got_fast = run(fast, data, schema)
    got_slow = run(slow, data, schema)
    assert got_fast == got_slow
    # spot-check semantics directly
    assert got_fast[0] is None
    assert got_fast[5] == {"a": 5, "b": None, "s": None} or got_fast[5] is None


def test_from_json_columnar_falls_back_on_malformed():
    schema = T.Schema([T.Field("j", T.string(64))])
    st = T.struct(("a", T.INT64),)
    data = {"j": ['{"a": 1}', "{malformed", '{"a": 3}']}
    got = run(F.from_json(E.col("j"), st), data, schema)
    assert got == [{"a": 1}, None, {"a": 3}]
