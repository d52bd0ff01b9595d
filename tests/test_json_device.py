"""Device JSON-path kernel (exec/json_path.py — the json_funcs/ analog).

Differential oracle: Python json + path walk with Spark get_json_object
semantics. Object/array results compare on compact source documents (the
device kernel returns the source span; docs/compatibility.md notes the
whitespace deviation vs Spark's re-serialization)."""

import json
import re

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.conf import CONF
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.exec.json_path import parse_path
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import functions as F
from datafusion_comet_tpu.ir import plan as P
from datafusion_comet_tpu.ir.serde import plan_to_json

DOCS = [
    '{"a":1,"b":"xy","c":{"d":[10,20,{"e":"deep"}]}}',
    '{"a":null,"b":true,"neg":-3.5}',
    '{"arr":[1,2,3],"empty":[],"obj":{}}',
    '{"a":"a","a2":5}',                      # value text equals a key name
    '{"s":"he said \\"hi\\""}',              # escaped quotes inside a value
    '{"miss":0}',
    None,
    '[5,6,[7,8]]',
    '{ "a" : 42 , "b" : [ 1 , 2 ] }',        # spaced-out document
    '{"a":{"a":{"a":"bottom"}}}',
    '{"long":"' + "x" * 40 + '"}',
]
PATHS = [
    "$.a", "$.b", "$.c.d[1]", "$.c.d[2].e", "$.arr", "$.arr[2]", "$.empty[0]",
    "$.obj", "$.a2", "$.s", "$[0]", "$[2]", "$[2][1]", "$.a.a.a", "$.long",
    "$.neg", "$.nosuch", "$['a']",
]
W = 72
SCHEMA = T.Schema([T.Field("j", T.string(W), True)])


def oracle(doc, path):
    if doc is None:
        return None
    try:
        v = json.loads(doc)
    except Exception:
        return None
    for k, i, qk in re.findall(r"\.(\w+)|\[(\d+)\]|\['([^']*)'\]", path):
        key = k or qk
        try:
            v = v[key] if key else v[int(i)]
        except Exception:
            return None
    if v is None:
        return None
    if isinstance(v, (dict, list)):
        return json.dumps(v, separators=(",", ":"))
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v == int(v):
        return json.dumps(v)  # keep source formatting (e.g. -3.5 stays)
    return str(v)


@pytest.fixture(scope="module")
def sess():
    s = Session()
    s.register_numpy("t", {"j": np.array(DOCS, object)}, SCHEMA)
    return s


def test_paths_parse():
    assert parse_path("$.a.b[3]['x-y']") == ["a", "b", 3, "x-y"]
    assert parse_path("$[0][1]") == [0, 1]
    assert parse_path("$.*") is None          # wildcard -> host bridge
    assert parse_path("$..a") is None         # recursive descent -> host
    assert parse_path("a.b") is None


def test_device_lowering(sess):
    plan = P.Scan("t", SCHEMA).project(
        [F.get_json_object(E.col("j"), "$.a").alias("a")])
    txt = plan_to_json(P.bind_plan(plan))
    assert "get_json_object" in txt and "PythonUdf" not in txt


def test_gate_falls_back_to_host_bridge(sess):
    CONF.set("comet.expr.json.deviceEnabled", False)
    try:
        e = F.get_json_object(E.col("j"), "$.a")
        assert isinstance(e, E.PythonUdf)
    finally:
        CONF.set("comet.expr.json.deviceEnabled", True)
    assert isinstance(F.get_json_object(E.col("j"), "$.a"), E.StringFunc)
    # unsupported path always takes the host bridge
    assert isinstance(F.get_json_object(E.col("j"), "$.*"), E.PythonUdf)


def test_differential_all_paths(sess):
    plan = P.Scan("t", SCHEMA).project(
        [F.get_json_object(E.col("j"), p).alias(f"p{i}")
         for i, p in enumerate(PATHS)])
    out = sess.collect(plan)
    for i, p in enumerate(PATHS):
        for r, doc in enumerate(DOCS):
            exp = oracle(doc, p)
            got = out[f"p{i}"][r] if out[f"p{i}__valid"][r] else None
            if (got is not None and exp is not None and got != exp
                    and got[:1] in "{["):
                # documented deviation: the device kernel returns the source
                # span for objects/arrays; Spark re-serializes compactly.
                # equal modulo inter-token whitespace for this corpus.
                got = got.replace(" ", "")
            assert got == exp, (p, doc, got, exp)
