"""Higher-order array functions: transform/filter/exists/forall/aggregate/
zip_with/array_sort (reference: array_funcs ArrayTransform etc.), evaluated
as the fused lambda body over the flattened element plane."""

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import from_numpy, to_numpy
from datafusion_comet_tpu.exec.evaluator import evaluate
from datafusion_comet_tpu.ir import expr as E

LISTS = [[1, 2, 3], [], [5, None, 7], None, [10]]
SCHEMA = T.Schema([T.Field("xs", T.list_(T.INT64, 4)), T.Field("k", T.INT64)])
DATA = {"xs": LISTS, "k": np.array([100, 200, 300, 400, 500], np.int64)}


def run(expr):
    b = from_numpy(DATA, SCHEMA)
    cv = evaluate(E.bind(expr, SCHEMA), b)
    out = to_numpy(type(b)((cv,), b.row_mask, T.Schema([T.Field("o", cv.dtype)])))
    return [v if ok else None for v, ok in zip(out["o"], out["o__valid"])]


def hof(func, args, params, body):
    return E.HigherOrderFunc(func, tuple(args), tuple(params), body)


def test_transform():
    got = run(hof("transform", (E.col("xs"),), ("x",),
                  E.LambdaVar("x") * E.lit(2, T.INT64)))
    assert got == [[2, 4, 6], [], [10, None, 14], None, [20]]


def test_transform_with_outer_capture():
    got = run(hof("transform", (E.col("xs"),), ("x",),
                  E.LambdaVar("x") + E.col("k")))
    assert got == [[101, 102, 103], [], [305, None, 307], None, [510]]


def test_transform_with_index_param():
    got = run(hof("transform", (E.col("xs"),), ("x", "i"),
                  E.LambdaVar("x") + E.LambdaVar("i").cast(T.INT64)))
    assert got == [[1, 3, 5], [], [5, None, 9], None, [10]]


def test_filter():
    got = run(hof("filter", (E.col("xs"),), ("x",),
                  E.LambdaVar("x") > E.lit(2, T.INT64)))
    assert got == [[3], [], [5, 7], None, [10]]


def test_exists_three_valued():
    got = run(hof("exists", (E.col("xs"),), ("x",),
                  E.LambdaVar("x") > E.lit(6, T.INT64)))
    # [1,2,3] -> false; [] -> false; [5,None,7] -> true; None -> None; [10] -> true
    assert got == [False, False, True, None, True]
    got = run(hof("exists", (E.col("xs"),), ("x",),
                  E.LambdaVar("x") > E.lit(100, T.INT64)))
    # [5,None,7]: no true but a null result -> null (Spark three-valued)
    assert got == [False, False, None, None, False]


def test_forall():
    got = run(hof("forall", (E.col("xs"),), ("x",),
                  E.LambdaVar("x") > E.lit(0, T.INT64)))
    # [5,None,7]: no false but null -> null
    assert got == [True, True, None, None, True]


def test_aggregate():
    got = run(hof("aggregate", (E.col("xs"), E.lit(0, T.INT64)), ("acc", "x"),
                  E.LambdaVar("acc") + E.LambdaVar("x")))
    assert got == [6, 0, None, None, 10]  # null element poisons the sum


def test_zip_with():
    s = T.Schema([T.Field("a", T.list_(T.INT64, 3)), T.Field("b", T.list_(T.INT64, 4))])
    data = {"a": [[1, 2], [1, 2, 3]], "b": [[10, 20, 30], [5]]}
    b = from_numpy(data, s)
    expr = E.bind(hof("zip_with", (E.col("a"), E.col("b")), ("x", "y"),
                      E.LambdaVar("x") + E.LambdaVar("y")), s)
    cv = evaluate(expr, b)
    out = to_numpy(type(b)((cv,), b.row_mask, T.Schema([T.Field("o", cv.dtype)])))
    got = [v if ok else None for v, ok in zip(out["o"], out["o__valid"])]
    # shorter side pads with null -> null elements
    assert got == [[11, 22, None], [6, None, None]]


def test_array_sort_default():
    got = run(hof("array_sort", (E.col("xs"),), (), None))
    assert got == [[1, 2, 3], [], [5, 7, None], None, [10]]


def test_serde_roundtrip():
    from datafusion_comet_tpu.ir.serde import expr_from_dict, expr_to_dict

    e = hof("filter", (E.col("xs"),), ("x",), E.LambdaVar("x") > E.lit(1, T.INT64))
    d = expr_to_dict(e)
    e2 = expr_from_dict(d)
    assert run(e2) == run(e)


class TestMapFunctions:
    """map_concat/map_from_entries + map HOFs (map_funcs analogs)."""

    MS = T.Schema([T.Field("m", T.map_(T.string(4), T.INT64, 3)),
                   T.Field("m2", T.map_(T.string(4), T.INT64, 3))])
    MDATA = {"m": [{"a": 1, "b": 2}, {}, None],
             "m2": [{"b": 20, "c": 30}, {"z": 9}, {"q": 1}]}

    def _run(self, expr):
        b = from_numpy(self.MDATA, self.MS)
        cv = evaluate(E.bind(expr, self.MS), b)
        out = to_numpy(type(b)((cv,), b.row_mask,
                               T.Schema([T.Field("o", cv.dtype)])))
        return [v if ok else None for v, ok in zip(out["o"], out["o__valid"])]

    def test_map_concat_last_win(self):
        got = self._run(E.MapExpr("map_concat", (E.col("m"), E.col("m2"))))
        assert got[0] == {"a": 1, "b": 20, "c": 30}  # m2's b wins
        assert got[1] == {"z": 9}
        assert got[2] is None

    def test_transform_values(self):
        got = self._run(E.HigherOrderFunc(
            "transform_values", (E.col("m"),), ("k", "v"),
            E.LambdaVar("v") * E.lit(10, T.INT64)))
        assert got[0] == {"a": 10, "b": 20}
        assert got[1] == {} and got[2] is None

    def test_map_filter(self):
        got = self._run(E.HigherOrderFunc(
            "map_filter", (E.col("m"),), ("k", "v"),
            E.LambdaVar("v") > E.lit(1, T.INT64)))
        assert got[0] == {"b": 2} and got[1] == {} and got[2] is None

    def test_map_from_entries(self):
        s = T.Schema([T.Field("xs", T.list_(
            T.struct(("key", T.string(4)), ("value", T.INT64)), 3))])
        data = {"xs": [[{"key": "a", "value": 1}, {"key": "a", "value": 5}],
                       []]}
        b = from_numpy(data, s)
        cv = evaluate(E.bind(E.MapExpr("map_from_entries", (E.col("xs"),)), s), b)
        out = to_numpy(type(b)((cv,), b.row_mask, T.Schema([T.Field("o", cv.dtype)])))
        assert out["o"][0] == {"a": 5}  # LAST_WIN dedup
        assert out["o"][1] == {}


class TestRound3ArrayAdditions:
    def _run(self, expr, data, schema):
        b = from_numpy(data, schema)
        cv = evaluate(E.bind(expr, schema), b)
        out = to_numpy(type(b)((cv,), b.row_mask, T.Schema([T.Field("o", cv.dtype)])))
        return [v if ok else None for v, ok in zip(out["o"], out["o__valid"])]

    def test_array_insert(self):
        s = T.Schema([T.Field("xs", T.list_(T.INT64, 3))])
        data = {"xs": [[1, 2, 3], [1], []]}
        got = self._run(E.ArrayExpr("array_insert",
                                    (E.col("xs"), E.lit(2, T.INT32), E.lit(9, T.INT64))),
                        data, s)
        assert got == [[1, 9, 2, 3], [1, 9], [None, 9]]

    def test_arrays_zip(self):
        s = T.Schema([T.Field("a", T.list_(T.INT64, 2)), T.Field("b", T.list_(T.INT64, 3))])
        data = {"a": [[1, 2]], "b": [[10, 20, 30]]}
        got = self._run(E.ArrayExpr("arrays_zip", (E.col("a"), E.col("b"))), data, s)
        assert got == [[{"0": 1, "1": 10}, {"0": 2, "1": 20}, {"0": None, "1": 30}]]

    def test_get_array_struct_field(self):
        s = T.Schema([T.Field("xs", T.list_(
            T.struct(("k", T.string(4)), ("v", T.INT64)), 2))])
        data = {"xs": [[{"k": "a", "v": 1}, {"k": "b", "v": 2}], []]}
        got = self._run(E.ArrayExpr("get_array_struct_field",
                                    (E.col("xs"), E.lit(1, T.INT32))), data, s)
        assert got == [[1, 2], []]

    def test_regexp_extract_all_and_json_keys(self):
        from datafusion_comet_tpu.exec.engine import Session
        from datafusion_comet_tpu.ir import functions as F
        from datafusion_comet_tpu.ir import plan as P

        sch = T.Schema([T.Field("s", T.string(32))])
        sess = Session()
        sess.register_numpy("t", {"s": ["a1b22c333", '{"x":1,"y":2}']}, sch)
        out = sess.collect(P.Scan("t", sch).project(
            [F.regexp_extract_all(E.col("s"), r"(\d+)").alias("m"),
             F.json_object_keys(E.col("s")).alias("k")]))
        assert out["m"][0] == ["1", "22", "333"]
        assert out["k"][1] == ["x", "y"]
        assert not out["k__valid"][0]
