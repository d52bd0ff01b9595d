"""Nested types (LIST/STRUCT/MAP): differential tests vs Python oracles.

Mirrors the reference's CometArrayExpressionSuite / CometMapExpressionSuite
pattern (spark/src/test/scala/org/apache/comet/CometArrayExpressionSuite):
build small batches with edge values (nulls, empties, NaN, duplicates) and
check Spark-semantics results computed by a plain-Python oracle.
"""

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import from_numpy, to_numpy
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P


def make_session(name, data, schema):
    s = Session()
    s.register_numpy(name, data, schema)
    return s


LISTS = [[1, 2, 2, 3], [], None, [5], [None, 4, None], [7, 7, 7, 7, 7]]
SCHEMA = T.Schema([
    T.Field("id", T.INT32),
    T.Field("xs", T.list_(T.INT32, 8)),
])
DATA = {"id": np.arange(len(LISTS), dtype=np.int32), "xs": LISTS}


def run_expr(expr, data=DATA, schema=SCHEMA, name="out"):
    s = make_session("t", data, schema)
    out = s.collect(P.Scan("t", schema).project([expr.alias(name)]))
    vals = out[name]
    valid = out[name + "__valid"]
    return [v if ok else None for v, ok in zip(vals, valid)]


def as_py(vals):
    return [None if v is None else (v.item() if hasattr(v, "item") else v) for v in vals]


class TestListBasics:
    def test_roundtrip(self):
        b = from_numpy(DATA, SCHEMA)
        out = to_numpy(b)
        assert list(out["xs"]) == [x if x is not None else None for x in LISTS]

    def test_size(self):
        got = as_py(run_expr(E.ArrayExpr("size", (E.col("xs"),))))
        assert got == [4, 0, None, 1, 3, 5]

    def test_array_contains(self):
        got = as_py(run_expr(E.ArrayExpr("array_contains", (E.col("xs"), E.lit(4)))))
        # [1,2,2,3]: no 4, no null → False; []: False; None: None; [5]: False;
        # [None,4,None]: True; [7...]: False
        assert got == [False, False, None, False, True, False]
        got2 = as_py(run_expr(E.ArrayExpr("array_contains", (E.col("xs"), E.lit(9)))))
        # [None,4,None] has null and no match → null
        assert got2 == [False, False, None, False, None, False]

    def test_array_position(self):
        got = as_py(run_expr(E.ArrayExpr("array_position", (E.col("xs"), E.lit(2)))))
        assert got == [2, 0, None, 0, 0, 0]

    def test_element_at(self):
        got = as_py(run_expr(E.ArrayExpr("element_at", (E.col("xs"), E.lit(2)))))
        assert got == [2, None, None, None, 4, 7]
        got_neg = as_py(run_expr(E.ArrayExpr("element_at", (E.col("xs"), E.lit(-1)))))
        assert got_neg == [3, None, None, 5, None, 7]

    def test_get_array_item(self):
        got = as_py(run_expr(E.ArrayExpr("get_array_item", (E.col("xs"), E.lit(0)))))
        assert got == [1, None, None, 5, None, 7]

    def test_min_max(self):
        mn = as_py(run_expr(E.ArrayExpr("array_min", (E.col("xs"),))))
        mx = as_py(run_expr(E.ArrayExpr("array_max", (E.col("xs"),))))
        assert mn == [1, None, None, 5, 4, 7]
        assert mx == [3, None, None, 5, 4, 7]

    def test_sort_array(self):
        got = run_expr(E.ArrayExpr("sort_array", (E.col("xs"),)))
        assert got == [[1, 2, 2, 3], [], None, [5], [None, 4, None][::-1][1:] + [4] if False else [None, None, 4], [7] * 5]
        desc = run_expr(E.ArrayExpr("sort_array", (E.col("xs"), E.lit(False))))
        assert desc == [[3, 2, 2, 1], [], None, [5], [4, None, None], [7] * 5]

    def test_array_distinct(self):
        got = run_expr(E.ArrayExpr("array_distinct", (E.col("xs"),)))
        assert got == [[1, 2, 3], [], None, [5], [None, 4], [7]]

    def test_array_remove(self):
        got = run_expr(E.ArrayExpr("array_remove", (E.col("xs"), E.lit(2))))
        assert got == [[1, 3], [], None, [5], [None, 4, None], [7] * 5]

    def test_array_compact(self):
        got = run_expr(E.ArrayExpr("array_compact", (E.col("xs"),)))
        assert got == [[1, 2, 2, 3], [], None, [5], [4], [7] * 5]

    def test_array_reverse(self):
        got = run_expr(E.ArrayExpr("array_reverse", (E.col("xs"),)))
        assert got == [[3, 2, 2, 1], [], None, [5], [None, 4, None], [7] * 5]

    def test_append_prepend(self):
        got = run_expr(E.ArrayExpr("array_append", (E.col("xs"), E.lit(9))))
        assert got == [[1, 2, 2, 3, 9], [9], None, [5, 9], [None, 4, None, 9], [7] * 5 + [9]]
        got = run_expr(E.ArrayExpr("array_prepend", (E.col("xs"), E.lit(9))))
        assert got == [[9, 1, 2, 2, 3], [9], None, [9, 5], [9, None, 4, None], [9] + [7] * 5]

    def test_array_repeat(self):
        got = run_expr(E.ArrayExpr("array_repeat", (E.col("id"), E.lit(3))))
        assert got == [[i] * 3 for i in range(6)]

    def test_make_array(self):
        got = run_expr(E.ArrayExpr("array", (E.col("id"), E.lit(100), E.col("id") + 1)))
        assert got == [[i, 100, i + 1] for i in range(6)]

    def test_slice(self):
        got = run_expr(E.ArrayExpr("slice", (E.col("xs"), E.lit(2), E.lit(2))))
        assert got == [[2, 2], [], None, [], [4, None], [7, 7]]

    def test_arrays_overlap(self):
        other = E.ArrayExpr("array", (E.lit(3), E.lit(9)))
        got = as_py(run_expr(E.ArrayExpr("arrays_overlap", (E.col("xs"), other))))
        # [1,2,2,3]∩{3,9} → True; [] → False; None; [5] → False;
        # [None,4,None]: no match but has null → None; [7]*5 → False
        assert got == [True, False, None, False, None, False]


class TestSetOps:
    def test_union(self):
        other = E.ArrayExpr("array", (E.lit(2), E.lit(9)))
        got = run_expr(E.ArrayExpr("array_union", (E.col("xs"), other)))
        assert got == [[1, 2, 3, 9], [2, 9], None, [5, 2, 9], [None, 4, 2, 9], [7, 2, 9]]

    def test_intersect(self):
        other = E.ArrayExpr("array", (E.lit(2), E.lit(7), E.lit(7)))
        got = run_expr(E.ArrayExpr("array_intersect", (E.col("xs"), other)))
        assert got == [[2], [], None, [], [], [7]]

    def test_except(self):
        other = E.ArrayExpr("array", (E.lit(2), E.lit(7)))
        got = run_expr(E.ArrayExpr("array_except", (E.col("xs"), other)))
        assert got == [[1, 3], [], None, [5], [None, 4], []]


class TestStringArrays:
    SCHEMA = T.Schema([
        T.Field("ss", T.list_(T.string(8), 4)),
    ])
    DATA = {"ss": [["a", "bb", "a"], [], ["x", None, "yy"], None]}

    def test_contains(self):
        got = as_py(run_expr(
            E.ArrayExpr("array_contains", (E.col("ss"), E.lit("a"))),
            self.DATA, self.SCHEMA,
        ))
        assert got == [True, False, None, None]

    def test_join(self):
        got = as_py(run_expr(
            E.ArrayExpr("array_join", (E.col("ss"), E.lit(","))),
            self.DATA, self.SCHEMA,
        ))
        assert got == ["a,bb,a", "", "x,yy", None]

    def test_join_null_replacement(self):
        got = as_py(run_expr(
            E.ArrayExpr("array_join", (E.col("ss"), E.lit("-"), E.lit("NULL"))),
            self.DATA, self.SCHEMA,
        ))
        assert got == ["a-bb-a", "", "x-NULL-yy", None]

    def test_distinct_strings(self):
        got = run_expr(E.ArrayExpr("array_distinct", (E.col("ss"),)), self.DATA, self.SCHEMA)
        assert got == [["a", "bb"], [], ["x", None, "yy"], None]


class TestFloatArrays:
    SCHEMA = T.Schema([T.Field("fs", T.list_(T.FLOAT64, 4))])
    DATA = {"fs": [[2.0, float("nan"), -0.0, 1.5], [float("nan"), float("nan")]]}

    def test_nan_contains(self):
        got = as_py(run_expr(
            E.ArrayExpr("array_contains", (E.col("fs"), E.lit(float("nan")))),
            self.DATA, self.SCHEMA,
        ))
        assert got == [True, True]  # ordering equality: NaN == NaN

    def test_sort_nan_greatest(self):
        got = run_expr(E.ArrayExpr("sort_array", (E.col("fs"),)), self.DATA, self.SCHEMA)
        assert got[0][:3] == [-0.0, 1.5, 2.0] and np.isnan(got[0][3])

    def test_min_skips_nan_rule(self):
        mn = run_expr(E.ArrayExpr("array_min", (E.col("fs"),)), self.DATA, self.SCHEMA)
        mx = run_expr(E.ArrayExpr("array_max", (E.col("fs"),)), self.DATA, self.SCHEMA)
        assert mn[0] == -0.0 and np.isnan(mx[0])  # NaN greatest
        assert np.isnan(mn[1]) and np.isnan(mx[1])


class TestStruct:
    def test_make_and_get(self):
        st = E.StructExpr((E.col("id"), E.col("id") + 10), ("a", "b"))
        got = run_expr(E.GetStructField(st, "b"))
        assert as_py(got) == [i + 10 for i in range(6)]

    def test_struct_roundtrip(self):
        schema = T.Schema([
            T.Field("s", T.struct(("x", T.INT32), ("y", T.string(4)))),
        ])
        data = {"s": [{"x": 1, "y": "ab"}, None, {"x": 3, "y": None}]}
        b = from_numpy(data, schema)
        out = to_numpy(b)
        assert list(out["s"]) == [{"x": 1, "y": "ab"}, None, {"x": 3, "y": None}]

    def test_nested_list_of_struct(self):
        schema = T.Schema([
            T.Field("ls", T.list_(T.struct(("k", T.INT32)), 3)),
        ])
        data = {"ls": [[{"k": 1}, {"k": 2}], [], None]}
        out = to_numpy(from_numpy(data, schema))
        assert list(out["ls"]) == [[{"k": 1}, {"k": 2}], [], None]


class TestMap:
    MSCHEMA = T.Schema([
        T.Field("id", T.INT32),
        T.Field("m", T.map_(T.string(4), T.INT32, 4)),
    ])
    MDATA = {
        "id": np.arange(3, dtype=np.int32),
        "m": [{"a": 1, "b": 2}, {}, None],
    }

    def test_roundtrip(self):
        out = to_numpy(from_numpy(self.MDATA, self.MSCHEMA))
        assert list(out["m"]) == [{"a": 1, "b": 2}, {}, None]

    def test_keys_values_size(self):
        keys = run_expr(E.MapExpr("map_keys", (E.col("m"),)), self.MDATA, self.MSCHEMA)
        assert keys == [["a", "b"], [], None]
        vals = run_expr(E.MapExpr("map_values", (E.col("m"),)), self.MDATA, self.MSCHEMA)
        assert vals == [[1, 2], [], None]
        sz = as_py(run_expr(E.MapExpr("size", (E.col("m"),)), self.MDATA, self.MSCHEMA))
        assert sz == [2, 0, None]

    def test_element_at(self):
        got = as_py(run_expr(
            E.MapExpr("element_at", (E.col("m"), E.lit("b"))), self.MDATA, self.MSCHEMA
        ))
        assert got == [2, None, None]

    def test_contains(self):
        got = as_py(run_expr(
            E.MapExpr("map_contains_key", (E.col("m"), E.lit("a"))), self.MDATA, self.MSCHEMA
        ))
        assert got == [True, False, None]

    def test_make_map_dedup_keep_last(self):
        m = E.MapExpr("map", (E.lit("k"), E.col("id"), E.lit("k"), E.col("id") + 1))
        got = run_expr(E.MapExpr("element_at", (m, E.lit("k"))), self.MDATA, self.MSCHEMA)
        assert as_py(got) == [1, 2, 3]  # LAST_WIN

    def test_map_from_arrays(self):
        ks = E.ArrayExpr("array", (E.lit(1), E.lit(2)))
        vs = E.ArrayExpr("array", (E.col("id"), E.col("id") + 5))
        m = E.MapExpr("map_from_arrays", (ks, vs))
        got = as_py(run_expr(E.MapExpr("element_at", (m, E.lit(2))), self.MDATA, self.MSCHEMA))
        assert got == [5, 6, 7]


class TestExplode:
    def test_explode(self):
        s = make_session("t", DATA, SCHEMA)
        plan = P.Explode(P.Scan("t", SCHEMA), E.col("xs"))
        out = s.collect(plan)
        rows = [
            (i, v if ok else None)
            for i, v, ok in zip(out["id"], out["col"], out["col__valid"])
        ]
        expect = []
        for i, xs in enumerate(LISTS):
            for v in (xs or []):
                expect.append((i, v))
        assert rows == expect

    def test_posexplode_outer(self):
        s = make_session("t", DATA, SCHEMA)
        plan = P.Explode(P.Scan("t", SCHEMA), E.col("xs"), outer=True, pos=True)
        out = s.collect(plan)
        rows = list(zip(
            out["id"],
            [p if ok else None for p, ok in zip(out["pos"], out["pos__valid"])],
            [v if ok else None for v, ok in zip(out["col"], out["col__valid"])],
        ))
        expect = []
        for i, xs in enumerate(LISTS):
            if not xs:  # None or empty → one null row
                expect.append((i, None, None))
            else:
                for p, v in enumerate(xs):
                    expect.append((i, p, v))
        assert rows == expect

    def test_explode_map(self):
        s = make_session("t", TestMap.MDATA, TestMap.MSCHEMA)
        plan = P.Explode(P.Scan("t", TestMap.MSCHEMA), E.col("m"))
        out = s.collect(plan)
        rows = list(zip(out["id"], out["key"], out["value"]))
        assert rows == [(0, "a", 1), (0, "b", 2)]

    def test_flatten(self):
        schema = T.Schema([T.Field("ll", T.list_(T.list_(T.INT32, 3), 2))])
        data = {"ll": [[[1, 2], [3]], [[], [4]], None, [None, [5]]]}
        got = run_expr(E.ArrayExpr("flatten", (E.col("ll"),)), data, schema)
        assert got == [[1, 2, 3], [4], None, None]
