"""Tests for extended expressions: pad/repeat/replace/translate/initcap,
levenshtein, coalesce/nullif, xxhash64 (vs pure-Python XXH64 reference)."""

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import from_numpy, to_numpy
from datafusion_comet_tpu.exec.evaluator import evaluate
from datafusion_comet_tpu.ir import expr as E

M64 = (1 << 64) - 1


def mk_batch(strs, width=12):
    schema = T.Schema([T.Field("s", T.string(width)), T.Field("t", T.string(width))])
    return from_numpy(
        {"s": np.array(strs, object), "t": np.array([x[::-1] for x in strs], object)},
        schema,
    ), schema


def ev(e, batch, schema):
    return evaluate(E.bind(e, schema), batch)


def out_strs(cv, batch):
    mask = np.asarray(batch.row_mask)
    mat = np.asarray(cv.data)[mask]
    lens = np.asarray(cv.lengths)[mask]
    return [bytes(mat[i, : lens[i]]).decode() for i in range(len(mat))]


class TestStringFuncs:
    def test_lpad_rpad(self):
        b, s = mk_batch(["ab", "hello", ""])
        got = out_strs(ev(E.StringFunc("lpad", (E.col("s"), E.lit(4), E.lit("xy"))), b, s), b)
        assert got == ["xyab", "hell", "xyxy"]
        got = out_strs(ev(E.StringFunc("rpad", (E.col("s"), E.lit(4), E.lit("xy"))), b, s), b)
        assert got == ["abxy", "hell", "xyxy"]

    def test_repeat(self):
        b, s = mk_batch(["ab", "c", ""])
        got = out_strs(ev(E.StringFunc("repeat", (E.col("s"), E.lit(3))), b, s), b)
        assert got == ["ababab", "ccc", ""]

    def test_replace_equal_len(self):
        b, s = mk_batch(["banana", "aa", "xyz"])
        got = out_strs(
            ev(E.StringFunc("replace", (E.col("s"), E.lit("an"), E.lit("AN"))), b, s), b
        )
        assert got == ["bANANa", "aa", "xyz"]

    def test_translate(self):
        b, s = mk_batch(["banana", "abc", ""])
        got = out_strs(
            ev(E.StringFunc("translate", (E.col("s"), E.lit("an"), E.lit("AN"))), b, s), b
        )
        assert got == ["bANANA", "Abc", ""]

    def test_initcap(self):
        b, s = mk_batch(["hello world", "a B c", "XY"])
        got = out_strs(ev(E.StringFunc("initcap", (E.col("s"),)), b, s), b)
        assert got == ["Hello World", "A B C", "Xy"]

    def test_levenshtein(self):
        b, s = mk_batch(["kitten", "flaw", "abc"])
        schema = T.Schema([T.Field("a", T.string(8)), T.Field("b", T.string(8))])
        b2 = from_numpy(
            {"a": np.array(["kitten", "flaw", "abc"], object),
             "b": np.array(["sitting", "lawn", "abc"], object)},
            schema,
        )
        cv = evaluate(E.bind(E.StringFunc("levenshtein", (E.col("a"), E.col("b"))), schema), b2)
        got = np.asarray(cv.data)[np.asarray(b2.row_mask)]
        np.testing.assert_array_equal(got, [3, 2, 0])


class TestConditionals:
    def test_coalesce_nullif(self):
        schema = T.Schema([T.Field("a", T.INT64), T.Field("b", T.INT64)])
        b = from_numpy(
            {"a": np.array([1, 0, 3]), "b": np.array([7, 8, 9])},
            schema,
            validity={"a": np.array([True, False, True]), "b": np.ones(3, bool)},
        )
        cv = evaluate(E.bind(E.coalesce(E.col("a"), E.col("b")), schema), b)
        got = np.asarray(cv.data)[:3]
        np.testing.assert_array_equal(got, [1, 8, 3])
        cv2 = evaluate(E.bind(E.nullif(E.col("b"), E.lit(8)), schema), b)
        assert not bool(cv2.validity[1]) and bool(cv2.validity[0])


# ---- pure-python XXH64 (spec implementation) ---------------------------------------

P1, P2, P3, P4, P5 = (
    0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
    0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5,
)


def rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M64


def fmix(h):
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    return h ^ (h >> 32)


def xx_round(acc, inp):
    return (rotl((acc + inp * P2) & M64, 31) * P1) & M64


def xxh64(data: bytes, seed: int) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1, v2, v3, v4 = (
            (seed + P1 + P2) & M64, (seed + P2) & M64, seed & M64, (seed - P1) & M64
        )
        while i + 32 <= n:
            v1 = xx_round(v1, int.from_bytes(data[i : i + 8], "little")); i += 8
            v2 = xx_round(v2, int.from_bytes(data[i : i + 8], "little")); i += 8
            v3 = xx_round(v3, int.from_bytes(data[i : i + 8], "little")); i += 8
            v4 = xx_round(v4, int.from_bytes(data[i : i + 8], "little")); i += 8
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ xx_round(0, v)) * P1 + P4) & M64
    else:
        h = (seed + P5) & M64
    h = (h + n) & M64
    while i + 8 <= n:
        k1 = xx_round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (rotl(h ^ k1, 27) * P1 + P4) & M64
        i += 8
    if i + 4 <= n:
        h = (rotl(h ^ ((int.from_bytes(data[i : i + 4], "little") * P1) & M64), 23) * P2 + P3) & M64
        i += 4
    while i < n:
        h = (rotl(h ^ ((data[i] * P5) & M64), 11) * P1) & M64
        i += 1
    return fmix(h)


def _signed(x):
    return x - (1 << 64) if x >= (1 << 63) else x


class TestXxhash64:
    def test_bytes_vs_reference(self):
        strs = ["", "a", "abcd", "abcdefgh", "hello world!", "x" * 33, "y" * 40]
        schema = T.Schema([T.Field("s", T.string(48))])
        b = from_numpy({"s": np.array(strs, object)}, schema)
        cv = evaluate(E.bind(E.HashFunc("xxhash64", (E.col("s"),), seed=42), schema), b)
        got = np.asarray(cv.data)[: len(strs)]
        exp = [_signed(xxh64(s.encode(), 42)) for s in strs]
        np.testing.assert_array_equal(got, exp)

    def test_long_vs_spark_shape(self):
        # hashLong: h = seed+P5+8; h ^= rotl(v*P2,31)*P1; h = rotl(h,27)*P1+P4
        schema = T.Schema([T.Field("v", T.INT64)])
        vals = np.array([0, 1, -1, 123456789012345], np.int64)
        b = from_numpy({"v": vals}, schema)
        cv = evaluate(E.bind(E.HashFunc("xxhash64", (E.col("v"),), seed=42), schema), b)
        got = np.asarray(cv.data)[:4]

        def ref_long(v):
            u = v & M64
            h = (42 + P5 + 8) & M64
            h ^= (rotl((u * P2) & M64, 31) * P1) & M64
            h = (rotl(h, 27) * P1 + P4) & M64
            return _signed(fmix(h))

        np.testing.assert_array_equal(got, [ref_long(int(v)) for v in vals])


class TestWidthBucket:
    """Spark WidthBucket.computeBucketNumber oracle (reference maps the
    expression to datafusion-spark SparkWidthBucket; serde
    QueryPlanSerde.scala:173)."""

    @staticmethod
    def _oracle(v, lo, hi, n):
        import math as m

        if (n <= 0 or n == (1 << 63) - 1 or m.isnan(v) or lo == hi
                or m.isnan(lo) or m.isinf(lo) or m.isnan(hi) or m.isinf(hi)):
            return None
        lower, upper = min(lo, hi), max(lo, hi)
        if lo < hi:
            if v < lower:
                return 0
            if v >= upper:
                return n + 1
            return int(n * (v - lower) / (upper - lower)) + 1
        if v > upper:
            return 0
        if v <= lower:
            return n + 1
        return int(n * (upper - v) / (upper - lower)) + 1

    def test_matches_oracle(self):
        schema = T.Schema([
            T.Field("v", T.FLOAT64), T.Field("lo", T.FLOAT64),
            T.Field("hi", T.FLOAT64), T.Field("n", T.INT64),
        ])
        cases = [
            (5.3, 0.2, 10.6, 5), (-2.1, 1.3, 3.4, 3), (8.1, 0.0, 5.7, 4),
            (-0.9, 5.2, 0.5, 2), (3.0, 5.0, 1.0, 4),  # descending range
            (1.0, 1.0, 1.0, 2),                        # min == max -> null
            (2.0, 0.0, 4.0, 0),                        # n <= 0 -> null
            (float("nan"), 0.0, 1.0, 3),               # NaN value -> null
            (0.5, float("inf"), 1.0, 3),               # inf bound -> null
            (10.6, 0.2, 10.6, 5),                      # v == upper -> n+1
            (0.2, 0.2, 10.6, 5),                       # v == lower -> 1
        ]
        b = from_numpy(
            {
                "v": np.array([c[0] for c in cases]),
                "lo": np.array([c[1] for c in cases]),
                "hi": np.array([c[2] for c in cases]),
                "n": np.array([c[3] for c in cases], np.int64),
            },
            schema,
        )
        e = E.bind(E.MathFunc("width_bucket",
                              (E.col("v"), E.col("lo"), E.col("hi"), E.col("n"))), schema)
        assert e.dtype == T.INT64
        cv = evaluate(e, b)
        got_v = np.asarray(cv.data)[: len(cases)]
        got_ok = np.asarray(cv.validity)[: len(cases)]
        for i, c in enumerate(cases):
            exp = self._oracle(*c)
            if exp is None:
                assert not got_ok[i], (i, c)
            else:
                assert got_ok[i] and got_v[i] == exp, (i, c, got_v[i], exp)
