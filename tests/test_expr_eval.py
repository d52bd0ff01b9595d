"""Differential tests for the expression evaluator vs numpy/pandas oracles.

Mirrors the reference's CometExpressionSuite-style differential testing
(CometTestBase.checkSparkAnswer, reference:
spark/src/test/scala/org/apache/spark/sql/CometTestBase.scala:162)."""

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec import batch as B
from datafusion_comet_tpu.exec import evaluator as EV
from datafusion_comet_tpu.ir import expr as E


def make_batch(data, schema, validity=None):
    return B.from_numpy(data, schema, validity=validity)


def ev(expr, batch):
    bound = E.bind(expr, batch.schema)
    return EV.evaluate(bound, batch)


@pytest.fixture
def num_batch(rng):
    schema = T.Schema(
        [
            T.Field("a", T.INT32),
            T.Field("b", T.INT64),
            T.Field("x", T.FLOAT64),
            T.Field("y", T.FLOAT64),
        ]
    )
    n = 1000
    data = {
        "a": rng.integers(-100, 100, n).astype(np.int32),
        "b": rng.integers(-(10**9), 10**9, n).astype(np.int64),
        "x": rng.normal(size=n),
        "y": rng.normal(size=n),
    }
    validity = {"a": rng.random(n) > 0.1, "y": rng.random(n) > 0.2}
    return make_batch(data, schema, validity), data, validity


def compact(cv, batch):
    mask = np.asarray(batch.row_mask)
    return np.asarray(cv.data)[mask], np.asarray(cv.validity)[mask]


class TestArithmetic:
    def test_add_nulls(self, num_batch):
        batch, data, validity = num_batch
        cv = ev(E.col("a") + E.col("b"), batch)
        vals, valid = compact(cv, batch)
        expected = data["a"].astype(np.int64) + data["b"]
        np.testing.assert_array_equal(valid, validity["a"])
        np.testing.assert_array_equal(vals[valid], expected[valid])

    def test_mul_float(self, num_batch):
        batch, data, validity = num_batch
        cv = ev(E.col("x") * E.col("y"), batch)
        vals, valid = compact(cv, batch)
        np.testing.assert_allclose(vals[valid], (data["x"] * data["y"])[valid], rtol=1e-12)

    def test_int_div_yields_double(self, num_batch):
        batch, data, _ = num_batch
        cv = ev(E.col("b") / E.lit(7), batch)
        assert cv.dtype == T.FLOAT64
        vals, valid = compact(cv, batch)
        np.testing.assert_allclose(vals[valid], (data["b"] / 7)[valid], rtol=1e-12)

    def test_mod_truncates_like_java(self):
        schema = T.Schema([T.Field("a", T.INT32)])
        batch = make_batch({"a": np.array([-7, 7, -7, 7], np.int32)}, schema)
        cv = ev(E.col("a") % E.lit(3), batch)
        vals, _ = compact(cv, batch)
        np.testing.assert_array_equal(vals, [-1, 1, -1, 1])


class TestComparisons:
    def test_cmp_nulls(self, num_batch):
        batch, data, validity = num_batch
        cv = ev(E.col("a") > E.lit(0), batch)
        vals, valid = compact(cv, batch)
        np.testing.assert_array_equal(valid, validity["a"])
        np.testing.assert_array_equal(vals[valid], (data["a"] > 0)[valid])

    def test_nan_semantics(self):
        schema = T.Schema([T.Field("x", T.FLOAT64), T.Field("y", T.FLOAT64)])
        nan = float("nan")
        batch = make_batch(
            {"x": np.array([nan, nan, 1.0, 2.0]), "y": np.array([nan, 1.0, nan, 2.0])},
            schema,
        )
        eq, _ = compact(ev(E.col("x") == E.col("y"), batch), batch)
        np.testing.assert_array_equal(eq, [True, False, False, True])
        # NaN is greatest
        gt, _ = compact(ev(E.col("x") > E.col("y"), batch), batch)
        np.testing.assert_array_equal(gt, [False, True, False, False])

    def test_null_safe_eq(self):
        schema = T.Schema([T.Field("a", T.INT32), T.Field("b", T.INT32)])
        batch = make_batch(
            {"a": np.array([1, 1, 0, 0], np.int32), "b": np.array([1, 2, 0, 1], np.int32)},
            schema,
            validity={"a": np.array([True, True, False, False]), "b": np.array([True, True, False, True])},
        )
        cv = ev(E.BinaryOp("eqns", E.col("a"), E.col("b")), batch)
        vals, valid = compact(cv, batch)
        assert valid.all()
        np.testing.assert_array_equal(vals, [True, False, True, False])


class TestLogic:
    def test_kleene_and_or(self):
        schema = T.Schema([T.Field("p", T.BOOL), T.Field("q", T.BOOL)])
        # rows: (T,T) (T,F) (T,N) (F,N) (N,N)
        batch = make_batch(
            {
                "p": np.array([True, True, True, False, False]),
                "q": np.array([True, False, False, False, False]),
            },
            schema,
            validity={
                "p": np.array([True, True, True, True, False]),
                "q": np.array([True, True, False, False, False]),
            },
        )
        a_vals, a_valid = compact(ev(E.col("p") & E.col("q"), batch), batch)
        np.testing.assert_array_equal(a_valid, [True, True, False, True, False])
        np.testing.assert_array_equal(a_vals[a_valid], [True, False, False])
        o_vals, o_valid = compact(ev(E.col("p") | E.col("q"), batch), batch)
        np.testing.assert_array_equal(o_valid, [True, True, True, False, False])
        np.testing.assert_array_equal(o_vals[o_valid], [True, True, True])


class TestDecimal:
    def schema(self):
        return T.Schema([T.Field("p", T.decimal(12, 2)), T.Field("d", T.decimal(12, 2))])

    def test_q1_style_expressions(self):
        # l_extendedprice * (1 - l_discount) * (1 + l_tax) exactness
        price = np.array([100_00, 95000_01, 12345_67], np.int64)  # scale 2
        disc = np.array([5, 10, 0], np.int64)  # 0.05, 0.10, 0.00 at scale 2
        batch = make_batch({"p": price, "d": disc}, self.schema())
        expr = E.col("p") * (E.lit(1) - E.col("d"))
        bound = E.bind(expr, batch.schema)
        # (12,2)*(13,2) -> (26,4)
        assert bound.dtype == T.decimal(26, 4)
        cv = EV.evaluate(bound, batch)
        vals, _ = compact(cv, batch)
        import decimal as pydec

        for i in range(3):
            expected = (
                pydec.Decimal(int(price[i])) / 100 * (1 - pydec.Decimal(int(disc[i])) / 100)
            ) * 10**4
            assert vals[i] == int(expected)

    def test_decimal_div_half_up(self):
        schema = T.Schema([T.Field("a", T.decimal(10, 2)), T.Field("b", T.decimal(10, 2))])
        a = np.array([1000, 100, 999, -1000], np.int64)  # 10.00, 1.00, 9.99, -10.00
        b = np.array([300, 700, 100, 300], np.int64)  # 3.00, 7.00, 1.00, 3.00
        batch = make_batch({"a": a, "b": b}, schema)
        bound = E.bind(E.col("a") / E.col("b"), schema)
        # div scale = max(6, 2+10+1) = 13 -> p = 10-2+2+13=23
        cv = EV.evaluate(bound, batch)
        vals, _ = compact(cv, batch)
        import decimal as pydec

        ctx = pydec.Context(prec=50, rounding=pydec.ROUND_HALF_UP)
        s = bound.dtype.scale
        for i in range(4):
            expected = ctx.divide(pydec.Decimal(int(a[i])), pydec.Decimal(int(b[i])))
            expected = expected.quantize(pydec.Decimal(1).scaleb(-s), rounding=pydec.ROUND_HALF_UP)
            assert vals[i] == int(expected.scaleb(s)), f"row {i}"

    def test_decimal_compare(self):
        schema = T.Schema([T.Field("a", T.decimal(10, 2)), T.Field("b", T.decimal(10, 4))])
        batch = make_batch(
            {"a": np.array([100, 200], np.int64), "b": np.array([10000, 19999], np.int64)},
            schema,
        )
        vals, _ = compact(ev(E.col("a") == E.col("b"), batch), batch)
        np.testing.assert_array_equal(vals, [True, False])
        vals, _ = compact(ev(E.col("a") > E.col("b"), batch), batch)
        np.testing.assert_array_equal(vals, [False, True])


class TestCase:
    def test_case_when(self):
        schema = T.Schema([T.Field("a", T.INT32)])
        batch = make_batch({"a": np.array([1, 5, 10, 20], np.int32)}, schema)
        expr = E.CaseWhen(
            branches=(
                (E.col("a") < E.lit(5), E.lit("small")),
                (E.col("a") < E.lit(15), E.lit("medium")),
            ),
            else_value=E.lit("large"),
        )
        cv = ev(expr, batch)
        out = B.to_numpy(
            B.Batch((cv,), batch.row_mask, T.Schema([T.Field("r", cv.dtype)]))
        )
        assert list(out["r"]) == ["small", "medium", "medium", "large"]


class TestStrings:
    def batch(self):
        schema = T.Schema([T.Field("s", T.string(20))])
        vals = np.array(["hello", "WORLD", " pad  ", "", "ab", None], dtype=object)
        return make_batch({"s": vals}, schema), vals

    def test_upper_length_substr(self):
        batch, vals = self.batch()
        out = B.to_numpy(
            B.Batch(
                (ev(E.StringFunc("upper", (E.col("s"),)), batch),),
                batch.row_mask,
                T.Schema([T.Field("r", T.string(20))]),
            )
        )
        assert list(out["r"])[:5] == ["HELLO", "WORLD", " PAD  ", "", "AB"]
        lens, valid = compact(ev(E.StringFunc("length", (E.col("s"),)), batch), batch)
        np.testing.assert_array_equal(lens[valid], [5, 5, 6, 0, 2])

    def test_substring(self):
        batch, _ = self.batch()
        cv = ev(E.StringFunc("substring", (E.col("s"), E.lit(2), E.lit(3))), batch)
        out = B.to_numpy(B.Batch((cv,), batch.row_mask, T.Schema([T.Field("r", cv.dtype)])))
        assert list(out["r"])[:5] == ["ell", "ORL", "pad", "", "b"]

    def test_like(self):
        batch, _ = self.batch()
        vals, valid = compact(ev(E.col("s").like("%o%"), batch), batch)
        np.testing.assert_array_equal(vals[valid], [True, False, False, False, False])
        vals, _ = compact(ev(E.col("s").like("h%o"), batch), batch)
        np.testing.assert_array_equal(vals[:5], [True, False, False, False, False])
        vals, _ = compact(ev(E.col("s").like("_ORLD"), batch), batch)
        np.testing.assert_array_equal(vals[:5], [False, True, False, False, False])

    def test_string_compare(self):
        schema = T.Schema([T.Field("a", T.string(8)), T.Field("b", T.string(8))])
        batch = make_batch(
            {
                "a": np.array(["abc", "abc", "ab", "b"], dtype=object),
                "b": np.array(["abc", "abd", "abc", "a"], dtype=object),
            },
            schema,
        )
        eq, _ = compact(ev(E.col("a") == E.col("b"), batch), batch)
        np.testing.assert_array_equal(eq, [True, False, False, False])
        lt, _ = compact(ev(E.col("a") < E.col("b"), batch), batch)
        np.testing.assert_array_equal(lt, [False, True, True, False])


class TestTemporal:
    def test_year_month_day(self):
        import datetime

        schema = T.Schema([T.Field("d", T.DATE)])
        dates = [datetime.date(1970, 1, 1), datetime.date(1998, 9, 2), datetime.date(2000, 2, 29), datetime.date(1969, 12, 31)]
        days = np.array([(d - datetime.date(1970, 1, 1)).days for d in dates], np.int32)
        batch = make_batch({"d": days}, schema)
        for func, attr in [("year", "year"), ("month", "month"), ("day", "day")]:
            vals, _ = compact(ev(E.TemporalFunc(func, (E.col("d"),)), batch), batch)
            np.testing.assert_array_equal(vals, [getattr(d, attr) for d in dates])

    def test_cast_string_to_date(self):
        schema = T.Schema([T.Field("s", T.string(12))])
        batch = make_batch({"s": np.array(["1998-09-02", "1970-01-01", "bogus"], dtype=object)}, schema)
        cv = ev(E.col("s").cast(T.DATE), batch)
        vals, valid = compact(cv, batch)
        np.testing.assert_array_equal(valid, [True, True, False])
        assert vals[0] == 10471 and vals[1] == 0


class TestCastRoundtrip:
    def test_int_to_string(self):
        schema = T.Schema([T.Field("a", T.INT64)])
        batch = make_batch({"a": np.array([0, 5, -123, 98765432100], np.int64)}, schema)
        cv = ev(E.col("a").cast(T.string(24)), batch)
        out = B.to_numpy(B.Batch((cv,), batch.row_mask, T.Schema([T.Field("r", cv.dtype)])))
        assert list(out["r"]) == ["0", "5", "-123", "98765432100"]

    def test_decimal_to_string(self):
        schema = T.Schema([T.Field("a", T.decimal(10, 2))])
        batch = make_batch({"a": np.array([12345, -50, 0], np.int64)}, schema)
        cv = ev(E.col("a").cast(T.string(24)), batch)
        out = B.to_numpy(B.Batch((cv,), batch.row_mask, T.Schema([T.Field("r", cv.dtype)])))
        assert list(out["r"]) == ["123.45", "-0.50", "0.00"]

    def test_string_to_int(self):
        schema = T.Schema([T.Field("s", T.string(12))])
        batch = make_batch({"s": np.array(["42", " -7 ", "abc", "1.5"], dtype=object)}, schema)
        cv = ev(E.col("s").cast(T.INT32), batch)
        vals, valid = compact(cv, batch)
        np.testing.assert_array_equal(valid, [True, True, False, False])
        np.testing.assert_array_equal(vals[:2], [42, -7])


class TestHash:
    def test_murmur3_spark_exact(self):
        # Golden values from Spark's Murmur3_x86_32 (seed 42):
        # hashInt(1, 42) = -559580957, hashInt(0, 42) = 933211791
        # hashLong(1L, 42) = -1712319331, hashLong(0L, 42) = -1670924195
        # UTF8String hashUnsafeBytes (seed 42): "abc" -> 1322437556, "" -> 142593372
        # (verified against a pure-python port of Spark's Murmur3_x86_32)
        schema = T.Schema([T.Field("i", T.INT32), T.Field("l", T.INT64), T.Field("s", T.string(8))])
        batch = make_batch(
            {
                "i": np.array([1, 0], np.int32),
                "l": np.array([1, 0], np.int64),
                "s": np.array(["abc", ""], dtype=object),
            },
            schema,
        )
        hi, _ = compact(ev(E.HashFunc("murmur3", (E.col("i"),), seed=42), batch), batch)
        np.testing.assert_array_equal(hi, [-559580957, 933211791])
        hl, _ = compact(ev(E.HashFunc("murmur3", (E.col("l"),), seed=42), batch), batch)
        np.testing.assert_array_equal(hl, [-1712319331, -1670924195])
        hs, _ = compact(ev(E.HashFunc("murmur3", (E.col("s"),), seed=42), batch), batch)
        np.testing.assert_array_equal(hs, [1322437556, 142593372])


class TestInt128:
    def test_mul_divmod(self):
        import jax.numpy as jnp

        from datafusion_comet_tpu.utils import int128

        rng = np.random.default_rng(0)
        a = rng.integers(-(10**17), 10**17, 64)
        b = rng.integers(-(10**17), 10**17, 64)
        hi, lo = int128.mul_i64(jnp.asarray(a), jnp.asarray(b))
        hi, lo = np.asarray(hi), np.asarray(lo)
        for i in range(64):
            expected = int(a[i]) * int(b[i])
            got = (int(hi[i]) << 64) | (int(lo[i]) & ((1 << 64) - 1))
            # interpret as signed 128
            if got >= 1 << 127:
                got -= 1 << 128
            assert got == expected, i

    def test_div_half_up(self):
        import jax.numpy as jnp

        from datafusion_comet_tpu.utils import int128

        # quotients must fit i64 (function contract: result truncated to i64)
        num = np.array([10**20 + 50, -(10**20 + 50), 7, -7], dtype=object)
        den = np.array([100, 100, 2, 2], np.int64)
        hi = np.array([int(n) >> 64 for n in num], np.int64)
        lo = np.array([np.int64(np.uint64(int(n) & ((1 << 64) - 1)).astype(np.int64)) for n in num])
        q = np.asarray(int128.div_i128_i64_half_up((jnp.asarray(hi), jnp.asarray(lo)), jnp.asarray(den)))
        np.testing.assert_array_equal(q, [10**18 + 1, -(10**18 + 1), 4, -4])
