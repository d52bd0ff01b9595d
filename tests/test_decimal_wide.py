"""Wide decimal (precision > 18, two-limb i128 storage) differential tests.

Oracle: Python ints / fractions (exact). Mirrors the reference's decimal
coverage in spark-expr (agg_funcs sum/avg decimal with i256 state,
wide_decimal_binary_expr.rs, cast.rs decimal matrix) and
CometCastSuite/CometAggregateSuite decimal cases.

Also pins the NARROW fast path property: decimal columns whose tracked
magnitude bound fits int64 must stay 1-D int64 through arithmetic and
aggregation (the TPU-side perf contract — sorts/joins/aggs ride one limb).
"""

from fractions import Fraction

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec import batch as B
from datafusion_comet_tpu.exec import evaluator as EV
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P

WIDE = T.decimal(30, 4)

XS = [10**25 + 12345, -(10**24), 70000, -99999999999999999999999999, 0, 31415926535897932384]
YS = [30000, 10**20, -50000, 123456789, 10000, -27182818284590452353]


def half_up(fr: Fraction) -> int:
    n, d = fr.numerator, fr.denominator
    q, r = divmod(abs(n), d)
    q += 1 if 2 * r >= d else 0
    return -q if n < 0 else q


def wide_batch(xs=XS, ys=YS, dtype=WIDE, validity=None):
    schema = T.Schema([T.Field("x", dtype), T.Field("y", dtype)])
    data = {"x": np.array(xs, object), "y": np.array(ys, object)}
    return B.from_numpy(data, schema, validity=validity), schema


def run_expr(expr, batch, schema):
    bound = E.bind(expr, schema)
    cv = EV.evaluate(bound, batch)
    d = np.asarray(cv.data)
    v = np.asarray(cv.validity)
    mask = np.asarray(batch.row_mask)
    vals = []
    for i in range(len(d)):
        if not mask[i]:
            continue
        if not v[i]:
            vals.append(None)
            continue
        if d.ndim == 2 and cv.dtype.is_decimal:
            m64 = (1 << 64) - 1
            u = ((int(d[i, 0]) & m64) << 64) | (int(d[i, 1]) & m64)
            vals.append(u - (1 << 128) if u >= (1 << 127) else u)
        elif cv.lengths is not None:
            lens = np.asarray(cv.lengths)
            vals.append(bytes(d[i, : lens[i]]).decode())
        else:
            vals.append(int(d[i]) if not cv.dtype.is_floating else float(d[i]))
    return bound.dtype, vals


class TestStaging:
    def test_roundtrip_wide_values(self):
        batch, schema = wide_batch()
        out = B.to_numpy(batch)
        assert list(out["x"]) == XS
        assert list(out["y"]) == YS
        assert batch.column("x").is_wide_storage

    def test_small_values_stage_narrow(self):
        batch, _ = wide_batch(xs=[1, 2, 3], ys=[4, 5, 6])
        assert not batch.column("x").is_wide_storage
        assert batch.column("x").data.ndim == 1
        assert batch.column("x").mag_bound is not None
        out = B.to_numpy(batch)
        assert list(out["x"]) == [1, 2, 3]

    def test_nulls(self):
        v = np.array([True, False, True])
        batch, _ = wide_batch(xs=[10**20, None, 3], ys=[1, 2, 3], validity={"x": v})
        out = B.to_numpy(batch)
        np.testing.assert_array_equal(out["x__valid"], v)


class TestArith:
    def test_add_sub(self):
        batch, schema = wide_batch()
        dt, got = run_expr(E.col("x") + E.col("y"), batch, schema)
        assert got == [x + y for x, y in zip(XS, YS)]
        dt, got = run_expr(E.col("x") - E.col("y"), batch, schema)
        assert got == [x - y for x, y in zip(XS, YS)]

    def test_mul_half_up_and_overflow_null(self):
        batch, schema = wide_batch()
        dt, got = run_expr(E.col("x") * E.col("y"), batch, schema)
        k = 4 + 4 - dt.scale
        exp = []
        for x, y in zip(XS, YS):
            v = half_up(Fraction(x * y, 10**k))
            exp.append(v if abs(v) < 10**dt.precision else None)
        # wide×wide beyond-i128 rows fall back to f64 (~16 sig digits): both
        # test columns keep one side ≤ i64 or overflow, so exact here
        assert got == exp

    def test_div_half_up(self):
        batch, schema = wide_batch()
        dt, got = run_expr(E.col("x") / E.col("y"), batch, schema)
        exp = []
        for x, y in zip(XS, YS):
            if y == 0:
                exp.append(None)
                continue
            v = half_up(Fraction(x, y) * 10**dt.scale)
            exp.append(v if abs(v) < 10**dt.precision else None)
        assert got == exp

    def test_div_by_zero_null(self):
        batch, schema = wide_batch(xs=[10**20, 10**20], ys=[0, 10000])
        dt, got = run_expr(E.col("x") / E.col("y"), batch, schema)
        assert got[0] is None and got[1] is not None

    def test_mod(self):
        xs = [10**22 + 7, -(10**22 + 7), 10**22 + 7]
        ys = [10**9 + 7, 10**9 + 7, -(10**9 + 7)]
        batch, schema = wide_batch(xs=xs, ys=ys)
        dt, got = run_expr(E.BinaryOp("mod", E.col("x"), E.col("y")), batch, schema)
        exp = [int(np.sign(x)) * (abs(x) % abs(y)) for x, y in zip(xs, ys)]
        assert got == exp

    def test_negate_abs(self):
        batch, schema = wide_batch()
        _, got = run_expr(E.UnaryOp("negate", E.col("x")), batch, schema)
        assert got == [-x for x in XS]
        _, got = run_expr(E.UnaryOp("abs", E.col("x")), batch, schema)
        assert got == [abs(x) for x in XS]


class TestCompare:
    def test_ops(self):
        batch, schema = wide_batch()
        for op, fn in [
            ("eq", lambda a, b: a == b),
            ("lt", lambda a, b: a < b),
            ("gt", lambda a, b: a > b),
            ("le", lambda a, b: a <= b),
        ]:
            bound = E.bind(E.BinaryOp(op, E.col("x"), E.col("y")), schema)
            cv = EV.evaluate(bound, batch)
            got = [bool(v) for v in np.asarray(cv.data)[: len(XS)]]
            assert got == [fn(x, y) for x, y in zip(XS, YS)], op

    def test_mixed_storage_compare(self):
        # x wide two-limb vs y narrow-stored wide-typed
        batch, schema = wide_batch(ys=[1, 2, 3, 4, 5, 6])
        assert batch.column("x").is_wide_storage
        assert not batch.column("y").is_wide_storage
        bound = E.bind(E.BinaryOp("gt", E.col("x"), E.col("y")), schema)
        cv = EV.evaluate(bound, batch)
        got = [bool(v) for v in np.asarray(cv.data)[: len(XS)]]
        assert got == [x > y for x, y in zip(XS, [1, 2, 3, 4, 5, 6])]


class TestCast:
    def test_wide_to_narrow_decimal(self):
        batch, schema = wide_batch()
        dt, got = run_expr(E.Cast(E.col("x"), T.decimal(18, 2)), batch, schema)
        exp = []
        for x in XS:
            v = half_up(Fraction(x, 100))
            exp.append(v if abs(v) < 10**18 else None)
        assert got == exp

    def test_narrow_to_wide_decimal(self):
        schema = T.Schema([T.Field("a", T.decimal(10, 2))])
        batch = B.from_numpy({"a": np.array([12345, -999], np.int64)}, schema)
        dt, got = run_expr(E.Cast(E.col("a"), T.decimal(30, 6)), batch, schema)
        assert got == [12345 * 10**4, -999 * 10**4]

    def test_wide_to_float(self):
        batch, schema = wide_batch()
        dt, got = run_expr(E.Cast(E.col("x"), T.FLOAT64), batch, schema)
        for g, x in zip(got, XS):
            assert g == pytest.approx(x / 10**4, rel=1e-14)

    def test_wide_to_int_trunc(self):
        batch, schema = wide_batch(
            xs=[123456789012345678901234, -98765432101234, 99990000], ys=[1, 2, 3]
        )
        dt, got = run_expr(E.Cast(E.col("x"), T.INT64), batch, schema)
        assert got[0] is None  # does not fit int64
        assert got[1] == -9876543210
        assert got[2] == 9999

    def test_int_to_wide(self):
        schema = T.Schema([T.Field("a", T.INT64)])
        batch = B.from_numpy({"a": np.array([2**62, -7], np.int64)}, schema)
        dt, got = run_expr(E.Cast(E.col("a"), T.decimal(38, 10)), batch, schema)
        assert got == [2**62 * 10**10, -7 * 10**10]

    def test_wide_to_string(self):
        batch, schema = wide_batch()
        import decimal as pydec

        dt, got = run_expr(E.Cast(E.col("x"), T.string(64)), batch, schema)
        assert got == [str(pydec.Decimal(x).scaleb(-4)) for x in XS]


class TestAggregation:
    def _agg(self, xs, groups, func, dtype=WIDE, out="r"):
        schema = T.Schema([T.Field("g", T.INT32), T.Field("x", dtype)])
        s = Session()
        s.register_numpy(
            "t",
            {"g": np.array(groups, np.int32), "x": np.array(xs, object)},
            schema,
        )
        plan = P.Scan("t", schema).aggregate(
            [E.col("g")], [E.AggExpr(func, E.col("x"), out)]
        )
        res = s.collect(plan)
        return {
            int(g): (r if ok else None)
            for g, r, ok in zip(res["g"], res[out], res[out + "__valid"])
        }

    def test_sum_exceeds_i64(self):
        # per-group sums overflow int64: forces the 4-lane i128 path
        xs = [(1 << 61) + i for i in range(8)]
        gs = [0, 0, 0, 0, 1, 1, 1, 1]
        got = self._agg(xs, gs, E.AggFunc.SUM)
        assert got[0] == sum(xs[:4])
        assert got[1] == sum(xs[4:])

    def test_sum_wide_inputs(self):
        xs = [10**24, 2 * 10**24, -(10**23), 5]
        gs = [0, 0, 1, 1]
        got = self._agg(xs, gs, E.AggFunc.SUM)
        assert got[0] == 3 * 10**24
        assert got[1] == -(10**23) + 5

    def test_avg_wide(self):
        xs = [10**24, 3 * 10**24, 7, 8]
        gs = [0, 0, 1, 1]
        got = self._agg(xs, gs, E.AggFunc.AVG)
        # avg result scale = min(s+4, ...): x at scale 4 → result scale 8
        assert got[0] == 2 * 10**24 * 10**4
        assert got[1] == half_up(Fraction(15, 2) * 10**4)

    def test_min_max_wide(self):
        xs = [10**24, -(10**25), 3, 10**22]
        gs = [0, 0, 1, 1]
        assert self._agg(xs, gs, E.AggFunc.MIN) == {0: -(10**25), 1: 3}
        assert self._agg(xs, gs, E.AggFunc.MAX) == {0: 10**24, 1: 10**22}


class TestMulKernelFuzz:
    def test_scaled_mul_random_128bit(self):
        """mul_i128_i128_scaled vs Python bigints over random magnitudes."""
        import random

        import jax.numpy as jnp

        from datafusion_comet_tpu.utils import int128 as i128

        random.seed(11)
        N = 300
        m64 = (1 << 64) - 1

        def rnd():
            bits = random.randint(0, 126)
            v = random.getrandbits(bits) if bits else 0
            return -v if random.random() < 0.5 else v

        xs = [rnd() for _ in range(N)]
        ys = [rnd() for _ in range(N)]

        def topair(vals):
            hi = np.array([np.uint64(((v & ((1 << 128) - 1)) >> 64) & m64).astype(np.int64) for v in vals])
            lo = np.array([np.uint64((v & ((1 << 128) - 1)) & m64).astype(np.int64) for v in vals])
            return jnp.asarray(hi), jnp.asarray(lo)

        a, b = topair(xs), topair(ys)
        for k in (0, 6, 19, 38):
            res, over = i128.mul_i128_i128_scaled(a, b, k)
            rh, rl, ov = np.asarray(res[0]), np.asarray(res[1]), np.asarray(over)
            for i in range(N):
                prod = xs[i] * ys[i]
                exact = half_up(Fraction(prod, 10**k))
                u = ((int(rh[i]) & m64) << 64) | (int(rl[i]) & m64)
                got = u - (1 << 128) if u >= (1 << 127) else u
                if abs(exact) >= (1 << 127) - 1:
                    assert ov[i], (i, k)
                else:
                    assert not ov[i] and got == exact, (i, k, xs[i], ys[i])


class TestSumOverflow:
    def test_sum_beyond_decimal38_nulls(self):
        """A group whose exact sum exceeds 10^38 must come back null
        (Spark LEGACY decimal sum overflow → null)."""
        schema = T.Schema([T.Field("g", T.INT32), T.Field("x", T.decimal(38, 0))])
        big = 10**37 * 9  # 9e37; four of them: 3.6e38 > 10^38
        s = Session()
        s.register_numpy(
            "t",
            {"g": np.array([0, 0, 0, 0, 1], np.int32),
             "x": np.array([big, big, big, big, 7], object)},
            schema,
        )
        plan = P.Scan("t", schema).aggregate(
            [E.col("g")], [E.AggExpr(E.AggFunc.SUM, E.col("x"), "r")]
        )
        res = s.collect(plan)
        got = {int(g): (r if ok else None) for g, r, ok in zip(res["g"], res["r"], res["r__valid"])}
        assert got[0] is None
        assert got[1] == 7


class TestSort:
    def test_order_by_wide(self):
        schema = T.Schema([T.Field("x", WIDE)])
        xs = [10**25, -(10**25), 0, 123, -(10**20), 10**20 + 1, 10**20]
        s = Session()
        s.register_numpy("t", {"x": np.array(xs, object)}, schema)
        plan = P.Scan("t", schema).sort([E.SortOrder(E.col("x"))])
        res = s.collect(plan)
        assert list(res["x"]) == sorted(xs)
        plan = P.Scan("t", schema).sort([E.SortOrder(E.col("x"), ascending=False)])
        res = s.collect(plan)
        assert list(res["x"]) == sorted(xs, reverse=True)


class TestParquet:
    def test_wide_decimal_roundtrip(self, tmp_path):
        import decimal as d

        import pyarrow as pa
        import pyarrow.parquet as pq

        from datafusion_comet_tpu.io.parquet import read_parquet, write_parquet

        vals = [d.Decimal("1234567890123456789012.3456"), d.Decimal("-0.0001"), None, d.Decimal("7.5")]
        p = str(tmp_path / "w.parquet")
        pq.write_table(pa.table({"x": pa.array(vals, pa.decimal128(30, 4))}), p)
        b = read_parquet(p)
        out = B.to_numpy(b)
        got = [int(v) for v, ok in zip(out["x"], out["x__valid"]) if ok]
        assert got == [12345678901234567890123456, -1, 75000]
        p2 = str(tmp_path / "w2.parquet")
        write_parquet(b, p2)
        assert pq.read_table(p2).column("x").to_pylist() == [
            d.Decimal("1234567890123456789012.3456"),
            d.Decimal("-0.0001"),
            None,
            d.Decimal("7.5000"),
        ]

    def test_narrow_values_stay_int64(self, tmp_path):
        import decimal as d

        import pyarrow as pa
        import pyarrow.parquet as pq

        from datafusion_comet_tpu.io.parquet import read_parquet

        vals = [d.Decimal("12.34"), d.Decimal("-5.00")]
        p = str(tmp_path / "n.parquet")
        pq.write_table(pa.table({"x": pa.array(vals, pa.decimal128(25, 2))}), p)
        b = read_parquet(p)
        assert not b.column("x").is_wide_storage


class TestNarrowFastPath:
    def test_q1_shape_stays_narrow(self):
        """The TPC-H Q1 product expression must NOT widen when staged bounds
        prove the values fit int64 (the perf contract for the hot path)."""
        schema = T.Schema([T.Field("p", T.decimal(12, 2)), T.Field("d", T.decimal(12, 2))])
        batch = B.from_numpy(
            {
                "p": np.array([10000, 9500001, 1234567], np.int64),
                "d": np.array([5, 10, 0], np.int64),
            },
            schema,
        )
        expr = E.col("p") * (E.lit(1) - E.col("d"))
        bound = E.bind(expr, schema)
        assert bound.dtype.precision > 18  # wide-typed...
        cv = EV.evaluate(bound, batch)
        assert cv.data.ndim == 1  # ...but narrow-stored
        assert cv.mag_bound is not None and cv.mag_bound < 1 << 62

    def test_sum_of_narrow_wide_typed_stays_narrow(self):
        schema = T.Schema([T.Field("g", T.INT32), T.Field("x", T.decimal(26, 4))])
        s = Session()
        s.register_numpy(
            "t",
            {"g": np.zeros(4, np.int32), "x": np.array([100, 200, 300, 400], object)},
            schema,
        )
        plan = P.Scan("t", schema).aggregate(
            [E.col("g")], [E.AggExpr(E.AggFunc.SUM, E.col("x"), "r")]
        )
        res = s.collect(plan)
        assert list(res["r"]) == [1000]
