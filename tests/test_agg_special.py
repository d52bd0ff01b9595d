"""collect_list/set, exact percentile/median, HLL++, bloom filter aggregate.

Oracles: plain Python/numpy; the bloom bit-index scheme is cross-checked
against an independent scalar reimplementation of Spark's
BloomFilterImpl.putLong (reference: spark_bit_array.rs + Spark BloomFilterImpl).
"""

import math

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P

SCHEMA = T.Schema([T.Field("g", T.INT32), T.Field("x", T.INT32)])
rng = np.random.default_rng(3)
N = 200
G = rng.integers(0, 5, N).astype(np.int32)
X = rng.integers(0, 20, N).astype(np.int32)
XV = rng.random(N) > 0.1  # some nulls
DATA = {"g": G, "x": X}


def agg(func, **kw):
    s = Session()
    s.register_numpy("t", DATA, SCHEMA, validity={"x": XV})
    plan = P.Scan("t", SCHEMA).aggregate(
        [E.col("g")], [E.AggExpr(func, E.col("x"), "r", **kw)]
    )
    out = s.collect(plan)
    return {
        int(g): (r if ok else None)
        for g, r, ok in zip(out["g"], out["r"], out["r__valid"])
    }


def groups():
    out = {}
    for g, x, v in zip(G, X, XV):
        out.setdefault(int(g), []).append(int(x) if v else None)
    return out


class TestCollect:
    def test_collect_list(self):
        got = agg(E.AggFunc.COLLECT_LIST, max_elems=64)
        for g, vals in groups().items():
            expect = [v for v in vals if v is not None]
            assert got[g] == expect, g

    def test_collect_set(self):
        got = agg(E.AggFunc.COLLECT_SET, max_elems=64)
        for g, vals in groups().items():
            expect = {v for v in vals if v is not None}
            assert set(got[g]) == expect and len(got[g]) == len(expect), g

    def test_collect_list_ungrouped(self):
        s = Session()
        s.register_numpy("t", DATA, SCHEMA, validity={"x": XV})
        plan = P.Scan("t", SCHEMA).aggregate(
            [], [E.AggExpr(E.AggFunc.COLLECT_LIST, E.col("x"), "r", max_elems=256)]
        )
        out = s.collect(plan)
        assert out["r"][0] == [int(x) for x, v in zip(X, XV) if v]


class TestPercentile:
    def test_median(self):
        got = agg(E.AggFunc.MEDIAN)
        for g, vals in groups().items():
            xs = sorted(v for v in vals if v is not None)
            assert got[g] == pytest.approx(np.percentile(xs, 50), abs=1e-9), g

    @pytest.mark.parametrize("p", [0.0, 0.25, 0.5, 0.9, 1.0])
    def test_percentile(self, p):
        got = agg(E.AggFunc.PERCENTILE, extra=(E.lit(p),))
        for g, vals in groups().items():
            xs = sorted(v for v in vals if v is not None)
            expect = np.percentile(xs, p * 100, method="linear")
            assert got[g] == pytest.approx(expect, abs=1e-9), (g, p)

    def test_percentile_float_col(self):
        schema = T.Schema([T.Field("x", T.FLOAT64)])
        xs = rng.normal(size=101)
        s = Session()
        s.register_numpy("t", {"x": xs}, schema)
        plan = P.Scan("t", schema).aggregate(
            [], [E.AggExpr(E.AggFunc.PERCENTILE, E.col("x"), "r", extra=(E.lit(0.75),))]
        )
        out = s.collect(plan)
        assert out["r"][0] == pytest.approx(np.percentile(xs, 75), rel=1e-12)


class TestHll:
    @pytest.mark.parametrize("n_distinct", [10, 500, 5000])
    def test_approx_count_distinct(self, n_distinct):
        schema = T.Schema([T.Field("x", T.INT64)])
        xs = rng.integers(0, n_distinct, 20000).astype(np.int64)
        exact = len(np.unique(xs))
        s = Session()
        s.register_numpy("t", {"x": xs}, schema)
        plan = P.Scan("t", schema).aggregate(
            [], [E.AggExpr(E.AggFunc.APPROX_COUNT_DISTINCT, E.col("x"), "r")]
        )
        out = s.collect(plan)
        got = int(out["r"][0])
        assert abs(got - exact) <= max(3, 0.15 * exact), (got, exact)

    def test_grouped(self):
        got = agg(E.AggFunc.APPROX_COUNT_DISTINCT)
        for g, vals in groups().items():
            exact = len({v for v in vals if v is not None})
            assert abs(int(got[g]) - exact) <= max(2, 0.15 * exact)


# ---- independent scalar oracle of Spark murmur3 (hashLong) --------------------------


def _mm3_long_oracle(v: int, seed: int) -> int:
    """Murmur3_x86_32.hashLong (two 32-bit little-end halves)."""

    def rotl(x, r):
        return ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF

    def mix_k1(k1):
        k1 = (k1 * 0xCC9E2D51) & 0xFFFFFFFF
        k1 = rotl(k1, 15)
        return (k1 * 0x1B873593) & 0xFFFFFFFF

    def mix_h1(h1, k1):
        h1 ^= k1
        h1 = rotl(h1, 13)
        return (h1 * 5 + 0xE6546B64) & 0xFFFFFFFF

    h1 = seed & 0xFFFFFFFF
    lo = v & 0xFFFFFFFF
    hi = (v >> 32) & 0xFFFFFFFF
    for half in (lo, hi):
        h1 = mix_h1(h1, mix_k1(half))
    h1 ^= 8
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    return h1 if h1 < 2**31 else h1 - 2**32


def _bloom_indices_oracle(v: int, k: int, num_bits: int):
    h1 = _mm3_long_oracle(v, 0)
    h2 = _mm3_long_oracle(v, h1)
    out = []
    for i in range(1, k + 1):
        c = (h1 + i * h2) & 0xFFFFFFFF
        c = c if c < 2**31 else c - 2**32
        if c < 0:
            c = ~c
        out.append(c % num_bits)
    return out


class TestBloom:
    NUM_BITS = 4096

    def build(self, values):
        schema = T.Schema([T.Field("x", T.INT64)])
        s = Session()
        s.register_numpy("t", {"x": np.asarray(values, np.int64)}, schema)
        plan = P.Scan("t", schema).aggregate(
            [],
            [E.AggExpr(E.AggFunc.BLOOM_FILTER, E.col("x"), "f",
                       num_bits=self.NUM_BITS, extra=(E.lit(len(values)),))],
        )
        out = s.collect(plan)
        return out["f"][0]

    def test_serialization_layout(self):
        buf = self.build([1, 2, 3])
        assert int.from_bytes(buf[0:4], "big") == 1  # version
        k = int.from_bytes(buf[4:8], "big")
        w = int.from_bytes(buf[8:12], "big")
        assert w == self.NUM_BITS // 64
        assert len(buf) == 12 + w * 8
        assert k >= 1

    def test_bit_indices_match_spark_oracle(self):
        values = [0, 1, -1, 12345, 2**40 + 7]
        buf = self.build(values)
        from datafusion_comet_tpu.exec.operators.agg_special import parse_bloom_bytes

        k, bits = parse_bloom_bytes(buf)
        for v in values:
            for idx in _bloom_indices_oracle(v, k, self.NUM_BITS):
                assert bits[idx], (v, idx)

    def test_no_false_negatives_and_low_fp(self):
        values = list(range(0, 400))
        buf = self.build(values)
        schema = T.Schema([T.Field("x", T.INT64)])
        probe = np.arange(-2000, 0, dtype=np.int64)  # absent values
        s = Session()
        s.register_numpy("t", {"x": np.concatenate([np.asarray(values, np.int64), probe])}, schema)
        expr = E.BloomMightContain(E.lit(buf, T.binary(len(buf))), E.col("x"))
        out = s.collect(P.Scan("t", schema).project([expr.alias("hit"), E.col("x")]))
        hits = out["hit"]
        assert all(hits[: len(values)])  # no false negatives
        fp = np.mean(hits[len(values):])
        assert fp < 0.15, fp

    def test_might_contain_via_subquery(self):
        schema = T.Schema([T.Field("x", T.INT64)])
        build_vals = np.asarray([5, 10, 15], np.int64)
        s = Session()
        s.register_numpy("build", {"x": build_vals}, schema)
        s.register_numpy("probe", {"x": np.arange(20, dtype=np.int64)}, schema)
        bloom_plan = P.Scan("build", schema).aggregate(
            [], [E.AggExpr(E.AggFunc.BLOOM_FILTER, E.col("x"), "f",
                           num_bits=1024, extra=(E.lit(3),))]
        )
        sub = s.scalar_subquery(bloom_plan)
        pred = E.BloomMightContain(sub, E.col("x"))
        out = s.collect(P.Scan("probe", schema).filter(pred))
        got = set(int(v) for v in out["x"])
        assert {5, 10, 15} <= got
        assert len(got) <= 8  # few false positives at most
