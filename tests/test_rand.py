"""Spark-exact rand()/randn() (reference:
native/spark-expr/src/nondetermenistic_funcs/{rand,randn}.rs): XORShift with
murmur3-hashed per-partition seed, low-bits next(bits), polar-method
gaussian with cached second value. Oracle: independent pure-Python
implementation of the same contracts."""

import math

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.exec.random_xorshift import init_seed_host
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P

M64 = (1 << 64) - 1


def _signed(v):
    v &= M64
    return v - (1 << 64) if v >= (1 << 63) else v


class PyXorShift:
    def __init__(self, state):
        self.state = state
        self.cached = None

    def next(self, bits):
        s = self.state
        s = _signed(s ^ _signed(s << 21))
        s = _signed(s ^ ((s & M64) >> 35))
        s = _signed(s ^ _signed(s << 4))
        self.state = s
        return s & ((1 << bits) - 1)

    def next_f64(self):
        a = self.next(26)
        b = self.next(27)
        return ((a << 27) + b) * 1.1102230246251565e-16

    def next_gaussian(self):
        if self.cached is not None:
            v, self.cached = self.cached, None
            return v
        while True:
            v1 = 2.0 * self.next_f64() - 1.0
            v2 = 2.0 * self.next_f64() - 1.0
            s = v1 * v1 + v2 * v2
            if s < 1.0 and s != 0.0:
                break
        mult = math.sqrt(-2.0 * math.log(s) / s)
        self.cached = v2 * mult
        return v1 * mult


SCH = T.Schema([T.Field("k", T.INT64, False)])


@pytest.fixture()
def sess():
    s = Session()
    s.register_numpy("t", {"k": np.arange(200, dtype=np.int64)}, SCH)
    return s


def test_rand_row_parity(sess):
    out = sess.collect(P.Scan("t", SCH).project(
        [E.RandExpr("rand", 42).alias("r"), E.col("k")]))
    gen = PyXorShift(init_seed_host(42, 0))
    exp = [gen.next_f64() for _ in range(200)]
    got = [float(v) for v in out["r"]]
    assert got == exp
    assert all(0.0 <= v < 1.0 for v in got)


def test_randn_row_parity(sess):
    out = sess.collect(P.Scan("t", SCH).project(
        [E.RandExpr("randn", 7).alias("r")]))
    gen = PyXorShift(init_seed_host(7, 0))
    exp = [gen.next_gaussian() for _ in range(200)]
    got = [float(v) for v in out["r"]]
    assert got == pytest.approx(exp, rel=1e-12, abs=1e-300)


def test_seed_hash_matches_spark_shape():
    # hashSeed is two murmur rounds over big-endian bytes; different seeds
    # and partitions must decorrelate
    s_a = init_seed_host(42, 0)
    s_b = init_seed_host(42, 1)
    s_c = init_seed_host(44, 0)
    assert len({s_a, s_b, s_c}) == 3
    # Spark seeds per partition as hashSeed(seed + partitionIndex)
    assert init_seed_host(42, 1) == init_seed_host(43, 0)
    assert all(-(1 << 63) <= s < (1 << 63) for s in (s_a, s_b, s_c))


def test_dead_slots_do_not_advance_state(sess):
    # filter first: live rows front-packed; the live sequence must equal the
    # unfiltered prefix sequence (Spark evaluates per input row)
    plan = P.Scan("t", SCH).filter(E.col("k") < E.lit(50)).project(
        [E.RandExpr("rand", 11).alias("r")])
    out = sess.collect(plan)
    gen = PyXorShift(init_seed_host(11, 0))
    exp = [gen.next_f64() for _ in range(50)]
    assert [float(v) for v in out["r"]] == exp


def test_bernoulli_sample_row_parity(sess):
    """sample(withReplacement=false) is Spark-exact: one nextDouble per row,
    keep when lb <= x < ub (bernoulli_cell_sampler.rs contract)."""
    plan = P.Sample(P.Scan("t", SCH), 0.0, 0.3, False, 42)
    out = sess.collect(plan)
    gen = PyXorShift(init_seed_host(42, 0))
    exp = [k for k in range(200) if gen.next_f64() < 0.3]
    assert out["k"].tolist() == exp


def test_bernoulli_complement_ranges_partition_rows(sess):
    """randomSplit property: [0,0.3) and [0.3,1.0) with the same seed must
    partition the input exactly (bernoulli_cell_sampler.rs test)."""
    lo = sess.collect(P.Sample(P.Scan("t", SCH), 0.0, 0.3, False, 7))
    hi = sess.collect(P.Sample(P.Scan("t", SCH), 0.3, 1.0, False, 7))
    merged = sorted(lo["k"].tolist() + hi["k"].tolist())
    assert merged == list(range(200))


def test_bernoulli_empty_range_selects_nothing(sess):
    out = sess.collect(P.Sample(P.Scan("t", SCH), 0.5, 0.5, False, 7))
    assert out["k"].tolist() == []
