"""Distributed execution tests on a virtual 8-device CPU mesh.

Validates the SPMD lowering (partial→exchange→final aggregation, broadcast
joins, single-partition gather for sort/limit) produces results identical to
single-device execution — the reference's local[*] multi-partition test
strategy (SURVEY.md §4)."""

import numpy as np
import pandas as pd
import pytest

import jax

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P
from datafusion_comet_tpu.models import tpch
from datafusion_comet_tpu.parallel.executor import DistributedSession
from datafusion_comet_tpu.parallel.mesh import make_mesh

SF = 0.001


@pytest.fixture(scope="module")
def data():
    return tpch.generate_tables(
        ["lineitem", "orders", "customer", "supplier", "nation", "region",
         "part", "partsupp"], SF
    )


@pytest.fixture(scope="module")
def dsess(data):
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    s = DistributedSession(make_mesh(8))
    for name, cols in data.items():
        s.register_numpy(name, cols, tpch.SCHEMAS[name])
    return s


@pytest.fixture(scope="module")
def ssess(data):
    s = Session()
    for name, cols in data.items():
        s.register_numpy(name, cols, tpch.SCHEMAS[name])
    return s


def _cols(d):
    return {k: v for k, v in d.items() if not k.endswith("__valid")}


def assert_same(a, b):
    for k in _cols(a):
        av, bv = a[k], b[k]
        assert len(av) == len(bv), k
        if av.dtype == object:
            assert list(av) == list(bv), k
        elif np.issubdtype(av.dtype, np.floating):
            np.testing.assert_allclose(av, bv, rtol=1e-9, err_msg=k)
        else:
            np.testing.assert_array_equal(av, bv, err_msg=k)


class TestDistributedQueries:
    def test_q1_matches_single_device(self, dsess, ssess):
        assert_same(dsess.collect(tpch.q1()), ssess.collect(tpch.q1()))

    def test_q6_matches_single_device(self, dsess, ssess):
        assert_same(dsess.collect(tpch.q6()), ssess.collect(tpch.q6()))

    def test_q3_matches_single_device(self, dsess, ssess):
        assert_same(dsess.collect(tpch.q3()), ssess.collect(tpch.q3()))

    def test_q5_matches_single_device(self, dsess, ssess):
        assert_same(dsess.collect(tpch.q5()), ssess.collect(tpch.q5()))

    def test_q13_matches_single_device(self, dsess, ssess):
        # LEFT join + dup build keys through the distributed broadcast path
        assert_same(dsess.collect(tpch.q13()), ssess.collect(tpch.q13()))

    def test_q16_matches_single_device(self, dsess, ssess):
        # composite-key join + anti join distributed
        assert_same(dsess.collect(tpch.q16()), ssess.collect(tpch.q16()))


class TestShuffle:
    def test_hash_exchange_roundtrip(self, dsess, ssess):
        """Explicit hash repartition preserves the multiset of rows."""
        plan = (
            P.ShuffleExchange(
                P.Scan("orders", tpch.SCHEMAS["orders"]),
                "hash",
                (E.col("o_custkey"),),
            )
            .sort([E.SortOrder(E.col("o_orderkey"))])
        )
        got = dsess.collect(plan)
        exp = ssess.collect(P.Scan("orders", tpch.SCHEMAS["orders"]).sort([E.SortOrder(E.col("o_orderkey"))]))
        assert_same(got, exp)
