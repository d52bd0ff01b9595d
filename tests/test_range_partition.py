"""Range partitioning + distributed range-exchange sort (8-device CPU mesh).

Reference contract: partitioning.proto RangePartition (boundary rows) +
CometShuffleExchangeExec RangePartitioning boundary sampling; here boundaries
are sampled inside the SPMD program and every device owns one key range, so
device-order concatenation IS the global sort order.
"""

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import from_numpy
from datafusion_comet_tpu.exec.evaluator import EvalContext
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P
from datafusion_comet_tpu.parallel.executor import DistributedSession
from datafusion_comet_tpu.parallel.shuffle import (
    partition_ids_range,
    sample_range_boundaries,
)

SCHEMA = T.Schema([T.Field("x", T.INT64), T.Field("s", T.string(8))])


def make_batch(n=500, seed=0):
    rng = np.random.default_rng(seed)
    return from_numpy(
        {
            "x": rng.integers(-1000, 1000, n).astype(np.int64),
            "s": np.array([f"k{v:04d}" for v in rng.integers(0, 500, n)], object),
        },
        SCHEMA,
    )


class TestHostBoundaries:
    def test_partition_ids_monotone_with_key(self, monkeypatch):
        b = make_batch()
        orders = [E.SortOrder(E.bind(E.col("x"), SCHEMA))]
        ctx = EvalContext()
        blimbs = sample_range_boundaries(b, orders, 8, ctx, seed=1)
        pids = np.asarray(partition_ids_range(b, orders, blimbs, ctx))
        xs = np.asarray(b.columns[0].data)
        mask = np.asarray(b.row_mask)
        # same key → same partition; increasing key → non-decreasing partition
        order = np.argsort(xs[mask], kind="stable")
        p_sorted = pids[mask][order]
        assert (np.diff(p_sorted) >= 0).all()
        assert pids[mask].max() <= 7 and pids[mask].min() >= 0
        # balanced-ish: no partition with more than 40% of rows
        counts = np.bincount(pids[mask], minlength=8)
        assert counts.max() <= 0.4 * mask.sum()

    def test_string_keys(self):
        b = make_batch()
        orders = [E.SortOrder(E.bind(E.col("s"), SCHEMA), ascending=False)]
        ctx = EvalContext()
        blimbs = sample_range_boundaries(b, orders, 4, ctx, seed=2)
        pids = np.asarray(partition_ids_range(b, orders, blimbs, ctx))
        mask = np.asarray(b.row_mask)
        svals = [f"k{v:04d}" for v in []]
        # descending: lexicographically larger strings land in LOWER partitions
        import pandas as pd

        from datafusion_comet_tpu.exec.batch import to_numpy

        out = to_numpy(b)
        dfp = pd.DataFrame({"s": out["s"], "p": pids[mask]})
        g = dfp.groupby("p").s.agg(["min", "max"]).sort_index()
        for a, bb in zip(g.index[:-1], g.index[1:]):
            assert g.loc[a, "min"] >= g.loc[bb, "max"] or g.loc[a, "min"] >= g.loc[bb, "min"]


class TestDistributedRangeSort:
    def test_full_sort_no_gather(self):
        sess = DistributedSession()
        rng = np.random.default_rng(7)
        n = 2000
        data = {
            "x": rng.integers(-10000, 10000, n).astype(np.int64),
            "s": np.array([f"v{v:05d}" for v in rng.integers(0, 1000, n)], object),
        }
        sess.register_numpy("t", data, SCHEMA)
        plan = P.Scan("t", SCHEMA).sort([E.SortOrder(E.col("x"))])
        out = sess.collect(plan)
        assert len(out["x"]) == n
        assert (np.diff(out["x"]) >= 0).all()

    def test_full_sort_desc_nulls(self):
        sess = DistributedSession()
        rng = np.random.default_rng(8)
        n = 1000
        xs = rng.integers(0, 100, n).astype(np.int64)
        valid = rng.random(n) > 0.1
        schema = T.Schema([T.Field("x", T.INT64)])
        s = DistributedSession()
        from datafusion_comet_tpu.exec.batch import from_numpy as fnp

        # register with nulls
        npart = s.num_partitions
        data = {"x": xs}
        s.register_numpy("t", data, schema)
        # patch validity in shards is complex; instead use expression-level nulls
        expr = E.if_(E.col("x") >= E.lit(10), E.col("x"), E.lit(None, T.NULLTYPE)).alias("y")
        plan = P.Scan("t", schema).project([expr]).sort(
            [E.SortOrder(E.col("y"), ascending=False)]
        )
        out = s.collect(plan)
        ys = [None if not ok else v for v, ok in zip(out["y"], out["y__valid"])]
        oracle = sorted([x for x in xs if x >= 10], reverse=True) + [None] * int((xs < 10).sum())
        assert [None if y is None else int(y) for y in ys] == [
            None if o is None else int(o) for o in oracle
        ]

    def test_sort_then_query_parity(self):
        """Distributed full sort output equals single-device sort."""
        from datafusion_comet_tpu.exec.engine import Session

        rng = np.random.default_rng(9)
        n = 1500
        data = {
            "x": rng.integers(-500, 500, n).astype(np.int64),
            "s": np.array([f"w{v:03d}" for v in rng.integers(0, 50, n)], object),
        }
        plan = P.Scan("t", SCHEMA).sort(
            [E.SortOrder(E.col("s")), E.SortOrder(E.col("x"), ascending=False)]
        )
        d = DistributedSession()
        d.register_numpy("t", data, SCHEMA)
        got = d.collect(plan)
        s1 = Session()
        s1.register_numpy("t", data, SCHEMA)
        ref = s1.collect(plan)
        np.testing.assert_array_equal(got["x"], ref["x"])
        np.testing.assert_array_equal(got["s"], ref["s"])
