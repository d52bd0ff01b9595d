"""Tiled execution + memory planner tests: streaming aggregate over tiles
must equal the single-batch result; tiling planner picks sane tile counts."""

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.batch import to_numpy
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.exec.memory import batch_bytes, plan_peak_bytes, plan_tiles
from datafusion_comet_tpu.exec.streaming import execute_tiled_aggregate, numpy_tiles
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P
from datafusion_comet_tpu.models import tpch


def test_tiled_q1_matches_single_shot():
    data = tpch.generate_table("lineitem", 0.002)
    plan = tpch.q1()  # Sort(HashAggregate(...)) — use the agg child
    agg_plan = plan.child  # HashAggregate
    sess = Session()
    sess.register_numpy("lineitem", data, tpch.SCHEMAS["lineitem"])
    single = to_numpy(sess.execute(agg_plan))

    tiles = numpy_tiles(data, tpch.SCHEMAS["lineitem"], tile_rows=2000)
    tiled = to_numpy(execute_tiled_aggregate(agg_plan, tiles, "lineitem", merge_every=3))

    # group-by output order may differ; compare as sorted rows
    def rows(d):
        ks = ["l_returnflag", "l_linestatus", "sum_qty", "sum_charge", "count_order", "avg_qty"]
        return sorted(zip(*[list(d[k]) for k in ks]))

    assert rows(single) == rows(tiled)


def test_memory_planner():
    schema = tpch.SCHEMAS["lineitem"]
    one = batch_bytes(schema, 1024)
    assert one > 1024 * 50  # ~14 columns incl strings
    plan = P.bind_plan(tpch.q1())
    peak = plan_peak_bytes(plan, 1 << 20)
    assert peak > batch_bytes(schema, 1 << 20)
    tiles = plan_tiles(plan, total_rows=600_000_000)
    assert tiles >= 2  # SF100 lineitem cannot fit one tile


class TestDistributedTiledAggregate:
    """Exchange↔compute-overlapped tiled aggregation over the 8-device mesh
    (SURVEY §2d item 4): per tile Partial → hash all-to-all on group keys →
    donated device-resident PartialMerge; matches the single-shot result."""

    def test_matches_single_shot(self):
        import jax

        from datafusion_comet_tpu.exec.batch import to_numpy
        from datafusion_comet_tpu.exec.engine import Session
        from datafusion_comet_tpu.exec.streaming import (
            execute_tiled_aggregate_distributed,
            numpy_tiles,
        )
        from datafusion_comet_tpu.parallel.mesh import make_mesh

        rng = np.random.default_rng(2)
        n = 60_000
        data = {"g": rng.integers(0, 50, n).astype(np.int64),
                "v": rng.normal(size=n)}
        s = T.Schema([T.Field("g", T.INT64), T.Field("v", T.FLOAT64)])
        plan = P.Scan("t", s).aggregate(
            [E.col("g")],
            [E.AggExpr("sum", E.col("v"), "sv"),
             E.AggExpr("count", E.col("v"), "cv"),
             E.AggExpr("avg", E.col("v"), "av")],
        )
        sess = Session()
        sess.register_numpy("t", data, s)
        want = to_numpy(sess.execute(P.bind_plan(plan)))

        tiles = numpy_tiles(data, s, tile_rows=8192)
        out = execute_tiled_aggregate_distributed(
            P.bind_plan(plan), tiles, "t", make_mesh(len(jax.devices())))
        got = to_numpy(out)
        w = dict(zip(want["g"].tolist(), zip(want["sv"], want["cv"], want["av"])))
        g = dict(zip(got["g"].tolist(), zip(got["sv"], got["cv"], got["av"])))
        assert set(w) == set(g)
        for k in w:
            np.testing.assert_allclose(g[k][0], w[k][0], rtol=1e-12)
            assert g[k][1] == w[k][1]
            np.testing.assert_allclose(g[k][2], w[k][2], rtol=1e-12)
