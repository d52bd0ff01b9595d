"""Lazy parquet registration + partition pruning (static filters and DPP).

Reference behavior: CometScanExec.scala:105-130 — selectedPartitions from
static partitionFilters, dynamicallySelectedPartitions from runtime
(join-produced) pruning filters. Here the lazy table resolves at query time
(engine._resolve_deferred + exec/dpp.py); assertions check BOTH the query
results (pandas oracle) and that pruned partitions were never staged.
"""

import numpy as np
import pandas as pd
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P


@pytest.fixture(scope="module")
def fact_df():
    rng = np.random.default_rng(7)
    n = 400
    return pd.DataFrame(
        {
            "region": np.repeat(["asia", "emea", "amer", "apac"], n // 4),
            "store": rng.integers(0, 10, n).astype(np.int64),
            "sales": rng.integers(1, 1000, n).astype(np.int64),
        }
    )


@pytest.fixture(scope="module")
def fact_path(tmp_path_factory, fact_df):
    from datafusion_comet_tpu.exec.batch import from_numpy
    from datafusion_comet_tpu.io.parquet import write_parquet_partitioned

    schema = T.Schema(
        [
            T.Field("region", T.string(8), False),
            T.Field("store", T.INT64, False),
            T.Field("sales", T.INT64, False),
        ]
    )
    batch = from_numpy({c: fact_df[c].to_numpy() for c in fact_df}, schema)
    root = tmp_path_factory.mktemp("dpp") / "fact"
    write_parquet_partitioned(batch, str(root), ["region"])
    return str(root)


FACT = T.Schema(
    [
        T.Field("store", T.INT64, False),
        T.Field("sales", T.INT64, False),
        T.Field("region", T.string(8), False),
    ]
)
DIM = T.Schema(
    [
        T.Field("r_name", T.string(8), False),
        T.Field("r_zone", T.INT64, False),
    ]
)


def _session(fact_path):
    s = Session()
    s.register_parquet("fact", fact_path, lazy=True)
    s.register_numpy(
        "dim",
        {
            "r_name": np.array(["asia", "emea", "amer", "apac"]),
            "r_zone": np.array([1, 1, 2, 3], np.int64),
        },
        DIM,
    )
    return s


def _staged_partitions(sess, name):
    """Distinct region values RESIDENT in the staged device batch after the
    last query (running another query would re-resolve and re-stage)."""
    from datafusion_comet_tpu.exec.batch import to_numpy

    out = to_numpy(sess.tables[name])
    return set(np.asarray(out["region"])[np.asarray(out["region__valid"])].tolist())


def test_lazy_schema_includes_partition_column(fact_path):
    s = _session(fact_path)
    names = [f.name for f in s.table_schema("fact").fields]
    assert "region" in names


def test_static_partition_pruning(fact_path, fact_df):
    s = _session(fact_path)
    sch = s.table_schema("fact")
    plan = (
        P.Scan("fact", sch)
        .filter(E.col("region") == E.lit("asia"))
        .aggregate([], [E.AggExpr("sum", E.col("sales"), "s")])
    )
    out = s.collect(plan)
    exp = fact_df[fact_df.region == "asia"].sales.sum()
    assert out["s"][0] == exp
    assert _staged_partitions(s, "fact") == {"asia"}


def test_static_in_list_pruning(fact_path, fact_df):
    s = _session(fact_path)
    sch = s.table_schema("fact")
    pred = E.InList(E.col("region"), (E.lit("emea"), E.lit("apac")))
    plan = P.Scan("fact", sch).filter(pred).aggregate(
        [], [E.AggExpr("sum", E.col("sales"), "s")]
    )
    out = s.collect(plan)
    exp = fact_df[fact_df.region.isin(["emea", "apac"])].sales.sum()
    assert out["s"][0] == exp
    assert _staged_partitions(s, "fact") == {"emea", "apac"}


def test_dynamic_partition_pruning_inner_join(fact_path, fact_df):
    """Join fact.region = dim.r_name with a selective dim filter: only the
    dim-matching partitions may be staged (the DPP contract)."""
    s = _session(fact_path)
    sch = s.table_schema("fact")
    dim = P.Scan("dim", DIM).filter(E.col("r_zone") == E.lit(1))
    plan = P.HashJoin(
        P.Scan("fact", sch), dim, (E.col("region"),), (E.col("r_name"),)
    ).aggregate([], [E.AggExpr("sum", E.col("sales"), "s")])
    out = s.collect(plan)
    exp = fact_df[fact_df.region.isin(["asia", "emea"])].sales.sum()
    assert out["s"][0] == exp
    assert _staged_partitions(s, "fact") <= {"asia", "emea"}


def test_dpp_disabled_falls_back_to_full_scan(fact_path, fact_df):
    from datafusion_comet_tpu.conf import CONF, DPP_ENABLED

    s = _session(fact_path)
    sch = s.table_schema("fact")
    dim = P.Scan("dim", DIM).filter(E.col("r_zone") == E.lit(1))
    plan = P.HashJoin(
        P.Scan("fact", sch), dim, (E.col("region"),), (E.col("r_name"),)
    ).aggregate([], [E.AggExpr("sum", E.col("sales"), "s")])
    old = CONF.get(DPP_ENABLED)
    try:
        CONF.set(DPP_ENABLED.key, False)
        out = s.collect(plan)
    finally:
        CONF.set(DPP_ENABLED.key, old)
    exp = fact_df[fact_df.region.isin(["asia", "emea"])].sales.sum()
    assert out["s"][0] == exp  # same answer, no pruning


def test_outer_join_preserved_side_never_pruned(fact_path, fact_df):
    """fact LEFT OUTER dim: fact is the preserved side — pruning it would
    drop rows, so DPP must not apply to it."""
    s = _session(fact_path)
    sch = s.table_schema("fact")
    dim = P.Scan("dim", DIM).filter(E.col("r_zone") == E.lit(1))
    plan = P.HashJoin(
        P.Scan("fact", sch), dim, (E.col("region"),), (E.col("r_name"),),
        join_type=P.JoinType.LEFT,
    ).aggregate([], [E.AggExpr("sum", E.col("sales"), "s")])
    out = s.collect(plan)
    assert out["s"][0] == fact_df.sales.sum()
    assert _staged_partitions(s, "fact") == {"asia", "emea", "amer", "apac"}


def test_unfiltered_query_scans_everything(fact_path, fact_df):
    s = _session(fact_path)
    sch = s.table_schema("fact")
    out = s.collect(
        P.Scan("fact", sch).aggregate([], [E.AggExpr("sum", E.col("sales"), "s")])
    )
    assert out["s"][0] == fact_df.sales.sum()
