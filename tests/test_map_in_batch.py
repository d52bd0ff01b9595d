"""MapInBatch: host pandas function over materialized batches
(CometMapInBatchExec analog)."""

import numpy as np
import pandas as pd

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P

SCHEMA = T.Schema([T.Field("x", T.INT64), T.Field("s", T.string(8))])
DATA = {"x": np.arange(6, dtype=np.int64), "s": [f"v{i}" for i in range(6)]}


def test_map_in_batch_transform():
    def fn(df):
        out = df[df.x % 2 == 0].copy()
        out["y"] = out.x * 10
        return out[["y", "s"]]

    s = Session()
    s.register_numpy("t", DATA, SCHEMA)
    plan = P.MapInBatch(
        P.Scan("t", SCHEMA), fn,
        (T.Field("y", T.INT64), T.Field("s", T.string(8))),
    )
    out = s.collect(plan)
    assert list(out["y"]) == [0, 20, 40]
    assert list(out["s"]) == ["v0", "v2", "v4"]


def test_map_in_batch_composes_with_plan():
    def fn(df):
        df = df.copy()
        df["x"] = df.x + 100
        return df

    s = Session()
    s.register_numpy("t", DATA, SCHEMA)
    plan = P.MapInBatch(
        P.Scan("t", SCHEMA).filter(E.col("x") > E.lit(2)), fn,
        tuple(SCHEMA.fields),
    ).filter(E.col("x") < E.lit(105)).project([E.col("x")])
    out = s.collect(plan)
    assert sorted(out["x"]) == [103, 104]
