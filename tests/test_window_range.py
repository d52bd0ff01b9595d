"""RANGE frames with typed value offsets (reference: operator.proto:552-603)."""

import numpy as np
import pandas as pd
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P

SCHEMA = T.Schema([
    T.Field("g", T.INT32),
    T.Field("k", T.INT32),   # order key
    T.Field("x", T.INT64),
])
rng = np.random.default_rng(11)
N = 300
DATA = {
    "g": rng.integers(0, 4, N).astype(np.int32),
    "k": rng.integers(0, 50, N).astype(np.int32),
    "x": rng.integers(-100, 100, N).astype(np.int64),
}
XV = rng.random(N) > 0.1


def run(wexpr, name="w"):
    s = Session()
    s.register_numpy("t", DATA, SCHEMA, validity={"x": XV})
    plan = P.Window(P.Scan("t", SCHEMA), (wexpr,))
    out = s.collect(plan)
    return out


def oracle(func, lo, hi, asc=True):
    df = pd.DataFrame({**DATA, "xv": XV, "i": np.arange(N)})
    res = np.empty(N, object)
    for i in range(N):
        g, k = df.g[i], df.k[i]
        m = (df.g == g)
        if lo is not None:
            m &= (df.k >= k - lo) if asc else (df.k <= k + lo)
        if hi is not None:
            m &= (df.k <= k + hi) if asc else (df.k >= k - hi)
        vals = df.x[m & df.xv]
        if func == "count":
            res[i] = len(vals)
        elif func == "sum":
            res[i] = vals.sum() if len(vals) else None
        elif func == "avg":
            res[i] = vals.mean() if len(vals) else None
    return res


@pytest.mark.parametrize("lo,hi", [(5, 5), (0, 10), (3, 0), (None, 2), (7, None)])
@pytest.mark.parametrize("func", ["sum", "count", "avg"])
def test_range_frames(func, lo, hi):
    w = E.WindowExpr(
        func, E.col("x"), "w",
        partition_by=(E.col("g"),),
        order_by=(E.SortOrder(E.col("k")),),
        frame=E.WindowFrame("range", lo, hi),
    )
    out = run(w)
    got = {(int(g), int(k), int(i)): (v if ok else None)
           for g, k, i, v, ok in zip(out["g"], out["k"], np.arange(N), out["w"], out["w__valid"])}
    exp = oracle(func, lo, hi)
    # align by original row: output preserves input order
    for i in range(N):
        gv = out["w"][i] if out["w__valid"][i] else None
        ev = exp[i]
        if func == "avg" and ev is not None and gv is not None:
            assert gv == pytest.approx(ev, rel=1e-12), i
        else:
            assert (None if gv is None else int(gv)) == (None if ev is None else int(ev)), i


def test_range_desc():
    w = E.WindowExpr(
        "sum", E.col("x"), "w",
        partition_by=(E.col("g"),),
        order_by=(E.SortOrder(E.col("k"), ascending=False),),
        frame=E.WindowFrame("range", 4, 6),
    )
    out = run(w)
    exp = oracle("sum", 4, 6, asc=False)
    for i in range(N):
        gv = out["w"][i] if out["w__valid"][i] else None
        assert (None if gv is None else int(gv)) == (None if exp[i] is None else int(exp[i])), i
