"""Fuzz round 2: nested arrays, regexp DFA, window range frames, tz temporal —
random inputs with edge values vs Python/pandas oracles (the reference's
CometFuzzTestSuite expansion pattern)."""

import re

import numpy as np
import pandas as pd
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import functions as F
from datafusion_comet_tpu.ir import plan as P

N = 120


def session_with(data, schema):
    s = Session()
    s.register_numpy("t", data, schema)
    return s


def col_out(out, name):
    return [v if ok else None for v, ok in zip(out[name], out[name + "__valid"])]


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_array_ops(seed):
    rng = np.random.default_rng(seed)
    lists = []
    for _ in range(N):
        r = rng.random()
        if r < 0.1:
            lists.append(None)
        elif r < 0.25:
            lists.append([])
        else:
            ln = rng.integers(1, 7)
            lists.append([
                None if rng.random() < 0.2 else int(rng.integers(-5, 6))
                for _ in range(ln)
            ])
    schema = T.Schema([T.Field("xs", T.list_(T.INT32, 8))])
    s = session_with({"xs": lists}, schema)
    target = int(rng.integers(-5, 6))
    out = s.collect(P.Scan("t", schema).project([
        E.ArrayExpr("size", (E.col("xs"),)).alias("sz"),
        E.ArrayExpr("array_contains", (E.col("xs"), E.lit(target))).alias("ct"),
        E.ArrayExpr("array_distinct", (E.col("xs"),)).alias("dd"),
        E.ArrayExpr("sort_array", (E.col("xs"),)).alias("st"),
    ]))
    for i, xs in enumerate(lists):
        sz, ct = col_out(out, "sz")[i], col_out(out, "ct")[i]
        dd, st = col_out(out, "dd")[i], col_out(out, "st")[i]
        if xs is None:
            assert sz is None and ct is None and dd is None and st is None
            continue
        assert sz == len(xs)
        if target in xs:
            assert bool(ct) is True
        elif None in xs:
            assert ct is None
        else:
            assert bool(ct) is False
        seen, expect_dd = set(), []
        for v in xs:
            if v not in seen:
                seen.add(v)
                expect_dd.append(v)
        assert dd == expect_dd
        nones = [v for v in xs if v is None]
        vals = sorted(v for v in xs if v is not None)
        assert st == nones + vals  # nulls first ascending


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_rlike(seed):
    rng = np.random.default_rng(100 + seed)
    alpha = list("ab1.x-")
    strs = ["".join(rng.choice(alpha, size=rng.integers(0, 10))) for _ in range(N)]
    pats = [r"a+b", r"[ab]\d", r"^x|-$", r"(a|b)\.", r"a.{1,2}b", r"[^ab]+$"]
    schema = T.Schema([T.Field("s", T.string(12))])
    s = session_with({"s": strs}, schema)
    for pat in pats:
        out = s.collect(P.Scan("t", schema).project([F.rlike(E.col("s"), pat).alias("m")]))
        got = col_out(out, "m")
        assert got == [bool(re.search(pat, x)) for x in strs], pat


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_window_running(seed):
    rng = np.random.default_rng(200 + seed)
    data = {
        "g": rng.integers(0, 5, N).astype(np.int32),
        "k": rng.integers(0, 40, N).astype(np.int32),
        "x": rng.integers(-20, 20, N).astype(np.int64),
    }
    schema = T.Schema([T.Field("g", T.INT32), T.Field("k", T.INT32), T.Field("x", T.INT64)])
    s = session_with(data, schema)
    lo, hi = int(rng.integers(0, 6)), int(rng.integers(0, 6))
    w = E.WindowExpr(
        "count", E.col("x"), "w",
        partition_by=(E.col("g"),), order_by=(E.SortOrder(E.col("k")),),
        frame=E.WindowFrame("range", lo, hi),
    )
    out = s.collect(P.Window(P.Scan("t", schema), (w,)))
    df = pd.DataFrame(data)
    for i in range(N):
        m = (df.g == df.g[i]) & (df.k >= df.k[i] - lo) & (df.k <= df.k[i] + hi)
        assert int(out["w"][i]) == int(m.sum()), i


@pytest.mark.parametrize("seed", range(2))
def test_fuzz_tz_roundtrip(seed):
    rng = np.random.default_rng(300 + seed)
    micros = rng.integers(-10**15, 2 * 10**15, N).astype(np.int64)
    schema = T.Schema([T.Field("ts", T.TIMESTAMP)])
    s = session_with({"ts": micros}, schema)
    tz = ["America/New_York", "Asia/Kolkata"][seed % 2]
    inner = E.TemporalFunc("from_utc_timestamp", (E.col("ts"), E.lit(tz)))
    out = s.collect(P.Scan("t", schema).project([
        E.TemporalFunc("to_utc_timestamp", (inner, E.lit(tz))).alias("rt"),
    ]))
    # round-trip holds except inside DST gaps (documented deviation)
    mismatches = sum(1 for g, e in zip(out["rt"], micros) if int(g) != int(e))
    assert mismatches <= N * 0.01
