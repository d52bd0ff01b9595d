"""Semi/anti condition pushdown (the q21 shape): semi/anti/existence joins
whose extra condition is one comparison against a single build column must
answer via the per-group min/max carry — no pair materialization — and match
both a pandas oracle and the generic pair-evaluating path (config off)."""

import numpy as np
import pandas as pd
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.conf import CONF, JOIN_SEMI_MINMAX
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P

OPS = {
    "ne": lambda b, p: b != p,
    "lt": lambda b, p: b < p,
    "le": lambda b, p: b <= p,
    "gt": lambda b, p: b > p,
    "ge": lambda b, p: b >= p,
}
EXPR_OPS = {
    "ne": lambda a, b: a != b,
    "lt": lambda a, b: a < b,
    "le": lambda a, b: a <= b,
    "gt": lambda a, b: a > b,
    "ge": lambda a, b: a >= b,
}


def _data(n_probe=4000, n_build=9000, seed=7, with_nulls=True):
    rng = np.random.default_rng(seed)
    probe = {
        "pk": rng.integers(0, 800, n_probe).astype(np.int64),
        "pv": rng.integers(-40, 40, n_probe).astype(np.int64),
        "tag": np.arange(n_probe, dtype=np.int64),
    }
    build = {
        "bk": rng.integers(0, 800, n_build).astype(np.int64),
        "bv": rng.integers(-40, 40, n_build).astype(np.int64),
    }
    nulls = {}
    if with_nulls:
        nulls["pk"] = rng.random(n_probe) < 0.05
        nulls["pv"] = rng.random(n_probe) < 0.05
        nulls["bk"] = rng.random(n_build) < 0.05
        nulls["bv"] = rng.random(n_build) < 0.05
    return probe, build, nulls


def _session(probe, build, nulls):
    ps = T.Schema([T.Field("pk", T.INT64), T.Field("pv", T.INT64),
                   T.Field("tag", T.INT64)])
    bs = T.Schema([T.Field("bk", T.INT64), T.Field("bv", T.INT64)])
    sess = Session()

    def with_none(cols, names):
        out = {}
        for k, v in cols.items():
            if k in nulls:
                out[k] = [None if m else int(x) for x, m in zip(v, nulls[k])]
            else:
                out[k] = v
        return out

    sess.register_numpy("probe", with_none(probe, nulls), ps)
    sess.register_numpy("build", with_none(build, nulls), bs)
    return sess, ps, bs


def _oracle_match(probe, build, nulls, op):
    """has_match per probe row under SQL three-valued logic: a pair matches
    iff keys equal (null never equal) and condition true (null -> false)."""
    pk = probe["pk"].astype(object)
    pv = probe["pv"].astype(object)
    bk = build["bk"].astype(object)
    bv = build["bv"].astype(object)
    pkn = nulls.get("pk", np.zeros(len(pk), bool))
    pvn = nulls.get("pv", np.zeros(len(pv), bool))
    bkn = nulls.get("bk", np.zeros(len(bk), bool))
    bvn = nulls.get("bv", np.zeros(len(bv), bool))
    from collections import defaultdict

    groups = defaultdict(list)
    for k, v, kn, vn in zip(bk, bv, bkn, bvn):
        if not kn and not vn:
            groups[k].append(v)
    fn = OPS[op]
    out = np.zeros(len(pk), bool)
    for i, (k, v, kn, vn) in enumerate(zip(pk, pv, pkn, pvn)):
        if kn or vn:
            continue
        out[i] = any(fn(b, v) for b in groups.get(k, ()))
    return out


def _plan(ps, bs, jt, op, orientation="build_left"):
    pair = T.Schema(list(ps.fields) + list(bs.fields))
    if orientation == "build_left":
        cond = E.BinaryOp(op, E.col("bv"), E.col("pv"))
    else:
        flip = {"ne": "ne", "lt": "gt", "le": "ge", "gt": "lt", "ge": "le"}
        cond = E.BinaryOp(flip[op], E.col("pv"), E.col("bv"))
    return P.HashJoin(
        P.Scan(table="probe", source_schema=ps),
        P.Scan(table="build", source_schema=bs),
        (E.bind(E.col("pk"), ps),),
        (E.bind(E.col("bk"), bs),),
        jt, "right", condition=E.bind(cond, pair))


@pytest.mark.parametrize("op", list(OPS))
@pytest.mark.parametrize("jt", [P.JoinType.LEFT_SEMI, P.JoinType.LEFT_ANTI])
def test_semi_anti_condition_matches_oracle(op, jt):
    probe, build, nulls = _data()
    sess, ps, bs = _session(probe, build, nulls)
    out = sess.collect(P.bind_plan(_plan(ps, bs, jt, op)))
    match = _oracle_match(probe, build, nulls, op)
    keep = match if jt == P.JoinType.LEFT_SEMI else ~match
    expect = sorted(probe["tag"][keep].tolist())
    assert sorted(out["tag"].tolist()) == expect


@pytest.mark.parametrize("op", ["ne", "gt"])
def test_orientation_flip(op):
    probe, build, nulls = _data(seed=11)
    sess, ps, bs = _session(probe, build, nulls)
    out = sess.collect(P.bind_plan(
        _plan(ps, bs, P.JoinType.LEFT_SEMI, op, orientation="build_right")))
    match = _oracle_match(probe, build, nulls, op)
    assert sorted(out["tag"].tolist()) == sorted(probe["tag"][match].tolist())


def test_fast_path_equals_generic_path():
    probe, build, nulls = _data(seed=23)
    for jt in (P.JoinType.LEFT_SEMI, P.JoinType.LEFT_ANTI):
        for op in OPS:
            sess, ps, bs = _session(probe, build, nulls)
            fast = sess.collect(P.bind_plan(_plan(ps, bs, jt, op)))
            old = CONF.get(JOIN_SEMI_MINMAX)
            try:
                CONF.set(JOIN_SEMI_MINMAX, False)
                sess2, _, _ = _session(probe, build, nulls)
                generic = sess2.collect(P.bind_plan(_plan(ps, bs, jt, op)))
            finally:
                CONF.set(JOIN_SEMI_MINMAX, old)
            assert sorted(fast["tag"].tolist()) == sorted(
                generic["tag"].tolist()), (jt, op)


def test_existence_join_condition():
    probe, build, nulls = _data(seed=31, n_probe=1500, n_build=4000)
    sess, ps, bs = _session(probe, build, nulls)
    plan = _plan(ps, bs, P.JoinType.EXISTENCE, "ne")
    out = sess.collect(P.bind_plan(plan))
    match = _oracle_match(probe, build, nulls, "ne")
    # existence schema: probe columns + bool; find the bool column
    bool_col = [k for k in out if k not in ("pk", "pv", "tag")
                and not k.endswith("__valid")]
    assert len(bool_col) == 1
    vals = out[bool_col[0]]
    got = {int(t): bool(e) for t, e in zip(out["tag"], vals)}
    expect = {int(t): bool(m) for t, m in zip(probe["tag"], match)}
    assert got == expect


def test_compound_condition_falls_back():
    """A conjunction can't decompose into independent min/max exists — the
    kernel must take the generic pair path and still match the oracle."""
    probe, build, nulls = _data(seed=41, n_probe=800, n_build=1500)
    sess, ps, bs = _session(probe, build, nulls)
    pair = T.Schema(list(ps.fields) + list(bs.fields))
    cond = E.bind((E.col("bv") != E.col("pv")) & (E.col("bv") > E.lit(0, T.INT64)), pair)
    plan = P.HashJoin(
        P.Scan(table="probe", source_schema=ps),
        P.Scan(table="build", source_schema=bs),
        (E.bind(E.col("pk"), ps),), (E.bind(E.col("bk"), bs),),
        P.JoinType.LEFT_SEMI, "right", condition=cond)
    out = sess.collect(P.bind_plan(plan))
    # oracle: exists b in group with bv != pv and bv > 0
    from collections import defaultdict

    groups = defaultdict(list)
    bkn = nulls.get("bk", np.zeros(len(build["bk"]), bool))
    bvn = nulls.get("bv", np.zeros(len(build["bv"]), bool))
    for k, v, kn, vn in zip(build["bk"], build["bv"], bkn, bvn):
        if not kn and not vn:
            groups[int(k)].append(int(v))
    pkn = nulls.get("pk", np.zeros(len(probe["pk"]), bool))
    pvn = nulls.get("pv", np.zeros(len(probe["pv"]), bool))
    expect = []
    for t, k, v, kn, vn in zip(probe["tag"], probe["pk"], probe["pv"], pkn, pvn):
        if kn or vn:
            continue
        if any(b != int(v) and b > 0 for b in groups.get(int(k), ())):
            expect.append(int(t))
    assert sorted(out["tag"].tolist()) == sorted(expect)
