"""approx_percentile: Spark QuantileSummaries contract (reference:
agg_funcs/approx_percentile). SINGLE mode is exact (element at rank
ceil(p*n)); distributed PARTIAL/FINAL merges K-sample sketches with rank
error ~ n/(2K)."""

import numpy as np
import pytest

from datafusion_comet_tpu import types as T
from datafusion_comet_tpu.exec.engine import Session
from datafusion_comet_tpu.ir import expr as E
from datafusion_comet_tpu.ir import plan as P


def _agg(p, acc=None, name="ap"):
    extra = (E.lit(p, T.FLOAT64),) + ((E.lit(acc, T.INT64),) if acc else ())
    return E.AggExpr(E.AggFunc.APPROX_PERCENTILE, E.col("v"), name, extra=extra)


def _run(data, group=None, p=0.5, mode_single=True):
    fields = [T.Field("v", T.FLOAT64 if data["v"].dtype == np.float64 else T.INT64)]
    if group is not None:
        fields.insert(0, T.Field("g", T.INT64))
    s = T.Schema(fields)
    sess = Session()
    sess.register_numpy("t", data, s)
    groups = (E.col("g"),) if group is not None else ()
    agg = P.HashAggregate(P.Scan(table="t", source_schema=s), groups,
                          (_agg(p),), P.AggMode.SINGLE)
    return sess, P.bind_plan(agg)


def spark_rank_value(vals, p):
    """Element at rank ceil(p*n), 1-indexed (QuantileSummaries.query target)."""
    v = np.sort(vals)
    n = len(v)
    k = min(max(int(np.ceil(p * n)) - 1, 0), n - 1)
    return v[k]


class TestSingleExact:
    @pytest.mark.parametrize("p", [0.0, 0.25, 0.5, 0.9, 1.0])
    def test_ungrouped_exact(self, p):
        rng = np.random.default_rng(7)
        v = rng.normal(size=5001)
        sess, plan = _run({"v": v}, p=p)
        out = sess.collect(plan)
        assert out["ap"][0] == spark_rank_value(v, p)

    def test_grouped_exact_int(self):
        rng = np.random.default_rng(1)
        g = rng.integers(0, 5, 4000)
        v = rng.integers(-1000, 1000, 4000)
        sess, plan = _run({"g": g.astype(np.int64), "v": v.astype(np.int64)},
                          group=True, p=0.5)
        out = sess.collect(plan)
        got = dict(zip(out["g"].tolist(), out["ap"].tolist()))
        for gg in range(5):
            assert got[gg] == spark_rank_value(v[g == gg], 0.5), gg

    def test_empty_group_null(self):
        sess, plan = _run({"v": np.array([], np.float64)}, p=0.5)
        out = sess.collect(plan)
        assert not out["ap__valid"][0]


class TestDistributedSketch:
    def test_partial_final_within_rank_error(self):
        """8-device split: partial sketch per shard, merged final within
        sketch rank error."""
        import jax

        from datafusion_comet_tpu.parallel.executor import DistributedSession
        from datafusion_comet_tpu.parallel.mesh import make_mesh

        rng = np.random.default_rng(5)
        n = 40_000
        g = rng.integers(0, 4, n)
        v = rng.normal(size=n) * 100
        s = T.Schema([T.Field("g", T.INT64), T.Field("v", T.FLOAT64)])
        dsess = DistributedSession(make_mesh(len(jax.devices())))
        dsess.register_numpy("t", {"g": g.astype(np.int64), "v": v}, s)
        plan = P.bind_plan(P.HashAggregate(
            P.Scan(table="t", source_schema=s), (E.col("g"),), (_agg(0.5),),
            P.AggMode.SINGLE))
        out = dsess.collect(plan)
        got = dict(zip(out["g"].tolist(), np.asarray(out["ap"]).tolist()))
        for gg in range(4):
            vals = np.sort(v[g == gg])
            nv = len(vals)
            truth_rank = int(np.ceil(0.5 * nv)) - 1
            # rank error bound: a couple of sketch slots
            tol = max(int(3 * nv / 512), 2)
            window = vals[max(truth_rank - tol, 0): truth_rank + tol + 1]
            assert window[0] <= got[gg] <= window[-1], (gg, got[gg], window[0], window[-1])


class TestSketchMergeUnits:
    def test_partial_merge_recompression_roundtrip(self):
        """PARTIAL → PARTIAL_MERGE → FINAL pipeline equals a direct
        PARTIAL → FINAL within a slot of rank error."""
        import jax.numpy as jnp

        from datafusion_comet_tpu.exec.batch import from_numpy
        from datafusion_comet_tpu.exec.operators import aggregate as AGG
        from datafusion_comet_tpu.ir.plan import AggMode

        rng = np.random.default_rng(3)
        v = rng.normal(size=20_000)
        s = T.Schema([T.Field("v", T.FLOAT64)])
        a = _agg(0.9)
        ab = E.AggExpr(a.func, E.bind(E.col("v"), s), a.out_name, extra=a.extra)
        halves = [from_numpy({"v": v[:10_000]}, s), from_numpy({"v": v[10_000:]}, s)]
        states = [AGG.hash_aggregate(b, (), (ab,), AggMode.PARTIAL, 8, None)
                  for b in halves]
        st_schema = T.Schema(AGG.state_fields(ab))
        for st in states:
            assert st.schema is None or True
        # stack the two partial states into one batch and FINAL-merge
        import jax

        cols = []
        for i in range(len(states[0].columns)):
            a0, a1 = states[0].columns[i], states[1].columns[i]
            cols.append(type(a0)(
                jnp.concatenate([a0.data, a1.data]),
                jnp.concatenate([a0.validity, a1.validity]),
                None if a0.lengths is None else jnp.concatenate([a0.lengths, a1.lengths]),
                a0.dtype))
        merged_in = type(states[0])(
            tuple(cols), jnp.concatenate([states[0].row_mask, states[1].row_mask]),
            st_schema)
        ab_final = E.AggExpr(ab.func, ab.child, ab.out_name, extra=ab.extra)
        out = AGG.hash_aggregate(merged_in, (), (ab_final,), AggMode.FINAL, 8, None)
        got = float(np.asarray(out.columns[0].data)[0])
        vals = np.sort(v)
        truth_rank = int(np.ceil(0.9 * len(vals))) - 1
        tol = max(int(3 * len(vals) / 512), 2)
        lo, hi = vals[truth_rank - tol], vals[min(truth_rank + tol, len(vals) - 1)]
        assert lo <= got <= hi, (got, lo, hi)

    def test_accuracy_validation(self):
        with pytest.raises(ValueError):
            sess, plan = _run({"v": np.ones(10)}, p=1.5)
            sess.collect(plan)


def test_percentile_array_of_percentages():
    """percentile(x, array(p...)) returns ARRAY<double> (Spark semantics)."""
    import numpy as np

    rng = np.random.default_rng(8)
    v = rng.normal(size=3001)
    s = T.Schema([T.Field("v", T.FLOAT64)])
    sess = Session()
    sess.register_numpy("t", {"v": v}, s)
    a = E.AggExpr(E.AggFunc.PERCENTILE, E.col("v"), "p",
                  extra=(E.Literal((0.25, 0.5, 0.9), T.list_(T.FLOAT64, 3)),))
    plan = P.bind_plan(P.HashAggregate(P.Scan(table="t", source_schema=s),
                                       (), (a,), P.AggMode.SINGLE))
    out = sess.collect(plan)
    got = out["p"][0]
    want = [np.percentile(v, q, method="linear") for q in (25, 50, 90)]
    np.testing.assert_allclose(got, want, rtol=1e-12)
