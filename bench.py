"""Headline benchmark: TPC-H Q1 (scan → filter → 8-agg group-by → sort).

Runs on the default backend (the real TPU chip under the driver). Prints ONE
JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline anchor (vs_baseline denominator): 100M rows/s — Comet-class
single-node Q1 throughput derived from the reference's published TPC-DS
SF1000 runs (637.5s over 103 queries on 512 cores ≈ aggregate scan rates in
the tens of millions of rows/s per 16-core executor; see BASELINE.md).
vs_baseline > 1.0 means one TPU chip beats one Comet executor-node.
"""

import json
import os
import time

import numpy as np


def main() -> None:
    import jax

    # Persistent compile cache: the tunnel XLA:TPU compile of Q1 costs
    # ~10-40 min; cache hits across processes make reruns instant when the
    # backend honors it (harmless otherwise).
    try:
        os.makedirs("/tmp/jax_cache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from datafusion_comet_tpu import types as T
    from datafusion_comet_tpu.exec.engine import Session
    from datafusion_comet_tpu.models import tpch

    sf = float(os.environ.get("BENCH_SF", "1"))
    reps = int(os.environ.get("BENCH_REPS", "5"))

    t_gen = time.time()
    cache = f"/tmp/tpch_lineitem_sf{sf:g}_v{getattr(tpch, 'DATA_VERSION', 1)}.npz"
    if os.path.exists(cache):
        data = dict(np.load(cache, allow_pickle=True))
    else:
        data = tpch.generate_table("lineitem", sf)
        try:
            np.savez(cache, **data)
        except Exception:
            pass
    n_rows = len(data["l_orderkey"])
    sess = Session()
    sess.register_numpy("lineitem", data, tpch.SCHEMAS["lineitem"])
    gen_s = time.time() - t_gen

    plan = tpch.q1()
    import jax.numpy as jnp

    bound, fn = sess.compile(plan)

    # Force full-pipeline completion by reducing every output column to a
    # scalar checksum INSIDE the jitted step and pulling only those bytes —
    # measuring compute, not tunnel/PCIe egress of the full result (the
    # result itself stays device-resident, as it would between operators).
    # The tunnel adds ~50-100 ms of per-call latency, so the pipeline runs
    # BENCH_INNER times inside one jitted call: each iteration's input is
    # perturbed by a value data-dependent on the previous checksums (always
    # zero at runtime, but XLA cannot prove it → no hoisting/CSE), and the
    # per-iteration time is total/inner — sustained throughput, the number
    # that matters for a resident serving pipeline.
    inner = int(os.environ.get("BENCH_INNER", "8"))

    def one(tables):
        out, ovf = fn(tables)
        sums = [ovf.astype(jnp.int64), jnp.sum(out.row_mask.astype(jnp.int64))]
        for c in out.columns:
            sums.append(jnp.sum(jnp.where(out.row_mask, c.data.astype(jnp.float64)
                                          if c.data.ndim == 1 else c.data.sum(-1).astype(jnp.float64), 0.0)))
        return jnp.stack([s.astype(jnp.float64) for s in sums])

    def step(tables):
        first = one(tables)

        def body(_, carry):
            # bump is 0 at runtime but depends on the previous result
            bump = jnp.where(jnp.isinf(carry[1]), 1, 0).astype(jnp.int64)
            li = tables["lineitem"]
            col = li.columns[0]
            import dataclasses as _dc

            perturbed = dict(tables)
            perturbed["lineitem"] = _dc.replace(
                li, columns=(_dc.replace(col, data=col.data + bump),) + li.columns[1:]
            )
            return one(perturbed)

        return jax.lax.fori_loop(0, inner - 1, body, first) if inner > 1 else first

    step_j = jax.jit(step)

    def sync():
        cs = np.asarray(step_j(sess.tables))
        assert not cs[0], "join/group capacity overflow during bench"
        return cs

    t_c = time.time()
    checksum = sync()  # compile + first run
    compile_s = time.time() - t_c

    times = []
    for _ in range(reps):
        t0 = time.time()
        sync()
        times.append((time.time() - t0) / inner)
    best = min(times)
    rows_per_s = n_rows / best
    del checksum

    baseline_rows_per_s = 100e6
    print(
        json.dumps(
            {
                "metric": f"tpch_q1_sf{sf:g}_rows_per_s",
                "value": round(rows_per_s, 1),
                "unit": "rows/s",
                "vs_baseline": round(rows_per_s / baseline_rows_per_s, 4),
                "detail": {
                    "rows": n_rows,
                    "best_s": round(best, 4),
                    "inner_iters": inner,
                    "times_s": [round(t, 4) for t in times],
                    "compile_s": round(compile_s, 1),
                    "datagen_s": round(gen_s, 1),
                    "backend": jax.default_backend(),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
