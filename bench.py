"""Headline benchmark: TPC-H Q1 (scan → filter → 8-agg group-by → sort).

Runs on the default backend (the real TPU chip under the driver). Prints ONE
JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline anchor (vs_baseline denominator): 100M rows/s — Comet-class
single-node Q1 throughput derived from the reference's published TPC-DS
SF1000 runs (637.5s over 103 queries on 512 cores ≈ aggregate scan rates in
the tens of millions of rows/s per 16-core executor; see BASELINE.md).
vs_baseline > 1.0 means one TPU chip beats one Comet executor-node.

Cold-cache survival (round-4 fix for the r3 rc=124 timeout): the benchmark
runs as a PARENT that forks time-boxed child attempts. Attempt 1 is the full
run (BENCH_SF, default 1). If the tunnel XLA compile eats the attempt budget
(fresh-cache compiles have taken 25+ min after engine changes), the child is
killed and a smaller-SF attempt runs — a fresh compile over smaller shapes —
so the driver ALWAYS records a genuine measured rows/s number within its
timeout. Reference anchor: one createPlan reused across batches
(/root/reference jni_api.rs:366) — the analog here is the persistent XLA
compile cache (/tmp/jax_cache) warmed by any prior run of the same program.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


def child_main() -> None:
    import jax

    # Persistent compile cache: the tunnel XLA:TPU compile of Q1 costs
    # minutes when fresh; cache hits across processes make reruns instant
    # when the backend honors it (harmless otherwise).
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
        ),
        flush=True,
    )


def _run_attempt(sf: float, budget_s: float):
    """Fork a time-boxed child attempt; return its JSON line or None."""
    env = dict(os.environ)
    env["BENCH_CHILD"] = "1"
    env["BENCH_SF"] = f"{sf:g}"
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        env=env, start_new_session=True, text=True,
    )
    try:
        out, _ = proc.communicate(timeout=max(budget_s, 30))
    except subprocess.TimeoutExpired:
        # kill the exact process group we started (never by pattern)
        try:
            os.killpg(proc.pid, 9)
        except Exception:
            proc.kill()
        try:
            proc.communicate(timeout=15)
        except Exception:
            pass
        return None
    if proc.returncode != 0:
        return None
    for line in (out or "").splitlines():
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            try:
                return json.loads(line)
            except Exception:
                continue
    return None


def main() -> None:
    if os.environ.get("BENCH_CHILD"):
        child_main()
        return
    total = float(os.environ.get("BENCH_TOTAL_BUDGET_S", "3000"))
    sf0 = float(os.environ.get("BENCH_SF", "1"))
    t0 = time.time()
    remaining = lambda: total - (time.time() - t0)
    # attempt 1 gets the bulk; keep enough back that a smaller-shape fresh
    # compile can still finish (r1 evidence: SF1 fresh compile 1605 s; a
    # SF0.2 program is the same op graph over 4x smaller shapes)
    attempts = [
        (sf0, max(total - 900.0, 60.0)),
        (min(0.2, sf0), 600.0),
        (min(0.05, sf0), 280.0),
    ]
    seen = set()
    for sf, cap in attempts:
        if sf in seen:
            continue
        seen.add(sf)
        budget = min(cap, remaining() - 40.0)
        if budget < 30:
            break
        result = _run_attempt(sf, budget)
        if result is not None:
            print(json.dumps(result), flush=True)
            return
    raise SystemExit("bench: every attempt failed or timed out")


if __name__ == "__main__":
    main()
