
#!/usr/bin/env python
"""TPC benchmark driver: per-query wall-clock timings as JSON.

The analog of the reference's benchmarks/tpc/tpcbench.py (per-query timings
JSON consumed by generate-comparison.py). Runs every TPC-H and/or TPC-DS
query in models/ against generated data on the current backend and writes
``{suite, sf, backend, queries: {name: {best_s, times_s, rows}}}``.

Usage:
    python benchmarks/tpcbench.py --suite tpch --sf 0.1 --reps 3 \
        --out tpch-results.json [--queries q1,q6]

Timing forces full-pipeline completion via in-graph checksums (the bench.py
discipline — measures compute, not result egress).
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


def checksum_step(sess, plan):
    """Compile via Session.prepare() — the staged path that caps joins per
    XLA program (q5/q18 never compiled as one giant program on the tunnel
    TPU) — and force completion by pulling an in-graph checksum."""
    import jax
    import jax.numpy as jnp

    run = sess.prepare(plan)  # warm-up executes once, settling capacities

    def summarize(out):
        sums = [jnp.sum(out.row_mask.astype(jnp.int64)).astype(jnp.float64)]
        for c in out.columns:
            d = c.data
            v = d.astype(jnp.float64) if d.ndim == 1 else d.sum(-1).astype(jnp.float64)
            sums.append(jnp.sum(jnp.where(out.row_mask, v, 0.0)))
        return jnp.stack(sums)

    jitted = jax.jit(summarize)

    def checked(_tables=None):
        import numpy as _np

        return _np.asarray(jitted(run()))

    return checked


def main() -> None:
    import faulthandler

    faulthandler.dump_traceback_later(600, repeat=True)  # stack dumps while
    # a tunnel compile is pending: distinguishes slow-compile from deadlock
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", choices=["tpch", "tpcds"], default="tpch")
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--queries", default="")
    ap.add_argument("--out", default="")
    ap.add_argument("--backend", choices=["default", "cpu"], default="default",
                    help="cpu forces the CPU backend (the axon plugin "
                    "ignores JAX_PLATFORMS; see tests/conftest.py)")
    ap.add_argument("--prune-stage", action="store_true",
                    help="stage only the columns the selected queries "
                    "reference (union over queries + their scalar "
                    "subqueries) — the SF10 HBM-fit mode: full SF10 "
                    "lineitem is ~8 GB staged, the q3/q5 projection ~2 GB")
    ap.add_argument("--compile-workers", type=int, default=1,
                    help="overlap per-query trace+compile in N threads "
                    "(backend_compile releases the GIL during the remote "
                    "XLA compile, so tunnel compiles pipeline); timing "
                    "runs stay serial")
    args = ap.parse_args()

    import os

    import numpy as np
    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    try:  # persistent compile cache: tunnel TPU compiles cost minutes
        os.makedirs("/tmp/jax_cache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from datafusion_comet_tpu.exec.engine import Session

    if args.suite == "tpch":
        from datafusion_comet_tpu.models import tpch as model

        tables = list(model.SCHEMAS)
    else:
        from datafusion_comet_tpu.models import tpcds as model

        tables = list(model.SCHEMAS)

    sess = Session()
    wanted = [q.strip() for q in args.queries.split(",") if q.strip()] or sorted(
        model.QUERIES, key=lambda n: int(n[1:])
    )

    keep_cols = None  # table -> set of column names (None = all)
    if args.prune_stage:
        # Build every selected plan (plus its registered scalar subqueries)
        # with NO data staged — plans carry static schemas — and take each
        # pruned Scan's projection. Unioned per table, this is the minimal
        # column set the whole run touches; registration below stages only
        # those (the HBM-fit mode for SF10+: the projection is what the
        # reference pushes into parquet_exec.rs's projection vector).
        from datafusion_comet_tpu.ir import plan as Pn
        from datafusion_comet_tpu.ir.pruning import prune_columns

        keep_cols = {}

        def note_scans(p):
            if isinstance(p, Pn.Scan):
                if p.projection is None:
                    keep_cols[p.table] = None
                elif keep_cols.get(p.table, set()) is not None:
                    keep_cols.setdefault(p.table, set()).update(p.projection)
            for c in p.children():
                note_scans(c)

        for name in wanted:
            make = model.QUERIES[name]
            plan = make(sess) if "session" in make.__code__.co_varnames[:1] else make()
            note_scans(prune_columns(plan))
        for _sid, (sub, _col) in getattr(sess, "_subqueries", {}).items():
            note_scans(prune_columns(sub))
        sess = Session()  # fresh: subqueries re-register at build time
        print("prune-stage:", {t: (len(v) if v is not None else "all")
                               for t, v in keep_cols.items()}, flush=True)

    t0 = time.time()
    for t in tables:
        if keep_cols is not None and t not in keep_cols:
            continue  # no selected query touches this table
        cache = (f"/tmp/{args.suite}_{t}_sf{args.sf:g}"
                 f"_v{getattr(model, 'DATA_VERSION', 1)}.npz")
        if os.path.exists(cache):
            data = dict(np.load(cache, allow_pickle=True))
        else:
            data = model.generate_table(t, args.sf)
            try:
                np.savez(cache, **data)
            except Exception:
                pass
        print(f"gen {t} {time.time() - t0:.1f}s", flush=True)
        schema = model.SCHEMAS[t]
        if keep_cols is not None and keep_cols.get(t) is not None:
            from datafusion_comet_tpu import types as T_

            keep = keep_cols[t]
            schema = T_.Schema([f for f in schema.fields if f.name in keep])
            data = {k: v for k, v in data.items()
                    if k in keep or k.endswith("__valid")}
        sess.register_numpy(t, data, schema)
        print(f"staged {t} {time.time() - t0:.1f}s", flush=True)
    gen_s = time.time() - t0
    results = {}

    def build(name):
        make = model.QUERIES[name]
        plan = make(sess) if "session" in make.__code__.co_varnames[:1] else make()
        tc = time.time()
        step = checksum_step(sess, plan)
        cs = np.asarray(step())  # compile + first run
        return step, cs, time.time() - tc

    def write_partial():
        if args.out:  # incremental write: hours-long TPU compile runs may
            with open(args.out, "w") as f:  # be cut short — keep what we have
                f.write(json.dumps({
                    "suite": args.suite, "sf": args.sf,
                    "backend": jax.default_backend(), "partial": True,
                    "queries": results,
                }, indent=2))

    def time_query(name, step, cs, compile_s):
        times = []
        for _ in range(args.reps):
            t1 = time.time()
            np.asarray(step())
            times.append(time.time() - t1)
        prev = results.get(name, {})
        best = min(times + ([prev["best_s"]] if "best_s" in prev else []))
        results[name] = {
            "best_s": round(best, 4),
            "times_s": [round(t, 4) for t in times],
            "compile_s": round(compile_s, 1),
            "rows": int(cs[0]),
        }
        print(name, results[name]["best_s"], flush=True)
        write_partial()

    built = {}
    if args.compile_workers > 1:
        from concurrent.futures import (ThreadPoolExecutor, as_completed)

        with ThreadPoolExecutor(args.compile_workers) as ex:
            futs = {ex.submit(build, n): n for n in wanted}
            for fu in as_completed(futs):
                n = futs[fu]
                try:
                    built[n] = fu.result()
                    print(f"compiled {n} {built[n][2]:.1f}s", flush=True)
                    # time NOW so a cut-short run still has a measured
                    # number for every compiled query (other builds are
                    # remote compiles — chip contention is only the
                    # concurrent warm-up executions; the clean serial
                    # pass below re-times and keeps the min)
                    time_query(n, *built[n])
                except Exception as e:
                    built[n] = e
                    results[n] = {"error": f"{type(e).__name__}: {e}"}
                    print(f"compile-failed {n}: {type(e).__name__}: {e}", flush=True)
                    write_partial()

    for name in wanted:
        try:
            if name in built:
                if isinstance(built[name], Exception):
                    raise built[name]
                step, cs, compile_s = built[name]
            else:
                step, cs, compile_s = build(name)
            time_query(name, step, cs, compile_s)
        except Exception as e:  # keep going; report the failure
            results[name] = {"error": f"{type(e).__name__}: {e}"}
            print(name, results[name].get("error"), flush=True)
            write_partial()

    doc = {
        "suite": args.suite,
        "sf": args.sf,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "datagen_s": round(gen_s, 1),
        "queries": results,
        "total_best_s": round(sum(r.get("best_s", 0) for r in results.values()), 3),
        # first-rep total alongside best-of: the number a user sees on the
        # FIRST warm run — a large gap vs total_best_s means residual
        # recompiles/host work inside the measured region (r4 weak item 3)
        "total_first_s": round(sum(r["times_s"][0] for r in results.values()
                                   if r.get("times_s")), 3),
    }
    out = json.dumps(doc, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out)
    print(out)


if __name__ == "__main__":
    main()
