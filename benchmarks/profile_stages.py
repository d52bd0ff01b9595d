
#!/usr/bin/env python
"""Per-stage wall-clock profiler: where did a query's time go?

Each compile stage (``Session._plan_stages``) is its own XLA program, so
stage-level attribution is free — compile each stage, run it ``--reps``
times with ``block_until_ready``, and report per-stage compile + best run
seconds plus a one-line shape summary (the staged analog of the reference's
per-operator elapsed metrics, metrics/utils.rs:30).

Usage:
    python benchmarks/profile_stages.py --suite tpch --sf 1 --queries q18,q9
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


def _describe(plan) -> str:
    """One-line stage summary: node types bottom-up with scan capacities."""
    from datafusion_comet_tpu.ir import plan as P

    parts = []

    def walk(n):
        for c in n.children():
            walk(c)
        nm = type(n).__name__
        if isinstance(n, P.Scan):
            parts.append(f"Scan[{n.table}]")
        elif isinstance(n, (P.HashJoin, P.SortMergeJoin)):
            parts.append(f"{nm}[{getattr(n, 'join_type', '?')}]")
        elif isinstance(n, P.HashAggregate):
            parts.append(f"Agg[{len(n.group_exprs)}k/{len(n.agg_exprs)}a]")
        else:
            parts.append(nm)

    walk(plan)
    return " > ".join(parts)


def profile_query(sess, plan, reps: int):
    import jax

    stage_list = sess._plan_stages(plan)
    temp_names = [n for n, _ in stage_list if n]
    stages = []
    try:
        for name, sub in stage_list:
            desc = _describe(sub)
            t0 = time.time()
            out, fn = sess._execute_retry(sub, return_fn=True)
            jax.block_until_ready(out.row_mask)
            compile_s = time.time() - t0
            times = []
            for _ in range(reps):
                t1 = time.time()
                res, _ovf = fn(sess.tables)
                jax.block_until_ready(res.row_mask)
                times.append(time.time() - t1)
            import numpy as np

            live = int(np.asarray(out.num_rows()))
            if name:
                out2, _shrink = sess._aqe_shrink(out)
                sess.tables[name] = out2
            stages.append({
                "stage": name or "root",
                "compile_s": round(compile_s, 1),
                "best_s": round(min(times), 4),
                "times_s": [round(t, 4) for t in times],
                "capacity": out.capacity,
                "live_rows": live,
                "plan": desc,
            })
            print(f"  {name or 'root'}: compile {compile_s:.1f}s "
                  f"best {min(times):.3f}s cap {out.capacity} live {live}",
                  flush=True)
            print(f"    {desc}", flush=True)
    finally:
        for n in temp_names:
            sess.tables.pop(n, None)
    return stages


def main() -> None:
    import faulthandler

    faulthandler.dump_traceback_later(900, repeat=True)
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", choices=["tpch", "tpcds"], default="tpch")
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import os

    import numpy as np
    import jax

    try:
        os.makedirs("/tmp/jax_cache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from datafusion_comet_tpu.exec.engine import Session

    if args.suite == "tpch":
        from datafusion_comet_tpu.models import tpch as model
    else:
        from datafusion_comet_tpu.models import tpcds as model

    sess = Session()
    t0 = time.time()
    for t in model.SCHEMAS:
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
        sess.register_numpy(t, data, model.SCHEMAS[t])
    print(f"datagen+stage {time.time() - t0:.1f}s", flush=True)

    results = {}
    for name in [q.strip() for q in args.queries.split(",") if q.strip()]:
        print(name, flush=True)
        make = model.QUERIES[name]
        plan = make(sess) if "session" in make.__code__.co_varnames[:1] else make()
        try:
            results[name] = profile_query(sess, plan, args.reps)
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"  failed: {e}", flush=True)
        if args.out:
            with open(args.out, "w") as f:
                json.dump({"suite": args.suite, "sf": args.sf,
                           "backend": jax.default_backend(),
                           "queries": results}, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
