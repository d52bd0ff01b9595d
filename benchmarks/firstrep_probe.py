#!/usr/bin/env python
"""First-rep-inflation attribution probe (VERDICT r4 weak #3 / item 7).

The r4 TPC-DS serial re-time shows ~25 of 95 queries with a flat ~5-8 s
first-rep excess (q91 [6.07, 0.034, 0.033]) that correlates with NEITHER
compile_s (r = -0.15) nor best_s (r = 0.18) across the 95 queries — so it
is not program size and not data volume. Hypotheses:

  H1 device program load/eviction: the first execution after OTHER
     programs ran must re-upload the executable through the tunnel;
     revisiting a query after interleaved foreign work is slow again.
  H2 one-time per-build cost (host-side tracing residue, constant
     staging): revisits stay fast no matter what ran in between.

Discriminating schedule: build A, B, C; then time A,B,C,A,B,C,A with
reps per visit. H1 predicts rep1 of every REVISIT is inflated; H2
predicts only the first visit is.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/firstrep_probe.py \
        --queries q91,q21,q94 --out benchmarks/results/firstrep-attrib-r5.json
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="q91,q21,q94")
    ap.add_argument("--sf", type=float, default=0.2)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import os

    import numpy as np
    import jax

    try:
        os.makedirs("/tmp/jax_cache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass

    from datafusion_comet_tpu.exec.engine import Session
    from datafusion_comet_tpu.models import tpcds as model
    from tpcbench import checksum_step

    wanted = args.queries.split(",")
    sess = Session()
    for t in model.SCHEMAS:
        cache = (f"/tmp/tpcds_{t}_sf{args.sf:g}"
                 f"_v{getattr(model, 'DATA_VERSION', 1)}.npz")
        data = (dict(np.load(cache, allow_pickle=True)) if os.path.exists(cache)
                else model.generate_table(t, args.sf))
        sess.register_numpy(t, data, model.SCHEMAS[t])
    print("staged", flush=True)

    steps = {}
    for name in wanted:
        make = model.QUERIES[name]
        plan = make(sess) if "session" in make.__code__.co_varnames[:1] else make()
        t0 = time.time()
        step = checksum_step(sess, plan)
        np.asarray(step())
        steps[name] = step
        print(f"compiled {name} {time.time() - t0:.1f}s", flush=True)

    schedule = wanted * 2 + wanted[:1]
    visits = []
    for vi, name in enumerate(schedule):
        times = []
        for _ in range(args.reps):
            t1 = time.time()
            np.asarray(steps[name]())
            times.append(round(time.time() - t1, 4))
        visits.append({"visit": vi, "query": name, "times_s": times})
        print(name, times, flush=True)

    # verdict: mean rep1 excess on revisits vs first visits
    first = {}
    revisit_excess, firstvisit_excess = [], []
    for v in visits:
        ex = v["times_s"][0] - min(v["times_s"])
        if v["query"] in first:
            revisit_excess.append(ex)
        else:
            first[v["query"]] = True
            firstvisit_excess.append(ex)
    doc = {
        "sf": args.sf,
        "schedule": schedule,
        "visits": visits,
        "first_visit_rep1_excess_s": [round(x, 4) for x in firstvisit_excess],
        "revisit_rep1_excess_s": [round(x, 4) for x in revisit_excess],
        "verdict": ("H1 program reload/eviction"
                    if revisit_excess and
                    (sum(revisit_excess) / len(revisit_excess)) > 0.5
                    else "H2 one-time per-build cost"),
    }
    line = json.dumps(doc, indent=1)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
