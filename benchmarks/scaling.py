#!/usr/bin/env python
"""Multi-chip scaling harness: the same queries at 1/2/4/8 mesh devices.

Extends __graft_entry__.dryrun_multichip into a measuring harness: for each
mesh size it compiles the FULL distributed step (broadcast joins, two-phase
aggregation, hash/range all-to-all exchanges), runs it, and records
wall-clock plus the exchange structure of the distributed plan. On real
hardware the mesh spans chips over ICI; here the driver's 8 virtual CPU
devices validate the sharding + collectives and measure scaling *shape*
(reference north star: BASELINE.json "scaling eff 1→N hosts").

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py --sf 0.05 --reps 3 \
        --out benchmarks/results/scaling-cpu-mesh.json
"""

from __future__ import annotations

import argparse
import json
import time


def exchange_profile(plan) -> dict:
    """Count exchange/broadcast nodes by kind in a distributed plan."""
    from datafusion_comet_tpu.ir import plan as P
    from datafusion_comet_tpu.parallel.executor import Broadcast

    prof = {"hash": 0, "range": 0, "single": 0, "round_robin": 0, "broadcast": 0}

    def walk(n):
        if isinstance(n, Broadcast):
            prof["broadcast"] += 1
        elif isinstance(n, P.ShuffleExchange):
            prof[n.partitioning] = prof.get(n.partitioning, 0) + 1
        for c in n.children():
            walk(c)

    walk(plan)
    return prof


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.05)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--queries", default="q1,q3,q6,q12")
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    if jax.default_backend() != "tpu" and len(jax.devices()) < 8:
        raise SystemExit("need 8 devices; set XLA_FLAGS=--xla_force_host_platform_device_count=8")

    import numpy as np

    from datafusion_comet_tpu.models import tpch
    from datafusion_comet_tpu.parallel.executor import DistributedSession
    from datafusion_comet_tpu.parallel.mesh import make_mesh

    qnames = [q.strip() for q in args.queries.split(",")]
    sizes = [int(s) for s in args.sizes.split(",")]
    tables = ("lineitem", "orders", "customer", "part", "supplier", "nation", "region", "partsupp")
    data = {t: tpch.generate_table(t, args.sf) for t in tables}

    results: dict = {}
    for n in sizes:
        mesh = make_mesh(n)
        sess = DistributedSession(mesh)
        for t in tables:
            sess.register_numpy(t, data[t], tpch.SCHEMAS[t])
        per_q = {}
        for qn in qnames:
            plan = tpch.QUERIES[qn]()
            t0 = time.time()
            # the same skew re-plan loop as DistributedSession.execute, but
            # keeping the final compiled fn for the timing reps
            slack, fanout, scale = 2, 4, 1
            for attempt in range(4):
                dplan, fn = sess.compile(plan, shuffle_slack=slack,
                                         join_fanout=fanout, agg_scale=scale)
                out, ovf = fn(sess.tables)
                jax.block_until_ready(out.row_mask)
                if not bool(np.asarray(ovf).any()):
                    break
                slack *= 2
                fanout *= 4
                scale *= 4
            compile_s = time.time() - t0
            assert not bool(np.asarray(ovf).any()), f"{qn}@{n}: overflow"
            times = []
            for _ in range(args.reps):
                t1 = time.time()
                out, _ = fn(sess.tables)
                np.asarray(out.row_mask)  # force completion
                times.append(time.time() - t1)
            per_q[qn] = {
                "best_s": round(min(times), 4),
                "times_s": [round(t, 4) for t in times],
                "compile_s": round(compile_s, 1),
                "exchanges": exchange_profile(dplan),
            }
            print(f"n={n} {qn} best={per_q[qn]['best_s']}s "
                  f"exchanges={per_q[qn]['exchanges']}", flush=True)
        results[str(n)] = per_q

    # scaling efficiency vs the 1-device run: eff(n) = t1 / (n * tn)
    eff = {}
    if "1" in results:
        for qn in qnames:
            t1 = results["1"][qn]["best_s"]
            eff[qn] = {
                str(n): round(t1 / (n * results[str(n)][qn]["best_s"]), 3)
                for n in sizes if str(n) in results
            }

    doc = {
        "sf": args.sf,
        "backend": __import__("jax").default_backend(),
        "devices": len(__import__("jax").devices()),
        "mesh_sizes": sizes,
        "queries": results,
        "scaling_efficiency": eff,
        "note": ("virtual CPU mesh: validates shardings/collectives and "
                 "measures scaling shape; absolute numbers are not TPU perf"),
    }
    out = json.dumps(doc, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out)
    print(out)


if __name__ == "__main__":
    main()
