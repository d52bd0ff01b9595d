
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

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


ICI_GBPS = 186.0  # v5e per-direction ICI link bandwidth model (2D torus
# link ≈ 1.6 Tbps aggregate / ~186 GB/s per direction per link); used only
# to MODEL exchange cost — the virtual CPU mesh cannot measure ICI, so the
# scaling json reports modeled collective time next to measured wall-clock
# (addresses the r3 'FLAT = ideal is under-evidenced' finding with an
# explicit cost account instead of an unfalsifiable flat curve).


def _row_bytes(schema) -> int:
    total = 1  # row mask bit ≈ 1 byte
    for f in schema.fields:
        dt = f.dtype
        if dt.is_binary:
            total += dt.byte_width + 5  # bytes + length + validity
        elif dt.is_wide_decimal:
            total += 17
        else:
            total += 9
    return total


def exchange_profile(plan, np_: int = 8) -> dict:
    """Exchange/broadcast census of a distributed plan: node counts per
    kind, estimated bytes crossing the interconnect, and modeled ICI time
    (all-to-all moves cap×(np-1)/np rows off-device; broadcast replicates
    cap×(np-1))."""
    from datafusion_comet_tpu.ir import plan as P
    from datafusion_comet_tpu.parallel.executor import Broadcast

    prof = {"hash": 0, "range": 0, "single": 0, "round_robin": 0,
            "broadcast": 0, "bytes_alltoall": 0, "bytes_broadcast": 0}

    def cap_of(n):
        sub = n.children()[0] if n.children() else n
        mg = getattr(sub, "max_groups", None)
        return mg or (1 << 16)

    def walk(n):
        if isinstance(n, Broadcast):
            prof["broadcast"] += 1
            if n.schema is not None:
                prof["bytes_broadcast"] += (
                    _row_bytes(n.schema) * cap_of(n) * (np_ - 1))
        elif isinstance(n, P.ShuffleExchange):
            prof[n.partitioning] = prof.get(n.partitioning, 0) + 1
            if n.schema is not None:
                prof["bytes_alltoall"] += int(
                    _row_bytes(n.schema) * cap_of(n) * (np_ - 1) / np_)
        for c in n.children():
            walk(c)

    walk(plan)
    prof["modeled_ici_ms"] = round(
        (prof["bytes_alltoall"] + prof["bytes_broadcast"]) / ICI_GBPS / 1e6, 3)
    return prof


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", choices=["tpch", "tpcds"], default="tpch")
    ap.add_argument("--sf", type=float, default=0.05)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--queries", default="q1,q3,q6,q12")
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--skew", type=float, default=0.0,
                    help="fraction of fact-table join-key values collapsed "
                    "onto ONE hot key (BASELINE configs[3]: skewed join "
                    "keys exercising the shuffle-slack re-plan loop)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    # the CPU-mesh profile: force the CPU backend (the axon plugin ignores
    # JAX_PLATFORMS) and the 8-virtual-device flag BEFORE backend init
    import os

    if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    if len(jax.devices()) < 8:
        raise SystemExit("need 8 devices; set XLA_FLAGS=--xla_force_host_platform_device_count=8")

    import numpy as np

    from datafusion_comet_tpu.parallel.executor import DistributedSession
    from datafusion_comet_tpu.parallel.mesh import make_mesh

    if args.suite == "tpch":
        from datafusion_comet_tpu.models import tpch as model

        tables = ("lineitem", "orders", "customer", "part", "supplier",
                  "nation", "region", "partsupp")
    else:
        from datafusion_comet_tpu.models import tpcds as model

        tables = tuple(model.SCHEMAS)
    tpch = model  # query lookup below
    qnames = [q.strip() for q in args.queries.split(",")]
    sizes = [int(s) for s in args.sizes.split(",")]
    data = {t: model.generate_table(t, args.sf) for t in tables}
    if args.skew > 0:
        # collapse a fraction of fact join keys onto one hot value: the
        # AQE-skew analog workload (reference: CometShuffleExchangeExec
        # implements ShuffleExchangeLike so Spark AQE can split skewed
        # partitions; here the engine answers with shuffle-slack re-plans)
        rng = np.random.default_rng(7)
        skew_cols = {
            "store_sales": ["ss_item_sk", "ss_customer_sk"],
            "catalog_sales": ["cs_item_sk", "cs_bill_customer_sk"],
            "store_returns": ["sr_item_sk"],
            "lineitem": ["l_orderkey", "l_partkey"],
        }
        for t, cols in skew_cols.items():
            if t not in data:
                continue
            for c in cols:
                col = data[t].get(c)
                if col is None or not hasattr(col, "astype"):
                    continue
                n_rows = len(col)
                hot = col[0]
                m = rng.random(n_rows) < args.skew
                col = np.array(col)
                col[m] = hot
                data[t][c] = col

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
            replans = []  # AQE-skew re-plan events (slack/fanout growth)
            for attempt in range(4):
                dplan, fn = sess.compile(plan, shuffle_slack=slack,
                                         join_fanout=fanout, agg_scale=scale)
                out, ovf = fn(sess.tables)
                jax.block_until_ready(out.row_mask)
                if not bool(np.asarray(ovf).any()):
                    break
                replans.append({"attempt": attempt, "slack": slack,
                                "fanout": fanout, "scale": scale})
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
            # fact rows the query scans (largest referenced table): the
            # per-device throughput that the efficiency table derives from
            from datafusion_comet_tpu.ir import plan as _Pn

            def _tables_of(p, acc):
                if isinstance(p, _Pn.Scan):
                    acc.add(p.table)
                for c in p.children():
                    _tables_of(c, acc)
                return acc

            refs = _tables_of(tpch.QUERIES[qn](), set())
            scan_rows = max((len(next(iter(data[t].values())))
                             for t in refs if t in data), default=0)
            best = min(times)
            per_q[qn] = {
                "best_s": round(best, 4),
                "times_s": [round(t, 4) for t in times],
                "compile_s": round(compile_s, 1),
                "replans": replans,
                "final_slack": slack,
                "scan_rows": int(scan_rows),
                "rows_per_s_per_device": round(scan_rows / best / n, 1),
                "exchanges": exchange_profile(dplan, n),
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
