#!/usr/bin/env python
"""Per-operator bytes-touched + roofline accounting for TPC suites.

The north-star metric (BASELINE.md): fraction of the chip's HBM bandwidth
(~819 GB/s on v5e) a query actually sustains. The reference tracks this
discipline with 40+ criterion micro-benches (native/spark-expr/benches/);
here the whole engine is one fused XLA program per stage, so the natural
unit is the OPERATOR bytes-touched model:

    bytes_touched(op) = bytes(children outputs read) + bytes(own output)

summed over every operator of every stage (an UNFUSED upper bound on HBM
traffic: XLA fuses elementwise chains, so real traffic is lower and the
reported %-of-roofline is optimistic for fused pipelines; sorts/gathers/
scatters do materialize and dominate, which is what this model captures).

Usage (CPU replay + TPU timings merge):
    python benchmarks/roofline.py --suite tpch --sf 1 \
        --results benchmarks/results/tpch-sf1-tpu-v5e-r4.json \
        --out benchmarks/results/roofline-r4.json [--queries q1,q6]

The staged replay mirrors Session.prepare(): same stage splitting, same
overflow-retry escalation, same AQE stage-boundary shrink — so per-stage
capacities match what the TPU ran (modulo backend-identical retry paths).
Runs on any backend; pair JAX_PLATFORMS=cpu with a results json measured
on the TPU to attribute TPU wall-clock to modeled bytes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The replay runs on CPU by default: the axon TPU plugin prepends itself to
# jax_platforms regardless of JAX_PLATFORMS (see tests/conftest.py), so the
# override must happen via jax.config AFTER import, BEFORE backend init.
if "--tpu" not in sys.argv:
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

ROOF_GBPS = {"tpu": 819.0, "cpu": 50.0}


def replay_with_metrics(sess, plan):
    """Execute ``plan`` staged (prepare() semantics) collecting per-operator
    static bytes/capacity + live rows; returns a list of per-stage metric
    trees and the total datagen-independent byte model."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from datafusion_comet_tpu.exec.engine import (
        EvalContext, JoinOverflowError, run_plan, _fill_metrics)
    from datafusion_comet_tpu.observability.metrics import (
        MetricsCollector, build_metrics_tree)

    stage_list = sess._plan_stages(plan)
    temp_names = [n for n, _ in stage_list if n]
    trees = []
    try:
        for name, sub in stage_list:
            fanout, scale = sess.join_fanout, 1
            sub_values = (sess._materialize_subqueries()
                          if sess._subqueries else None)
            for attempt in range(sess.max_join_retries):
                names_box, static_box, counts_box = [], {}, []

                def fn(tables):
                    mc = MetricsCollector()
                    flags = []
                    ctx = EvalContext(subquery_values=sub_values,
                                      agg_scale=scale,
                                      unique_join_ok=(attempt == 0))
                    out = run_plan(sub, tables, ctx, flags, fanout, mc)
                    names_box.clear()
                    names_box.extend(mc.names)
                    static_box.clear()
                    static_box.update(mc.static)
                    ovf = (jnp.any(jnp.stack(flags)) if flags
                           else jnp.zeros((), bool))
                    return out, ovf, tuple(mc.counts)

                out, ovf, counts = jax.jit(fn)(sess.tables)
                if not bool(np.asarray(ovf)):
                    counts_box = [int(c) for c in np.asarray(
                        jnp.stack(counts))] if counts else []
                    break
                fanout *= 4
                scale *= 4
            else:
                raise JoinOverflowError(f"stage {name or 'root'} overflow")
            tree = build_metrics_tree(sub)
            resolved = {nid: c for nid, c in zip(names_box, counts_box)}
            _fill_metrics(tree, sub, resolved, static_box)
            trees.append((name, tree))
            if name:
                out, _ = sess._aqe_shrink(out)
                sess.tables[name] = out
        return trees
    finally:
        for n in temp_names:
            sess.tables.pop(n, None)


def flatten(tree):
    yield tree
    for c in tree.children:
        yield from flatten(c)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", choices=["tpch", "tpcds"], default="tpch")
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--results", default="",
                    help="tpcbench output json with measured best_s to merge")
    ap.add_argument("--queries", default="")
    ap.add_argument("--out", default="")
    ap.add_argument("--roof-gbps", type=float, default=819.0,
                    help="HBM roofline of the MEASURED device (v5e=819)")
    ap.add_argument("--merge-bytes", default="",
                    help="path to a prior roofline json: reuse its byte "
                    "models (skip the replay) and merge --results timings")
    args = ap.parse_args()

    if args.merge_bytes:
        _merge_only(args)
        return

    import numpy as np

    from datafusion_comet_tpu.exec.engine import Session

    if args.suite == "tpch":
        from datafusion_comet_tpu.models import tpch as model
    else:
        from datafusion_comet_tpu.models import tpcds as model

    measured = {}
    if args.results:
        with open(args.results) as f:
            doc = json.load(f)
        measured = {q: r.get("best_s") for q, r in doc["queries"].items()
                    if "best_s" in r}

    sess = Session()
    input_rows = {}
    for t in model.SCHEMAS:
        cache = (f"/tmp/{args.suite}_{t}_sf{args.sf:g}"
                 f"_v{getattr(model, 'DATA_VERSION', 1)}.npz")
        if os.path.exists(cache):
            data = dict(np.load(cache, allow_pickle=True))
        else:
            data = model.generate_table(t, args.sf)
        input_rows[t] = len(next(iter(data.values())))
        sess.register_numpy(t, data, model.SCHEMAS[t])

    wanted = [q.strip() for q in args.queries.split(",") if q.strip()] or sorted(
        model.QUERIES, key=lambda n: int(n[1:]))

    queries = {}
    for name in wanted:
        make = model.QUERIES[name]
        t0 = time.time()
        try:
            plan = (make(sess)
                    if "session" in make.__code__.co_varnames[:1] else make())
            trees = replay_with_metrics(sess, plan)
        except Exception as e:
            queries[name] = {"error": f"{type(e).__name__}: {e}"}
            print(name, "error", e, flush=True)
            continue
        ops = []
        for sname, tree in trees:
            for node in flatten(tree):
                if node.output_bytes is None:
                    continue
                ops.append({
                    "stage": sname or "root",
                    "op": node.op,
                    "detail": node.detail,
                    "capacity": node.capacity,
                    "rows": node.output_rows,
                    "bytes_touched": node.bytes_touched,
                })
        total_bytes = sum(o["bytes_touched"] or 0 for o in ops)
        scans = sum(input_rows.get(o["detail"], 0)
                    for o in ops if o["op"] == "Scan")
        entry = {
            "bytes_touched_model": total_bytes,
            "replay_s": round(time.time() - t0, 2),
            "n_operators": len(ops),
            "top_ops_by_bytes": sorted(
                [o for o in ops if o["bytes_touched"]],
                key=lambda o: -o["bytes_touched"])[:3],
        }
        if name in measured and measured[name]:
            best = measured[name]
            gbps = total_bytes / best / 1e9
            entry.update({
                "best_s": best,
                "gb_per_s": round(gbps, 2),
                "pct_roofline": round(100.0 * gbps / args.roof_gbps, 2),
                "input_rows_per_s": round(scans / best, 1) if scans else None,
            })
        queries[name] = entry
        print(name, f"{total_bytes >> 20}MiB",
              entry.get("pct_roofline", "-"), "%roof", flush=True)
        if args.out:
            _write(args.out, args, queries)

    _write(args.out or "/dev/stdout", args, queries, final=True)


def _merge_only(args):
    """Merge measured best_s into an existing byte-model json (no replay)."""
    with open(args.merge_bytes) as f:
        base = json.load(f)
    with open(args.results) as f:
        doc = json.load(f)
    measured = {q: r.get("best_s") for q, r in doc["queries"].items()}
    compile_s = {q: r.get("compile_s") for q, r in doc["queries"].items()}
    rows_in = {}
    queries = base["queries"]
    for q, e in queries.items():
        best = measured.get(q)
        if "error" in e or not best:
            continue
        total = e["bytes_touched_model"]
        gbps = total / best / 1e9
        e.update({
            "best_s": best,
            "compile_s": compile_s.get(q),
            "gb_per_s": round(gbps, 2),
            "pct_roofline": round(100.0 * gbps / args.roof_gbps, 2),
        })
    _write(args.out or "/dev/stdout", args, queries, final=True)


def _write(path, args, queries, final=False):
    doc = {
        "suite": args.suite,
        "sf": args.sf,
        "roof_gbps": args.roof_gbps,
        "model": "unfused bytes-touched (read children + write output, "
                 "summed over staged operators; optimistic for fused "
                 "pipelines, exact for materializing sorts/gathers)",
        "results_merged": args.results,
        "queries": queries,
    }
    if final:
        sinks = {}
        for q, e in queries.items():
            for o in e.get("top_ops_by_bytes", []):
                key = f"{o['op']}[{o['detail'][:40]}]"
                sinks[key] = sinks.get(key, 0) + (o["bytes_touched"] or 0)
        doc["top_sinks_suite"] = sorted(
            sinks.items(), key=lambda kv: -kv[1])[:10]
    with open(path, "w") as f:
        f.write(json.dumps(doc, indent=2))


if __name__ == "__main__":
    main()
