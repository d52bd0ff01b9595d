
#!/usr/bin/env python
"""Streaming-aggregate overlap bench (VERDICT r3 #8): tiled aggregate with
the producer/consumer prefetch channel vs fully synchronous staging.

Reference anchor: the 2-deep channel overlapping native compute with JNI
consumption (/root/reference jni_api.rs:822-859). Here the producer thread
stages host tiles (numpy slicing + from_numpy packing + async device_put)
while the device runs the partial-aggregate step for the previous tile.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/streaming_bench.py \
        --rows 8000000 --tile 1048576 --out benchmarks/results/streaming-overlap.json
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--tile", type=int, default=1 << 20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import numpy as np

    from datafusion_comet_tpu import types as T
    from datafusion_comet_tpu.conf import CONF
    from datafusion_comet_tpu.exec import streaming as S
    from datafusion_comet_tpu.ir import expr as E
    from datafusion_comet_tpu.ir import plan as P

    rng = np.random.default_rng(0)
    n = args.rows
    data = {
        "k": rng.integers(0, 64, n).astype(np.int8),
        "a": rng.integers(0, 1 << 20, n).astype(np.int64),
        "b": rng.random(n),
    }
    schema = T.Schema([T.Field("k", T.INT8), T.Field("a", T.INT64),
                       T.Field("b", T.FLOAT64)])
    # sum/min/count (not avg): the avg-carrying merge program
    # deterministically SIGSEGV'd the tunnel AOT compiler on the v5e
    # (known_issues.md remote-compiler SIGSEGV class); the overlap
    # question — producer staging vs device partial-agg — is identical
    plan = P.Scan("t", schema).aggregate(
        [E.col("k")],
        [E.AggExpr("sum", E.col("a"), "sa"),
         E.AggExpr("min", E.col("b"), "mb"),
         E.AggExpr("count", None, "n")],
    )

    def run(depth: int) -> float:
        old = CONF.get(S.STREAMING_PREFETCH_DEPTH)
        CONF.set(S.STREAMING_PREFETCH_DEPTH.key, depth)
        try:
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.time()
                out = S.execute_tiled_aggregate(
                    plan, S.numpy_tiles(data, schema, args.tile), "t")
                # force a host transfer: under the axon tunnel
                # block_until_ready can return before the remote
                # execution lands (see pallas_scatter_probe._sync)
                np.asarray(out.row_mask[:1])
                best = min(best, time.time() - t0)
            return best
        finally:
            CONF.set(S.STREAMING_PREFETCH_DEPTH.key, old)

    run(0)  # compile warm-up (programs shared by both modes)
    sync_s = run(0)
    overlap_s = run(2)
    speedup = sync_s / overlap_s
    doc = {
        "rows": n,
        "tile_rows": args.tile,
        "sync_best_s": round(sync_s, 3),
        "overlap_best_s": round(overlap_s, 3),
        "speedup": round(speedup, 3),
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
