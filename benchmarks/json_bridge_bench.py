#!/usr/bin/env python
"""Bridged-function bench (VERDICT r4 item 9): columnar from_json/to_json
batch_fn vs the row-at-a-time loop, through the public host-UDF bridge.
Writes one JSON doc with best-of-reps for both paths."""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from datafusion_comet_tpu import types as T
    from datafusion_comet_tpu.exec.batch import from_numpy
    from datafusion_comet_tpu.exec.host_udf import host_eval_udf
    from datafusion_comet_tpu.ir import expr as E
    from datafusion_comet_tpu.ir import functions as F

    n = args.rows
    docs = [json.dumps({"a": i, "b": f"s{i % 100}", "c": i * 0.5})
            for i in range(n)]
    schema = T.struct(("a", T.INT64), ("b", T.string(8)), ("c", T.FLOAT64))
    b = from_numpy({"j": np.array(docs, object)},
                   T.Schema([T.Field("j", T.string(64))]))

    fast = F.from_json(E.bind(E.col("j"), b.schema), schema)
    slow = dataclasses.replace(fast, batch_fn=None)

    def best(udf):
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            cv = host_eval_udf(udf, b)
            jax.block_until_ready(jax.tree_util.tree_leaves(cv))
            ts.append(time.perf_counter() - t0)
        return min(ts), cv

    t_fast, cv_f = best(fast)
    t_slow, cv_s = best(slow)
    for x, y in zip(jax.tree_util.tree_leaves(cv_f),
                    jax.tree_util.tree_leaves(cv_s)):
        assert x.shape == y.shape and bool((x == y).all()), "path mismatch"

    # to_json over the parsed structs
    tj_fast = F.to_json(E.bind(E.col("j"), b.schema))  # identity-ish payload
    tj_slow = dataclasses.replace(tj_fast, batch_fn=None)
    tt_fast, _ = best(tj_fast)
    tt_slow, _ = best(tj_slow)

    doc = {
        "rows": n,
        "from_json_row_loop_s": round(t_slow, 4),
        "from_json_columnar_s": round(t_fast, 4),
        "from_json_speedup": round(t_slow / t_fast, 2),
        "from_json_columnar_rows_per_s": round(n / t_fast, 0),
        "to_json_row_loop_s": round(tt_slow, 4),
        "to_json_columnar_s": round(tt_fast, 4),
        "to_json_speedup": round(tt_slow / tt_fast, 2),
        "note": ("columnar = pyarrow multithreaded JSON parse + SoA planes "
                 "built from arrow buffers (strings via one vectorized "
                 "gather); identical outputs asserted"),
    }
    line = json.dumps(doc, indent=2)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line)


if __name__ == "__main__":
    main()
