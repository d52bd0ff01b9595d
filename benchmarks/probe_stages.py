
#!/usr/bin/env python
"""Verbose per-stage probe for one TPC query: prints compile/execute/
overflow timing for EVERY retry attempt of every stage as it happens —
the tool for diagnosing tunnel-TPU wedges that tpcbench's buffered output
hides.

    PYTHONPATH=/root/repo:/root/.axon_site PYTHONUNBUFFERED=1 \
        python benchmarks/probe_stages.py --suite tpch --sf 1 --query q17
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", choices=["tpch", "tpcds"], default="tpch")
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--query", default="q17")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import os

    import numpy as np
    import jax

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
        print(f"staged {t} {time.time() - t0:.1f}s", flush=True)

    # instrument the retry loop: per-attempt compile + execute + flag-wait
    orig_compile = Session.compile

    def compile_spy(self, plan, **kw):
        tc = time.time()
        out = orig_compile(self, plan, **kw)
        print(f"  trace+bind {time.time() - tc:.1f}s kw={kw}", flush=True)
        return out

    Session.compile = compile_spy

    orig_retry = Session._execute_retry

    def retry_spy(self, plan, return_fn=False):
        from datafusion_comet_tpu.ir.plan import Scan

        names = []

        def walk(p):
            if isinstance(p, Scan):
                names.append(p.table)
            for c in p.children():
                walk(c)

        walk(plan)
        print(f"stage over {names}", flush=True)
        fanout = self.join_fanout
        scale = 1
        for attempt in range(self.max_join_retries):
            bound, fn = self.compile(plan, join_fanout=fanout, agg_scale=scale,
                                     unique_join_ok=(attempt == 0))
            te = time.time()
            out, overflowed = fn(self.tables)
            print(f"  attempt {attempt}: dispatch {time.time() - te:.1f}s",
                  flush=True)
            tw = time.time()
            ovf = bool(overflowed)
            print(f"  attempt {attempt}: wait+flag {time.time() - tw:.1f}s "
                  f"overflow={ovf}", flush=True)
            if not ovf:
                return (out, fn) if return_fn else out
            fanout *= 4
            scale *= 4
        raise RuntimeError("retries exhausted")

    Session._execute_retry = retry_spy

    make = model.QUERIES[args.query]
    plan = make(sess) if "session" in make.__code__.co_varnames[:1] else make()
    tq = time.time()
    run = sess.prepare(plan)
    print(f"prepare total {time.time() - tq:.1f}s", flush=True)
    import jax.numpy as jnp

    def csum(out):
        s = [jnp.sum(out.row_mask.astype(jnp.int64)).astype(jnp.float64)]
        for c in out.columns:
            d = c.data
            v = d.astype(jnp.float64) if d.ndim == 1 else d.sum(-1).astype(jnp.float64)
            s.append(jnp.sum(jnp.where(out.row_mask, v, 0.0)))
        return jnp.stack(s)

    jitted = jax.jit(csum)
    for i in range(args.reps):
        t1 = time.time()
        np.asarray(jitted(run()))
        print(f"run {i}: {time.time() - t1:.3f}s", flush=True)


if __name__ == "__main__":
    main()
