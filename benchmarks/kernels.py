
#!/usr/bin/env python
"""Per-kernel micro-benchmarks with roofline accounting.

The analog of the reference's criterion benches
(/root/reference/native/spark-expr/benches/, native/shuffle/benches/) for
the TPU engine's primitive kernels: the variadic sort (join/aggregate
backbone), gathers, scatters (dense-domain joins/aggregates), cumsum
(sorted-segment reductions), stream compaction, and a fused elementwise
pass (the bandwidth ceiling probe).

Each result reports bytes-touched / elapsed as GB/s and % of the HBM
roofline (v5e ≈ 819 GB/s). Output: one JSON doc with every kernel, plus a
summary line. Run on the TPU:

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/kernels.py \
        --rows 8388608 --out benchmarks/results/kernels-tpu.json
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

ROOFLINE_GBPS = {"tpu": 819.0, "cpu": 50.0}


INNER = 8  # kernel iterations per program (amortizes tunnel dispatch)


def bench(fn, *args, reps=5, warmup=2):
    try:
        return _bench(fn, *args, reps=reps, warmup=warmup)
    except Exception as e:  # one kernel failing must not kill the doc
        import traceback

        traceback.print_exc()
        return None


def _bench(fn, *args, reps=5, warmup=2):
    """Time a jitted kernel honestly on the tunneled TPU:

    - completion is forced bench.py-style — every output reduces to ONE
      scalar INSIDE the program (full sums, so XLA cannot dead-code the
      body) and that scalar is fetched per call;
    - the kernel body runs INNER times inside one program via fori_loop,
      each iteration's first arg perturbed by a value data-dependent on the
      previous checksum (0 at runtime, unprovable at compile time — no
      hoisting/CSE); reported time = total / INNER, which amortizes the
      ~30-50 ms per-call tunnel overhead that would otherwise dominate any
      sub-100 ms kernel."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    def csum(out):
        leaves = jax.tree_util.tree_leaves(out)
        acc = jnp.zeros((), jnp.float32)
        for l in leaves:
            acc = acc + (jnp.sum(l.astype(jnp.float32)) if l.ndim
                         else l.astype(jnp.float32))
        return acc

    def wrapped(*a):
        first = csum(fn(*a))

        def body(_, carry):
            bump = jnp.where(jnp.isinf(carry), 1, 0)
            a0 = a[0] + bump.astype(a[0].dtype)
            return csum(fn(a0, *a[1:]))

        return jax.lax.fori_loop(0, INNER - 1, body, first)

    jitted = jax.jit(wrapped)
    for _ in range(warmup):
        float(np.asarray(jitted(*args)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        float(np.asarray(jitted(*args)))
        best = min(best, time.time() - t0)
    return best / INNER





def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 23)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default="")
    ap.add_argument("--backend", choices=["default", "cpu"], default="default")
    args = ap.parse_args()

    import datafusion_comet_tpu  # noqa: F401  (enables jax x64)
    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    n = args.rows
    backend = jax.default_backend()
    roof = ROOFLINE_GBPS.get(backend, 819.0)
    rng = np.random.default_rng(0)

    key64 = jnp.asarray(rng.integers(0, 1 << 40, n).astype(np.int64))
    key_small = jnp.asarray(rng.integers(0, n // 4, n).astype(np.int64))
    pay = [jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.int64))
           for _ in range(4)]
    f64 = jnp.asarray(rng.random(n))
    idx_rand = jnp.asarray(rng.integers(0, n, n).astype(np.int32))
    small_m = 1 << 18
    idx_small = jnp.asarray(rng.integers(0, small_m, n).astype(np.int32))
    small_tab = jnp.asarray(rng.integers(0, 100, small_m).astype(np.int32))
    mask = jnp.asarray(rng.random(n) < 0.01)

    results = {}

    def rec(name, secs, bytes_touched, note=""):
        if secs is None:
            results[name] = {"error": "failed (see log)"}
            print(f"{name:34s} FAILED", flush=True)
            return
        gbps = bytes_touched / secs / 1e9
        results[name] = {
            "best_s": round(secs, 5),
            "bytes": int(bytes_touched),
            "gb_per_s": round(gbps, 1),
            "pct_roofline": round(100.0 * gbps / roof, 1),
            "note": note,
        }
        print(f"{name:34s} {secs*1e3:9.2f} ms  {gbps:8.1f} GB/s "
              f"{100.0*gbps/roof:6.1f}%  {note}", flush=True)

    # bandwidth ceiling probe: one fused elementwise pass over 8 i64 cols
    cols8 = pay + [key64, key_small, idx_rand.astype(jnp.int64),
                   key_small * 7]
    t = bench(lambda *cs: sum(c * 3 + 1 for c in cs), *cols8, reps=args.reps)
    rec("fused_elementwise_8col", t, 16 * 8 * n, "read+write 8 i64 cols")

    # variadic sort: 1 key limb + k payloads (the join/agg backbone)
    for k in (0, 2, 4):
        ops = (key64,) + tuple(pay[:k])

        def srt(*xs):
            return jax.lax.sort(xs, num_keys=1, is_stable=True)

        t = bench(srt, *ops, reps=args.reps)
        rec(f"sort_1key_{k}payload", t, 8 * (1 + k) * n,
            "lax.sort is_stable")

    # 2-limb key sort (multi-column keys after packing)
    t = bench(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2,
                                           is_stable=True),
              key64, key_small, pay[0], reps=args.reps)
    rec("sort_2key_1payload", t, 8 * 3 * n, "")

    # argsort-style compaction: sort (mask, iota) then take at small target
    target = 1 << 15

    def compact(m, *cols):
        iota = jnp.arange(n, dtype=jnp.int32)
        srt = jax.lax.sort(((~m).astype(jnp.int32), iota), num_keys=1,
                           is_stable=True)
        sel = srt[1][:target]
        return tuple(jnp.take(c, sel) for c in cols)

    t = bench(compact, mask, *pay, reps=args.reps)
    rec("compact_to_32k_4col", t, 8 * 4 * n + 5 * n, "sort idx + tiny takes")

    # gathers
    t = bench(lambda tab, i: jnp.take(tab, i), pay[0], idx_rand,
              reps=args.reps)
    rec("gather_n_from_n_i64", t, 8 * 2 * n, "random indices")
    t = bench(lambda tab, i: jnp.take(tab, i), small_tab, idx_small,
              reps=args.reps)
    rec("gather_n_from_256k_i32", t, 4 * 2 * n, "dense-domain probe")

    # scatters (dense-domain build side / aggregates)
    for m_name, m in (("256k", 1 << 18), ("n", n), ("16M", 1 << 24)):
        seg = jnp.asarray(rng.integers(0, m, n).astype(np.int32))

        t = bench(lambda s, x, _m=m: jnp.zeros(_m, jnp.int32).at[s].add(x),
                  seg, pay[0].astype(jnp.int32), reps=args.reps)
        rec(f"scatter_add_n_to_{m_name}", t, 4 * 2 * n + 4 * m,
            "~1 hit/slot" if m >= n else f"~{n//m} hits/slot")
        t = bench(lambda s, x, _m=m: jnp.zeros(_m, jnp.int32).at[s].max(x),
                  seg, pay[0].astype(jnp.int32), reps=args.reps)
        rec(f"scatter_max_n_to_{m_name}", t, 4 * 2 * n + 4 * m, "")

    # cumsum (sorted-segment reduction backbone); int64 cumsum at 8M hits
    # a scoped-vmem ceiling inside the fori_loop wrapper, so measure the
    # widths the engine's hot paths use (i32 counts, f64 sums)
    t = bench(lambda x: jnp.cumsum(x), pay[0].astype(jnp.int32), reps=args.reps)
    rec("cumsum_n_i32", t, 4 * 2 * n, "")
    t = bench(lambda x: jnp.cumsum(x), f64, reps=args.reps)
    rec("cumsum_n_f64", t, 8 * 2 * n, "")

    # segment_sum via jax.ops (unsorted scatter path)
    seg_u = jnp.asarray(rng.integers(0, n // 4, n).astype(np.int32))
    t = bench(lambda x, s: jax.ops.segment_sum(x, s, num_segments=n // 4),
              pay[0], seg_u, reps=args.reps)
    rec("segment_sum_n_to_nq", t, 8 * 2 * n + 4 * n, "unsorted ids")

    # Pallas MXU one-hot bucket_sum vs the scatter-add path (the
    # dense-domain aggregate core; exact int via 8-bit limb matvecs)
    from datafusion_comet_tpu.exec import pallas_kernels as PK

    B_ = 4096
    codes_b = jnp.asarray(rng.integers(0, B_, n).astype(np.int32))
    vals_b = jnp.asarray(rng.integers(-(2**30), 2**30, n).astype(np.int32))
    t = bench(lambda c, v: PK.bucket_sum(c, v, B_), codes_b, vals_b,
              reps=args.reps)
    rec("bucket_sum_pallas_4096", t, (4 + 4) * n, "MXU one-hot limb matvec")
    t = bench(lambda c, v: jax.ops.segment_sum(
        v.astype(jnp.int64), c, num_segments=B_), codes_b, vals_b,
        reps=args.reps)
    rec("bucket_sum_scatter_4096", t, (4 + 8) * n, "segment_sum")

    # host-bridge cliff: the same string function as a pure_callback
    # round-trip vs the device kernel (VERDICT weak #8 — quantify what a
    # bridged function costs; note NO modeled TPC-H/TPC-DS query uses a
    # bridge, this is the penalty a custom query would pay)
    ns = min(n, 1 << 20)
    words = np.array(["Robert", "Ashcraft", "Tymczak", "Pfister"], object)
    svals = words[rng.integers(0, len(words), ns)]
    from datafusion_comet_tpu import types as T_
    from datafusion_comet_tpu.exec.batch import from_numpy as _fn
    from datafusion_comet_tpu.exec.engine import Session as _S
    from datafusion_comet_tpu.ir import expr as E_, plan as P_
    from datafusion_comet_tpu.ir import functions as F_

    sch = T_.Schema([T_.Field("s", T_.string(12))])
    sess = _S()
    sess.register_numpy("t", {"s": svals}, sch)
    # force non-dict storage so the device kernel runs at full n (dict
    # would collapse to 4 rows)
    import dataclasses as _dc
    cv = sess.tables["t"].columns[0]
    if cv.is_dict:
        sess.tables["t"] = _dc.replace(
            sess.tables["t"], columns=(cv.decode(),))

    def _q(expr):
        plan = P_.Scan("t", sch).project([expr.alias("o")])
        _, f = sess.compile(plan)

        def step(z):
            out, _ = f(sess.tables)
            return jnp.sum(out.columns[0].lengths) + z[0]

        return step

    dev = _q(F_.soundex(E_.col("s")))
    host = _q(F_.soundex_host(E_.col("s")))
    zarg = jnp.zeros(1, jnp.int32)
    t = bench(dev, zarg, reps=args.reps)
    rec("soundex_device_1M", t, 12 * ns * 2, f"rows={ns}")
    t = bench(host, zarg, reps=args.reps)
    rec("soundex_hostbridge_1M", t, 12 * ns * 2,
        f"rows={ns} pure_callback round-trip")

    doc = {
        "rows": n,
        "backend": backend,
        "device": str(jax.devices()[0]),
        "roofline_gb_per_s": roof,
        "kernels": results,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
    print(json.dumps({"metric": "kernel_bench_done", "kernels": len(results)}))


if __name__ == "__main__":
    main()
