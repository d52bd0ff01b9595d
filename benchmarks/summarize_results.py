#!/usr/bin/env python
"""Summarize tpcbench result jsons into the round README table.

    python benchmarks/summarize_results.py \
        --current benchmarks/results/tpch-sf1-tpu-v5e-r4.json \
        --baseline benchmarks/results/tpch-sf1-tpu-v5e-r3-final.json \
        --out benchmarks/results/README-r4.md
"""

from __future__ import annotations

import argparse
import json


def best_of(paths):
    best = {}
    for p in paths:
        try:
            doc = json.load(open(p))
        except Exception:
            continue
        for q, r in doc.get("queries", {}).items():
            if "best_s" not in r:
                continue
            if q not in best or r["best_s"] < best[q]["best_s"]:
                best[q] = r
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--current", required=True)
    ap.add_argument("--baseline", nargs="*", default=[])
    ap.add_argument("--title", default="TPC-H SF1 on TPU v5e (single chip) — round 4")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    cur = json.load(open(args.current))
    curq = cur.get("queries", {})
    base = best_of(args.baseline)

    def qkey(q):
        return int("".join(ch for ch in q if ch.isdigit()) or 0)

    lines = [f"# {args.title}", ""]
    lines.append("Steady-state best wall-clock per query (checksum-forced "
                 "completion; compiles excluded). Baseline column = best "
                 "across the prior rounds' runs.")
    lines.append("")
    lines.append("| query | r4 best_s | compile_s | prior best_s | speedup |")
    lines.append("|---|---|---|---|---|")
    total = 0.0
    prior_total = 0.0
    n_prior = 0
    for q in sorted(curq, key=qkey):
        r = curq[q]
        if "best_s" not in r:
            lines.append(f"| {q} | ERROR: {r.get('error','?')[:60]} | | | |")
            continue
        total += r["best_s"]
        b = base.get(q, {}).get("best_s")
        sp = f"{b / r['best_s']:.1f}x" if b else ""
        if b:
            prior_total += b
            n_prior += 1
        lines.append(f"| {q} | {r['best_s']:.3f} | {r.get('compile_s','')} |"
                     f" {b if b is not None else ''} | {sp} |")
    lines.append("")
    lines.append(f"**Total ({len([q for q in curq if 'best_s' in curq[q]])} "
                 f"queries): {total:.1f} s**"
                 + (f" (prior best over the same {n_prior}: {prior_total:.1f} s)"
                    if n_prior else ""))
    out = "\n".join(lines) + "\n"
    if args.out:
        with open(args.out, "w") as f:
            f.write(out)
    print(out)


if __name__ == "__main__":
    main()
