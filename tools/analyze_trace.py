#!/usr/bin/env python
"""Trace summarizer (reference: native/common/src/bin/analyze_trace.rs:54):
reads a Chrome-trace JSON event file and prints per-span statistics —
count, total/mean/min/max duration — plus counter ranges.

Usage: python tools/analyze_trace.py [comet-event-trace.json]
"""

import json
import sys
from collections import defaultdict


def main(path: str = "comet-event-trace.json") -> None:
    with open(path) as f:
        text = f.read().strip()
    # the recorder appends events; accept either a JSON array or one-per-line
    if text.startswith("["):
        if text.endswith(","):
            text = text[:-1] + "]"
        elif not text.endswith("]"):
            text = text + "]"
        events = json.loads(text)
    else:
        events = [json.loads(line.rstrip(",")) for line in text.splitlines() if line.strip()]

    open_spans = {}
    durs = defaultdict(list)
    counters = defaultdict(list)
    for ev in events:
        ph = ev.get("ph")
        key = (ev.get("tid"), ev.get("name"))
        if ph == "B":
            open_spans[key] = ev["ts"]
        elif ph == "E":
            if key in open_spans:
                durs[ev["name"]].append(ev["ts"] - open_spans.pop(key))
        elif ph == "X":
            durs[ev["name"]].append(ev.get("dur", 0))
        elif ph == "C":
            for k, v in (ev.get("args") or {}).items():
                counters[f"{ev['name']}.{k}"].append(v)

    print(f"{'span':40s} {'count':>7s} {'total_ms':>10s} {'mean_ms':>9s} {'min_ms':>9s} {'max_ms':>9s}")
    for name in sorted(durs, key=lambda n: -sum(durs[n])):
        d = durs[name]
        tot = sum(d) / 1e3
        print(f"{name[:40]:40s} {len(d):7d} {tot:10.2f} {tot/len(d):9.3f} "
              f"{min(d)/1e3:9.3f} {max(d)/1e3:9.3f}")
    if counters:
        print(f"\n{'counter':40s} {'n':>5s} {'first':>12s} {'last':>12s} {'max':>12s}")
        for name in sorted(counters):
            v = counters[name]
            print(f"{name[:40]:40s} {len(v):5d} {v[0]:12.0f} {v[-1]:12.0f} {max(v):12.0f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "comet-event-trace.json")
