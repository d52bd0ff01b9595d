"""Device-side trace timing via the XLA profiler.

The host-side Chrome-trace recorder (observability/trace.py) only sees
wall-clock between host sync points; intra-program attribution previously
required explain(profile_ops=True)'s per-subtree recompiles (expensive).
This module captures the XLA profiler's own device timeline —
jax.profiler.trace writes a TensorBoard profile plugin directory with a
Chrome-trace JSON (.trace.json.gz) containing per-op device lanes — and
aggregates per-op device time without any recompilation.

Reference analog: native/common/src/tracing.rs spans + per-operator
DataFusion elapsed counters (metrics/utils.rs:30); here the compiler's own
profiler supplies the intra-program times the fused engine can't hook.

Usage:
    from datafusion_comet_tpu.observability.xla_profile import device_profile
    report = device_profile(lambda: run(), outdir="/tmp/xprof")
    # report["lanes"]: {lane_name: {op_name: total_us}}
    # report["top_device_ops"]: [(op, us), ...] from non-host lanes
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
from typing import Callable, Dict, List, Optional, Tuple

__all__ = ["device_profile", "parse_xla_trace"]


def parse_xla_trace(trace_dir: str) -> dict:
    """Parse the newest ``*.trace.json.gz`` under a jax.profiler output dir
    into per-lane per-op total durations (µs)."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        return {"lanes": {}, "top_device_ops": [], "trace_file": None}
    doc = json.load(gzip.open(paths[-1], "rt"))
    evs = doc.get("traceEvents", [])
    pid_name: Dict[int, str] = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = (e.get("args") or {}).get("name", str(e["pid"]))
    lanes: Dict[str, collections.Counter] = collections.defaultdict(
        collections.Counter)
    for e in evs:
        if e.get("ph") != "X":
            continue
        lane = pid_name.get(e.get("pid"), str(e.get("pid")))
        lanes[lane][e.get("name", "?")] += e.get("dur", 0)
    device = collections.Counter()
    for lane, ops in lanes.items():
        low = lane.lower()
        # device lanes: TPU/accelerator streams; exclude pure host threads
        if "host" in low and "tpu" not in low and "device" not in low:
            continue
        if any(k in low for k in ("tpu", "device", "xla", "stream", "core")):
            device.update(ops)
    return {
        "lanes": {k: dict(v) for k, v in lanes.items()},
        "top_device_ops": device.most_common(25),
        "trace_file": paths[-1],
    }


def device_profile(fn: Callable[[], object], outdir: str = "/tmp/comet_xprof",
                   warmup: bool = True) -> dict:
    """Run ``fn`` under the XLA profiler and return the parsed per-op device
    times. ``fn`` should be an already-compiled step (warm it first or leave
    ``warmup`` True) so the capture holds execution, not compilation."""
    import jax

    if warmup:
        res = fn()
        jax.block_until_ready(res)
    os.makedirs(outdir, exist_ok=True)
    with jax.profiler.trace(outdir):
        res = fn()
        jax.block_until_ready(res)
    return parse_xla_trace(outdir)
