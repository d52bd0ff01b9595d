"""XLA-profiler device trace capture (observability/xla_profile.py):
structure of the parsed report on the CPU backend; the TPU lanes are
exercised by benchmarks/profile_stages.py on hardware."""

import jax
import jax.numpy as jnp

from datafusion_comet_tpu.observability.xla_profile import (device_profile,
                                                            parse_xla_trace)


def test_device_profile_report_structure(tmp_path):
    @jax.jit
    def step():
        x = jnp.arange(1 << 16, dtype=jnp.float32)
        return jnp.sort(x * 3.0 + 1.0)[:8]

    rep = device_profile(step, outdir=str(tmp_path))
    assert set(rep) == {"lanes", "top_device_ops", "trace_file"}
    assert rep["trace_file"] is not None and rep["trace_file"].endswith(
        ".trace.json.gz")
    assert rep["lanes"], "expected at least one trace lane"
    # every lane aggregates op name -> non-negative µs
    for ops in rep["lanes"].values():
        for v in ops.values():
            assert v >= 0


def test_parse_missing_dir(tmp_path):
    rep = parse_xla_trace(str(tmp_path / "nope"))
    assert rep == {"lanes": {}, "top_device_ops": [], "trace_file": None}
