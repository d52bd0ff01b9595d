"""Test configuration: run the engine on a virtual 8-device CPU mesh.

Mirrors the reference's local[*] test strategy (SURVEY.md §4: everything
runs single-process with real multi-partition behavior). The axon TPU plugin
prepends itself to jax_platforms regardless of JAX_PLATFORMS, so we force the
CPU backend via config.update after import (before any backend init) — this
also avoids paying ~2 min remote-compile round-trips per test.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
