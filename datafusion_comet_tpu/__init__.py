"""datafusion_comet_tpu: a TPU-native vectorized query-execution engine.

Brand-new engine built on JAX/XLA/Pallas with the capabilities of Apache
DataFusion Comet (reference layout: SURVEY.md). Compute runs on TPU as fused
XLA programs over struct-of-arrays batches in HBM; distribution uses
jax.sharding meshes with collective exchange; the host layer (planner,
config, IO staging) is Python + native extensions.

x64 must be enabled before any JAX computation: the engine's bigint/decimal
and timestamp semantics are 64-bit (Spark semantics), so we flip it at
package import.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from datafusion_comet_tpu import types  # noqa: E402,F401
from datafusion_comet_tpu.ir.expr import col, lit  # noqa: E402,F401
