"""Device mesh construction for data-parallel SPMD query execution.

The engine's distribution model (SURVEY.md §2d): tables are hash-partitioned
row-wise across a 1-D device mesh (axis "p" — the analog of Spark's task
partitions); exchanges ride ICI via XLA collectives inside shard_map.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["make_mesh", "PARTITION_AXIS", "row_sharding", "replicated"]

PARTITION_AXIS = "p"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (PARTITION_AXIS,))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (row) axis across partitions."""
    return NamedSharding(mesh, PartitionSpec(PARTITION_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
