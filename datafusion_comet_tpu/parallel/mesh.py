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

__all__ = ["make_mesh", "make_mesh_2d", "PARTITION_AXIS", "row_sharding", "replicated"]

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


def make_mesh_2d(dcn: int, ici: Optional[int] = None, devices=None) -> Mesh:
    """Multi-host-shaped mesh: outer axis "dcn" spans host groups (data-
    center network), inner axis "ici" the chips of one host. Collectives
    over the flattened ("dcn", "ici") tuple let XLA route intra-host legs
    over ICI and only cross-host legs over DCN (the scaling-book mesh
    recipe). On a single host this validates the 2-D program shape with
    virtual devices."""
    devs = devices if devices is not None else jax.devices()
    ici = ici or (len(devs) // dcn)
    devs = devs[: dcn * ici]
    return Mesh(np.array(devs).reshape(dcn, ici), ("dcn", "ici"))
