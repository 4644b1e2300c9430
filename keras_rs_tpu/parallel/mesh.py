"""Mesh construction and sharding helpers.

The reference builds a dedicated 1-D mesh over all TPU devices for
embedding sharding plus `keras.distribution.DataParallel` for the dense
model (jax/distributed_embedding.py:203-255, examples/ml_perf/main.py:
117-119). TPU-natively, a single 1-D mesh serves both roles: the batch is
sharded over the axis (data parallel) AND embedding tables are row-sharded
over the same axis (model parallel), exactly the hybrid described in
SURVEY.md §2.9.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(
    devices: list[jax.Device] | None = None, axis_name: str = DATA_AXIS
) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard dim 0 (batch) over the mesh axis."""
    return NamedSharding(mesh, P(axis_name))


def table_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Row-shard dim 0 (vocabulary) over the mesh axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_batch(mesh: Mesh, batch: Any, axis_name: str = DATA_AXIS) -> Any:
    """Device-put a host batch, sharding dim 0 of every leaf."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding)
        if hasattr(x, "shape")
        else x,
        tree,
    )
