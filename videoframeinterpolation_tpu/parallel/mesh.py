"""Mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(
    n_devices: int | None = None,
    *,
    axis_name: str = DATA_AXIS,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """1-D data-parallel mesh over the available devices.

    Multi-slice topologies still map to a single logical axis here (the
    models are <= 5.5M params — fully replicated; SURVEY.md section 2.7
    records that the reference needs no TP/PP either). Spatial tiling for
    HD inference uses its own 2-D mesh (``parallel/spatial.py``).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = DATA_AXIS) -> dict:
    """Device-put a host batch with its leading axis sharded over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def shard_chunk(batches: dict, mesh: Mesh, axis_name: str = DATA_AXIS) -> dict:
    """Device-put stacked ``(chunk, B, ...)`` batches, sharding the batch
    axis (axis 1) over the mesh — the layout ``make_chunked_train_step``'s
    ``lax.scan`` consumes (scan iterates axis 0 on-device)."""
    sh = NamedSharding(mesh, P(None, axis_name))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batches)
