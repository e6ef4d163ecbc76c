"""Device mesh + sharding helpers.

The reference's only parallelism is single-host `nn.DataParallel`
(m1 agent.py:167-173, m2 agent.py:159-165): scatter the batch, replicate
weights, gather outputs — implicit NCCL. The TPU-native equivalent is
SPMD: one jitted program, batch dimension sharded over the `data` mesh
axis, parameters replicated, gradient reduction compiled to `psum` over
ICI by XLA. Models here are 10-50M params, so pure data parallelism is
the right layout (no TP/PP needed); the mesh abstraction still leaves
room for a second `model` axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    if len(axis_names) == 1:
        shape = (len(devices),)
    else:
        raise NotImplementedError("only 1-D meshes are used at this model scale")
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch dict onto the mesh, sharded along dim 0.

    Multi-process: `batch` is this host's LOCAL shard of the global batch
    (per-host batchers via `batcher.shard()`); the global array assembles
    from all hosts' shards without any host-side gather."""
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
