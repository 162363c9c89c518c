"""Device-mesh utilities: data-parallel sharding of the ray batch over ICI.

The reference has no distributed support at all (SURVEY.md §2.9: single torch.device,
no NCCL/MPI). The TPU-native scaling design:

  * 1-D mesh over all devices, axis "data"
  * the per-iteration ray batch shards along axis 0 (rays are embarrassingly parallel)
  * the voxel grid replicates (<= 128^3 x 28ch f32 ~ 235 MB — comfortably per-chip);
    XLA inserts the gradient psum over ICI automatically when the loss is jitted with
    these output shardings
  * spatial grid sharding + halo exchange is the planned escalation for 512^3+ grids

No communication code is written by hand — the sharding annotations below are the entire
"distribution backend".
"""
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_data_mesh(num_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over (the first ``num_devices``) local devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), axis_names=(DATA_AXIS,))


def make_grid_mesh(model_parallel: int, num_devices: Optional[int] = None) -> Mesh:
    """2-D ("data", "model") mesh: rays shard over "data"; the voxel grid's x-axis
    shards over "model" (spatial tensor parallelism; XLA inserts the halo exchange the
    +-1-voxel packing/interpolation windows need, and the psums for partial results).
    """
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    assert len(devices) % model_parallel == 0
    grid = np.array(devices).reshape(len(devices) // model_parallel, model_parallel)
    return Mesh(grid, axis_names=(DATA_AXIS, MODEL_AXIS))


def shard_grid_spatial(mesh: Mesh, grid_tree):
    """Constrain a VoxelGrid pytree's arrays to shard their x (width) axis over the
    model axis of the mesh."""
    sharding = NamedSharding(mesh, P(MODEL_AXIS))
    return jax.lax.with_sharding_constraint(grid_tree, sharding)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (the ray batch) across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Constrain a pytree of [B, ...] arrays to be sharded along the data axis."""
    return jax.lax.with_sharding_constraint(
        tree, batch_sharding(mesh)
    )


def replicate(mesh: Mesh, tree):
    return jax.lax.with_sharding_constraint(tree, replicated_sharding(mesh))
