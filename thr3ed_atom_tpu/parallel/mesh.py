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


def make_data_mesh(num_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over (the first ``num_devices``) local devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), axis_names=(DATA_AXIS,))


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
