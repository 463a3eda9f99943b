"""Device-mesh sharding helpers (the framework's parallelism layer).

Replaces the reference's `torch.nn.DataParallel` (coach.py:83-85) with the
TPU-native story: a `jax.sharding.Mesh` + `NamedSharding` annotations, and
XLA emits the collectives (grad psum over ICI for data parallelism; no
hand-written communication backend — SURVEY.md §2.9).

Two axes of parallelism map naturally onto MatchNeRF:
- 'data': shard the batch dimension for training (replicated params,
  all-reduced grads) and the view/pair stacks in the encoder
- ray parallelism: at eval, rays are embarrassingly parallel
  (no cross-ray communication exists anywhere in the model), so the ray axis
  of a render slice shards across chips with zero collectives
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch_dim(mesh: Mesh, axis_name: str = "data"):
    """Shard an array's leading (batch) dim over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def shard_rays(mesh: Mesh, axis_name: str = "data"):
    """Shard [B, R, ...] arrays over the ray axis (dim 1)."""
    return NamedSharding(mesh, P(None, axis_name))


def shard_batch_tree(batch, mesh: Mesh, axis_name: str = "data"):
    """Place every array in `batch` with its leading dim sharded when it
    divides the mesh size, replicated otherwise."""
    n = mesh.devices.size

    def place(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n == 0:
            return jax.device_put(x, shard_batch_dim(mesh, axis_name))
        return jax.device_put(x, replicate(mesh))

    return jax.tree_util.tree_map(place, batch)
