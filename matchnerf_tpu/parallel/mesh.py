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


def shard_batch_tree(batch, mesh: Mesh, axis_name: str = "data",
                     mode: str = "batch"):
    """Place a host batch onto the (possibly multi-host) mesh.

    mode='batch': each process passes its LOCAL chunk of the global batch
    (contiguous per-process blocks in process order — the loader's shard
    contract); leading dims shard over the mesh. mode='replicated': every
    process passes the FULL identical batch (the rays-mode / eval data
    contract) and everything replicates — ray sharding then happens
    in-graph. The mode must be explicit: local-chunk vs full-copy data is
    indistinguishable from shapes alone, and guessing wrong silently builds
    a corrupt global array (per-process different rows labeled replicated,
    or identical copies stacked into a doubled batch).
    """
    from .distributed import make_global_array

    n = mesh.devices.size
    n_proc = jax.process_count()
    assert mode in ("batch", "replicated"), mode

    def place(x):
        x = np.asarray(x)
        if mode == "batch" and x.ndim >= 1 and x.shape[0] > 0 \
                and (x.shape[0] * n_proc) % n == 0:
            return make_global_array(x, shard_batch_dim(mesh, axis_name))
        if mode == "batch" and n_proc > 1:
            raise ValueError(
                f"batch-mode leaf with local leading dim {x.shape[:1]} can't "
                f"shard over {n} devices and can't be replicated either "
                "(each process holds a different chunk)")
        return make_global_array(x, replicate(mesh))

    return jax.tree_util.tree_map(place, batch)


def replicate_tree(tree, mesh: Mesh):
    """Replicate every leaf of a host-resident pytree over the (possibly
    multi-host) mesh. Params/opt-state live fully replicated; XLA's grad
    psum keeps the copies in lockstep."""
    from .distributed import make_global_array

    sh = replicate(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, sh)
    return jax.tree_util.tree_map(
        lambda x: make_global_array(np.asarray(x), sh), tree)
