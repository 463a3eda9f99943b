"""Multi-host (multi-process) distributed training.

The reference scales with single-node `torch.nn.DataParallel`
(/root/reference/coach.py:83-85); the TPU-native replacement is SPMD over a
global device mesh spanning every host of a pod slice (SURVEY.md §2.9:
"jax.distributed + pjit"). Each host runs the same program on its local
chips; `jax.jit` over a global `Mesh` turns per-shard work + XLA collectives
(grad psum over ICI) into one logical step.

This module owns process-level concerns:
- `maybe_initialize(cfg)`: bring up the jax.distributed runtime. On a TPU
  pod slice `jax.distributed.initialize()` auto-detects everything from the
  TPU metadata; for explicit clusters (and the in-repo 2-process CPU gloo
  test) the coordinator address / process count / process id come from
  `parallel.*` config keys or MATCHNERF_* environment variables.
- process helpers (`process_index`, `is_main_process`) used to gate
  host-side side effects: exactly one process writes checkpoints, scalars,
  rendered images, and options files; every process still executes every
  jitted computation (collectives are global).
- `make_global_array`: build a global `jax.Array` from process-local numpy
  (the data-loading seam: each host feeds only its shard of the batch).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

_initialized = False


def _cfg_par(cfg):
    par = (cfg.get("parallel") if cfg is not None and hasattr(cfg, "get")
           else None) or {}
    return par if hasattr(par, "get") else {}


def maybe_initialize(cfg=None) -> bool:
    """Initialize the jax.distributed runtime when configured; no-op (and
    False) for the default single-process run.

    Resolution order for each field: `parallel.<key>` in the config, then
    the MATCHNERF_<KEY> environment variable. With only
    `parallel.multihost: true` and no explicit coordinator,
    `jax.distributed.initialize()` runs in auto-detect mode (TPU pod
    metadata / cluster env). Idempotent.
    """
    global _initialized
    if _initialized:
        return True
    par = _cfg_par(cfg)

    def field(key: str, env: str) -> Optional[str]:
        v = par.get(key)
        if v is None or v == "":
            v = os.environ.get(env)
        return None if v in (None, "") else str(v)

    coord = field("coordinator_address", "MATCHNERF_COORDINATOR_ADDRESS")
    nproc = field("num_processes", "MATCHNERF_NUM_PROCESSES")
    pid = field("process_id", "MATCHNERF_PROCESS_ID")
    multihost = field("multihost", "MATCHNERF_MULTIHOST")

    if coord is None and not (multihost and multihost.lower() not in
                              ("0", "false", "no", "off")):
        return False

    kwargs = {}
    if coord is not None:
        kwargs["coordinator_address"] = coord
    if nproc is not None:
        kwargs["num_processes"] = int(nproc)
    if pid is not None:
        kwargs["process_id"] = int(pid)
    local_ids = par.get("local_device_ids") or os.environ.get(
        "MATCHNERF_LOCAL_DEVICE_IDS")
    if local_ids not in (None, ""):
        if isinstance(local_ids, str):
            local_ids = [int(x) for x in local_ids.split(",")]
        kwargs["local_device_ids"] = [int(x) for x in local_ids]

    jax.distributed.initialize(**kwargs)
    _initialized = True
    return True


def is_initialized() -> bool:
    return _initialized


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def broadcast_str(s: str, max_len: int = 512) -> str:
    """All hosts adopt process 0's string (run names contain host-local
    timestamps / random suffixes; every host must agree on output paths).
    No-op single-process."""
    if jax.process_count() == 1:
        return s
    from jax.experimental import multihost_utils

    buf = np.zeros((max_len,), np.uint8)
    raw = s.encode("utf-8")[:max_len]
    buf[: len(raw)] = np.frombuffer(raw, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return bytes(out[out != 0]).decode("utf-8")


def broadcast_tree(tree):
    """All hosts adopt process 0's pytree (checkpoint restore on clusters
    without a shared filesystem: only host 0 may see latest.ckpt; silently
    training from per-host divergent params would corrupt the replicated
    invariant). No-op single-process."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


def make_global_array(x, sharding) -> jax.Array:
    """Turn process-local numpy data into a global `jax.Array` under
    `sharding`.

    Single-process: a plain `device_put`. Multi-process: the local data is
    this process's contiguous chunk along any process-sharded dims (for
    replicated dims every process passes the full, identical data) and JAX
    assembles the global array without any cross-host transfer.
    """
    x = np.asarray(x)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, x)
