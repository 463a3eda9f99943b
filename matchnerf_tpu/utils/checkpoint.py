"""Checkpoint save/restore for parameter/optimizer pytrees.

Plays the role of the reference's torch `.pth` handling (misc/utils.py:160-222,
coach.py:290-300): `latest.ckpt` carries model+optim+sched state for resume;
per-epoch `ep{E}_it{I}.ckpt` backups carry weights only. Serialization is
flax msgpack over the pytree (restore requires a template of the same
structure, which the engine always has after init).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

from .logging import log


def _to_numpy(tree):
    # to_state_dict flattens optax NamedTuple states into plain dicts first
    tree = serialization.to_state_dict(tree)
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


_async_pool = None


def _write_atomic(path: str, payload: bytes):
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)


def save_checkpoint(output_path: str, checkpoint: Dict[str, Any], ep: int, it: int,
                    backup_ckpt: bool = True, async_write: bool = False):
    """Write latest.ckpt (+ optional weight-only epoch backup).

    async_write=True serializes on the caller (device->host copy) but does
    the file IO on a background thread so training never blocks on disk —
    the elastic-checkpointing behavior SURVEY.md §5 calls for. Writes are
    atomic (tmp + rename) so a preemption mid-write can't corrupt latest.ckpt."""
    ckpt_dir = os.path.join(output_path, "models")
    os.makedirs(ckpt_dir, exist_ok=True)
    checkpoint = dict(checkpoint)
    checkpoint.update(epoch=ep, iter=it)
    payload = serialization.msgpack_serialize(_to_numpy(checkpoint))
    jobs = [(os.path.join(ckpt_dir, "latest.ckpt"), payload)]
    if backup_ckpt:
        # weights-only backup (no optim/sched state), misc/utils.py:217-222
        slim = {k: v for k, v in checkpoint.items() if k not in ("optim", "sched")}
        jobs.append((os.path.join(ckpt_dir, f"ep{ep}_it{it}.ckpt"),
                     serialization.msgpack_serialize(_to_numpy(slim))))

    if async_write:
        global _async_pool
        if _async_pool is None:
            from concurrent.futures import ThreadPoolExecutor
            _async_pool = ThreadPoolExecutor(max_workers=1)
        for path, data in jobs:
            _async_pool.submit(_write_atomic, path, data)
    else:
        for path, data in jobs:
            _write_atomic(path, data)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_into(template, restored):
    """Shape the raw msgpack tree into `template`'s pytree structure."""
    return serialization.from_state_dict(template, restored)


def restore_checkpoint(params, ckpt_path: str, resume: bool = False,
                       optim_state=None):
    """Restore model params (and optionally optimizer state + progress).

    Accepts both our msgpack checkpoints and reference `.pth` files (imported
    through `import_torch` — weights only)."""
    if ckpt_path.endswith(".pth"):
        from ..import_torch import import_matchnerf_checkpoint
        log.info(f"importing torch checkpoint {ckpt_path}")
        return import_matchnerf_checkpoint(ckpt_path), None, 0, 0

    raw = load_checkpoint(ckpt_path)
    new_params = restore_into(params, raw["model"])
    ep = int(raw.get("epoch", 0) or 0)
    it = int(raw.get("iter", 0) or 0)
    new_opt = None
    if resume and optim_state is not None and "optim" in raw:
        new_opt = restore_into(optim_state, raw["optim"])
    return new_params, new_opt, ep, it
