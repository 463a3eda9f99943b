"""Fused bilinear-interpolation + grouped-cosine Pallas kernel (TPU).

After the packed gathers, the XLA path materializes per-view interpolated
feature vectors [N, (V-1)C] in f32 and re-reads them for the cosine — several
GB of HBM traffic per render slice. This kernel consumes the raw gather rows
(all four taps) directly in VMEM and emits only the [N, G] grouped cosine
similarities (matchnerf.py:262-271 semantics: per-pair channel-group cosine,
averaged over pairs).

Forward-only (the training step keeps the differentiable XLA path); used by
the renderer's eval/video paths.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fused_interp_grouped_cosine(rows, weights, n_views: int, chunk_c: int,
                                n_groups: int, pairs: List[Tuple[int, int]],
                                block_points: int = 256,
                                interpret: Optional[bool] = None):
    """rows: [V, N, 4*(V-1)*chunk_c] gather outputs (any float dtype);
    weights: [V, N, 2] (wx, wy); returns [N, G] f32 pair-mean grouped cosine.

    Chunk layout matches `prepare_sampling_tables`: view v's channels are its
    pair chunks in pair order; for pair (i, j) compare view i's chunk (j-1)
    with view j's chunk i.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    V, N, C4 = rows.shape
    Cc = (n_views - 1) * chunk_c
    assert C4 == 4 * Cc
    n_pairs = len(pairs)
    Cg = chunk_c // n_groups

    def kernel(rows_ref, w_ref, out_ref):
        # interp per view with 2D ops only (Mosaic dislikes 3D shape casts)
        interp = []
        for v in range(V):
            rw = rows_ref[v].astype(jnp.float32)               # (T,4Cc)
            wx = w_ref[v, :, 0][:, None]
            wy = w_ref[v, :, 1][:, None]
            t00 = rw[:, 0 * Cc:1 * Cc]
            t01 = rw[:, 1 * Cc:2 * Cc]
            t10 = rw[:, 2 * Cc:3 * Cc]
            t11 = rw[:, 3 * Cc:4 * Cc]
            interp.append((t00 * (1 - wx) + t01 * wx) * (1 - wy)
                          + (t10 * (1 - wx) + t11 * wx) * wy)  # (T,Cc)

        group_cols = []                                        # n_groups x (T,1)
        for g in range(n_groups):
            acc_g = None
            for (i, j) in pairs:
                ca, cb = j - 1, i
                fa = interp[i][:, ca * chunk_c + g * Cg: ca * chunk_c + (g + 1) * Cg]
                fb = interp[j][:, cb * chunk_c + g * Cg: cb * chunk_c + (g + 1) * Cg]
                dot = (fa * fb).sum(axis=1, keepdims=True)
                na = jnp.maximum(jnp.sqrt((fa * fa).sum(axis=1, keepdims=True)), 1e-8)
                nb = jnp.maximum(jnp.sqrt((fb * fb).sum(axis=1, keepdims=True)), 1e-8)
                cosg = dot / (na * nb)
                acc_g = cosg if acc_g is None else acc_g + cosg
            group_cols.append(acc_g / n_pairs)
        out_ref[:] = jnp.concatenate(group_cols, axis=1)

    pad = (-N) % block_points
    if pad:
        rows = jnp.pad(rows, ((0, 0), (0, pad), (0, 0)))
        weights = jnp.pad(weights, ((0, 0), (0, pad), (0, 0)))
    Np = N + pad

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Np, n_groups), jnp.float32),
        grid=(Np // block_points,),
        in_specs=[
            pl.BlockSpec((V, block_points, C4), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V, block_points, 2), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_points, n_groups), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rows, weights)
    return out[:N]
