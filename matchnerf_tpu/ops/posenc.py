"""Positional encodings.

- DETR-style 2D sine embedding added per attention window
  (models/gmflow/position.py:9-47, models/gmflow/utils.py:68-88)
- NeRF frequency encodings: the standard pi-scaled interleaved variant
  (models/rfdecoder/nerf.py:126-133) and the legacy pi-less, frequency-major
  variant required by the shipped weights (models/rfdecoder/cond_nerf.py:108-116)
- the ray-transformer sinusoid table (models/rfdecoder/cond_nerf.py:118-127)

All are pure functions of static shapes; XLA constant-folds them under jit.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def sine_position_embedding_2d(h: int, w: int, num_pos_feats: int = 64,
                               temperature: float = 10000.0, scale: float = 2 * np.pi):
    """[h, w, 2*num_pos_feats] DETR sine embedding (normalized, y-then-x concat)."""
    y_embed = np.cumsum(np.ones((h, w), np.float32), axis=0)
    x_embed = np.cumsum(np.ones((h, w), np.float32), axis=1)
    eps = 1e-6
    y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, -1:] + eps) * scale

    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2 * np.trunc(dim_t / 2) / num_pos_feats)

    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])], axis=3).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])], axis=3).reshape(h, w, -1)
    return jnp.asarray(np.concatenate([pos_y, pos_x], axis=2))


def nerf_posenc(x, L: int):
    """Standard NeRF encoding: freq = 2^l * pi, interleaved (sin,cos) per
    coordinate then per frequency (nerf.py:126-133). x: [...,N] -> [...,2NL]."""
    shape = x.shape
    freq = (2.0 ** jnp.arange(L, dtype=jnp.float32)) * jnp.pi          # [L]
    spectrum = x[..., None] * freq                                     # [...,N,L]
    enc = jnp.stack([jnp.sin(spectrum), jnp.cos(spectrum)], axis=-2)   # [...,N,2,L]
    return enc.reshape(*shape[:-1], -1)


def nerf_posenc_legacy(x, L: int):
    """Legacy encoding without the pi factor, frequency-major layout, all sins
    then all cos (cond_nerf.py:108-116). x: [...,N] -> [...,2NL]."""
    shape = x.shape
    freq = 2.0 ** jnp.arange(L, dtype=jnp.float32)                     # [L]
    spectrum = x[..., None, :] * freq[..., :, None]                    # [...,L,N]
    spectrum = spectrum.reshape(*shape[:-1], -1)                       # [...,L*N]
    return jnp.concatenate([jnp.sin(spectrum), jnp.cos(spectrum)], axis=-1)


def ray_sinusoid_table(d_hid: int, n_samples: int):
    """[1, n_samples, d_hid] transformer position table (cond_nerf.py:118-127)."""
    pos = np.arange(n_samples)[:, None]
    hid = np.arange(d_hid)[None, :]
    table = pos / np.power(10000, 2 * (hid // 2) / d_hid)
    table[:, 0::2] = np.sin(table[:, 0::2])
    table[:, 1::2] = np.cos(table[:, 1::2])
    return jnp.asarray(table[None].astype(np.float32))
