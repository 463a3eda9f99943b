"""Functional normalization layers (NHWC).

- instance_norm_2d: torch `nn.InstanceNorm2d` defaults (affine=False,
  track_running_stats=False, eps=1e-5) as used throughout the GMFlow CNN
  backbone (models/gmflow/backbone.py:7,41)
- layer_norm: torch `nn.LayerNorm` over the last dim (transformer blocks,
  models/gmflow/transformer.py:134,145; ray transformer eps=1e-6,
  models/rfdecoder/ray_transformer.py:47)
"""
from __future__ import annotations

import jax.numpy as jnp


def instance_norm_2d(x, eps: float = 1e-5):
    """x: [B,H,W,C]; normalize each (sample, channel) over H,W. No affine.

    Statistics always in f32 (identical for f32 inputs; required for the
    bf16 mixed-precision encoder policy — bf16 mean/var over 20k+ pixels
    loses precision)."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=(1, 2), keepdims=True)
    var = x32.var(axis=(1, 2), keepdims=True)
    return ((x32 - mean) / jnp.sqrt(var + eps)).astype(x.dtype)


def layer_norm(x, scale, bias, eps: float = 1e-5):
    """Normalize over the last dimension with learned affine (f32 stats)."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    y = (x32 - mean) / jnp.sqrt(var + eps) * scale.astype(jnp.float32) \
        + bias.astype(jnp.float32)
    return y.astype(x.dtype)
