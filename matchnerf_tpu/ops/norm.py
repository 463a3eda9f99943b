"""Functional normalization layers (NHWC).

- instance_norm_2d: torch `nn.InstanceNorm2d` defaults (affine=False,
  track_running_stats=False, eps=1e-5) as used throughout the GMFlow CNN
  backbone (models/gmflow/backbone.py:7,41)
- layer_norm: torch `nn.LayerNorm` over the last dim (transformer blocks,
  models/gmflow/transformer.py:134,145; ray transformer eps=1e-6,
  models/rfdecoder/ray_transformer.py:47)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def instance_norm_2d(x, eps: float = 1e-5):
    """x: [B,H,W,C]; normalize each (sample, channel) over H,W. No affine.

    Statistics always accumulate in f32 (bf16 mean/var over 20k+ pixels
    loses precision). For f32 inputs the two-pass formula is kept bit-exact
    with round-1; for the bf16 mixed-precision policy the moments come from
    single-pass f32-accumulated reduces (cast+square fuse INTO the reduce,
    so no f32 copy of the activation is ever materialized — the two-pass
    form cost 23.6 ms/step at DTU train shapes, ~18% of the whole step)
    and the normalize runs in bf16 (rounding below the bf16 activation
    quantization already in the policy)."""
    if x.dtype == jnp.float32:
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        return (x - mean) / jnp.sqrt(var + eps)
    m = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    var = jnp.mean(jnp.square(x.astype(jnp.float32) - m), axis=(1, 2),
                   keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (x - m.astype(x.dtype)) * inv.astype(x.dtype)


def layer_norm(x, scale, bias, eps: float = 1e-5):
    """Normalize over the last dimension with learned affine (f32 stats)."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    y = (x32 - mean) / jnp.sqrt(var + eps) * scale.astype(jnp.float32) \
        + bias.astype(jnp.float32)
    return y.astype(x.dtype)
