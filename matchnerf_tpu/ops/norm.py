"""Functional normalization layers (NHWC).

- instance_norm_2d: torch `nn.InstanceNorm2d` defaults (affine=False,
  track_running_stats=False, eps=1e-5) as used throughout the GMFlow CNN
  backbone (models/gmflow/backbone.py:7,41)
- layer_norm: torch `nn.LayerNorm` over the last dim (transformer blocks,
  models/gmflow/transformer.py:134,145; ray transformer eps=1e-6,
  models/rfdecoder/ray_transformer.py:47)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def instance_norm_2d(x, eps: float = 1e-5, axes=(1, 2)):
    """x: [B,H,W,C] (axes=(1,2), default) or [B,C,H,W] (axes=(2,3) — the
    NCHW backbone layout experiment); normalize each (sample, channel) over
    the spatial axes. No affine.

    Statistics always accumulate in f32 (bf16 mean/var over 20k+ pixels
    loses precision). For f32 inputs the two-pass formula is kept bit-exact
    with round-1; for the bf16 mixed-precision policy the moments come from
    single-pass f32-accumulated reduces (cast+square fuse INTO the reduce,
    so no f32 copy of the activation is ever materialized — the two-pass
    form cost 23.6 ms/step at DTU train shapes, ~18% of the whole step)
    and the normalize runs in bf16 (rounding below the bf16 activation
    quantization already in the policy).

    Custom VJP: the analytic dx = inv*(dy - mean(dy) - xh*mean(dy*xh))
    in two fused reduction passes — autodiff's var backward alone measured
    6.2 ms/step at DTU train shapes."""
    y, _ = _in2d_fwd_impl(x, eps, axes)
    return y


def _in2d_fwd_impl(x, eps, axes=(1, 2)):
    if x.dtype == jnp.float32:
        m = x.mean(axis=axes, keepdims=True)
        var = x.var(axis=axes, keepdims=True)
        # divide (not reciprocal-multiply): bit-exact with round-1 — the
        # ulp difference tripped 1e-5 batch-consistency tolerances
        return (x - m) / jnp.sqrt(var + eps), (m, 1.0 / jnp.sqrt(var + eps))
    m = jnp.mean(x, axis=axes, keepdims=True, dtype=jnp.float32)
    var = jnp.mean(jnp.square(x.astype(jnp.float32) - m), axis=axes,
                   keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (x - m.astype(x.dtype)) * inv.astype(x.dtype), (m, inv)


def _in2d_fwd(x, eps, axes):
    y, (m, inv) = _in2d_fwd_impl(x, eps, axes)
    return y, (x, m, inv)


def _in2d_bwd(eps, axes, res, dy):
    x, m, inv = res
    f32 = x.dtype == jnp.float32
    xh = (x - m.astype(x.dtype)) * inv.astype(x.dtype)     # recompute
    a = jnp.mean(dy, axis=axes, keepdims=True, dtype=jnp.float32)
    b = jnp.mean((dy * xh).astype(jnp.float32), axis=axes, keepdims=True) \
        if not f32 else jnp.mean(dy * xh, axis=axes, keepdims=True)
    dx = (dy - a.astype(x.dtype) - xh * b.astype(x.dtype)) \
        * inv.astype(x.dtype)
    return (dx,)


instance_norm_2d.defvjp(_in2d_fwd, _in2d_bwd)


def layer_norm(x, scale, bias, eps: float = 1e-5):
    """Normalize over the last dimension with learned affine (f32 stats)."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    y = (x32 - mean) / jnp.sqrt(var + eps) * scale.astype(jnp.float32) \
        + bias.astype(jnp.float32)
    return y.astype(x.dtype)
