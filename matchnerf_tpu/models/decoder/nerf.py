"""Generic (unconditional) NeRF MLP decoder.

Counterpart of the reference base-class forward path
(models/rfdecoder/nerf.py:13-99): a configurable `layers_feat` MLP with skip
connections and density head plus a `layers_rgb` view-conditioned RGB branch,
TensorFlow-style Xavier init. Not exercised by the shipped MatchNeRF configs
(which always use CondNeRF) but part of the decoder family surface; useful
for per-scene-overfit baselines.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ...ops.nn import linear, relu, sigmoid
from ...ops.posenc import nerf_posenc


def _layer_dims(layers):
    return list(zip(layers[:-1], layers[1:]))


def _xavier_uniform_rows(key, d_in, d_out, gain=1.0):
    limit = gain * math.sqrt(6.0 / (d_in + d_out))
    return jax.random.uniform(key, (d_in, d_out), jnp.float32, -limit, limit)


def init_nerf(key, cfg):
    """Build mlp_feat / mlp_rgb parameter lists (nerf.py:13-41)."""
    dec = cfg.decoder
    L3d = dec.posenc.L_3D if dec.posenc else 0
    Lview = dec.posenc.L_view if dec.posenc else 0
    input_3d_dim = 3 + 6 * L3d if dec.posenc else 3
    input_view_dim = 3 + 6 * Lview if dec.posenc else 3
    skip = set(dec.skip)
    relu_gain = math.sqrt(2.0)

    p = {"mlp_feat": [], "mlp_rgb": []}
    ks = iter(jax.random.split(key, 64))

    dims = _layer_dims(dec.layers_feat)
    for li, (k_in, k_out) in enumerate(dims):
        if li == 0:
            k_in = input_3d_dim
        if li in skip:
            k_in += input_3d_dim
        if li == len(dims) - 1:
            k_out += 1                        # +1 density channel
        gain = relu_gain if li != len(dims) - 1 else 1.0
        w = _xavier_uniform_rows(next(ks), k_in, k_out, gain=gain)
        p["mlp_feat"].append({"w": w, "b": jnp.zeros((k_out,), jnp.float32)})

    feat_dim = dec.layers_feat[-1]
    dims = _layer_dims(dec.layers_rgb)
    for li, (k_in, k_out) in enumerate(dims):
        if li == 0:
            k_in = feat_dim + (input_view_dim if cfg.nerf.view_dep else 0)
        gain = 1.0 if li == len(dims) - 1 else relu_gain
        w = _xavier_uniform_rows(next(ks), k_in, k_out, gain=gain)
        p["mlp_rgb"].append({"w": w, "b": jnp.zeros((k_out,), jnp.float32)})
    return p


def apply_nerf(p, cfg, points_3d, ray_unit=None, rng: Optional[jax.Array] = None,
               mode: Optional[str] = None):
    """points_3d: [...,3] -> (rgb [...,3], density [...]) (nerf.py:55-89)."""
    dec = cfg.decoder
    skip = set(dec.skip)
    if dec.posenc:
        points_enc = jnp.concatenate(
            [points_3d, nerf_posenc(points_3d, dec.posenc.L_3D)], axis=-1)
    else:
        points_enc = points_3d

    feat = points_enc
    density = None
    for li, lp in enumerate(p["mlp_feat"]):
        if li in skip:
            feat = jnp.concatenate([feat, points_enc], axis=-1)
        feat = linear(lp, feat)
        if li == len(p["mlp_feat"]) - 1:
            density = feat[..., 0]
            if cfg.nerf.density_noise_reg and mode == "train":
                assert rng is not None
                density = density + jax.random.normal(
                    rng, density.shape) * cfg.nerf.density_noise_reg
            activ = {"relu_": relu, "relu": relu, "abs_": jnp.abs, "abs": jnp.abs,
                     "sigmoid_": sigmoid, "sigmoid": sigmoid,
                     "exp_": jnp.exp, "exp": jnp.exp,
                     "softplus": jax.nn.softplus}[dec.get("density_activ", "relu_")]
            density = activ(density)
            feat = feat[..., 1:]
        feat = relu(feat)

    if cfg.nerf.view_dep:
        assert ray_unit is not None
        if dec.posenc:
            ray_enc = jnp.concatenate(
                [ray_unit, nerf_posenc(ray_unit, dec.posenc.L_view)], axis=-1)
        else:
            ray_enc = ray_unit
        feat = jnp.concatenate([feat, ray_enc], axis=-1)
    for li, lp in enumerate(p["mlp_rgb"]):
        feat = linear(lp, feat)
        if li != len(p["mlp_rgb"]) - 1:
            feat = relu(feat)
    return sigmoid(feat), density
