"""Conditional NeRF decoder + emission-absorption volume rendering.

Functional re-design of models/rfdecoder/cond_nerf.py:8-127 and
models/rfdecoder/nerf.py:101-124:

- 6-layer width-128 MLP over posenc(ref-view-NDC point), every hidden state
  multiplied by a bias projected from the matching/color/mask conditioning
  (`h = Linear(h) * pts_bias(cond)`), skip-concat of the encoded input after
  layer 4
- density head: 16-d token -> ray transformer over the S depth samples of
  each ray (masked where <2 source views see the point) -> ReLU density
- view-dependent RGB head: feature + encoded ray dir -> W/2 -> sigmoid
- `composite`: quadrature with the IBRNet `wo_render_interval` convention
  (raw sigma instead of sigma*delta, nerf.py:107-113) and optional opaque
  white background for Blender

The whole decoder evaluates as a handful of [B*R*S, W] matmuls — XLA fuses
the multiplicative bias and activations into the MXU epilogue, so the hot
path is matmul-bound as intended on TPU.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...ops.nn import init_linear, linear, relu, sigmoid
from ...ops.posenc import nerf_posenc, nerf_posenc_legacy, ray_sinusoid_table
from ...utils import effective_precision
from .ray_transformer import apply_ray_attention, init_ray_attention


def cond_feat_dim(cfg) -> int:
    """sum(cos_n_group) + V*(3+1) (cond_nerf.py:18)."""
    return int(sum(cfg.encoder.cos_n_group)) + cfg.n_src_views * 4


def init_cond_nerf(key, cfg):
    W = cfg.decoder.net_width
    D = cfg.decoder.net_depth
    skip = set(cfg.decoder.skip)
    input_ch_feat = cond_feat_dim(cfg)
    L3d = cfg.decoder.posenc.L_3D if cfg.decoder.posenc else 0
    Lview = cfg.decoder.posenc.L_view if cfg.decoder.posenc else 0
    input_3d_dim = 3 + 6 * L3d if cfg.decoder.posenc else 3
    input_view_dim = 3 + 6 * Lview if cfg.decoder.posenc else 3

    ks = jax.random.split(key, D + 16)
    p = {}
    pts_linears = [init_linear(ks[0], input_3d_dim, W)]
    for i in range(D - 1):
        d_in = W + input_3d_dim if i in skip else W
        pts_linears.append(init_linear(ks[1 + i], d_in, W))
    p["pts_linears"] = pts_linears
    p["pts_bias"] = init_linear(ks[D], input_ch_feat, W)

    if cfg.nerf.view_dep:
        p["views_linears"] = [init_linear(ks[D + 1], input_view_dim + W, W // 2)]
        p["alpha_linear"] = init_linear(ks[D + 2], W, 16)
        p["ray_attention"] = init_ray_attention(ks[D + 3])
        p["out_alpha_linear"] = [init_linear(ks[D + 4], 16, 16),
                                 init_linear(ks[D + 5], 16, 1)]
        p["feature_linear"] = init_linear(ks[D + 6], W, W)
        p["rgb_linear"] = init_linear(ks[D + 7], W // 2, 3)
    else:
        p["output_linear"] = init_linear(ks[D + 1], W, 4)
    return p


def apply_cond_nerf(p, cfg, points_3d, ray_unit=None, cond_info=None):
    """Evaluate rgb + density at sample points.

    points_3d: [B,R,S,3] ref-view NDC coords; ray_unit: [B,R,S,3] ref-frame
    unit directions (when view_dep); cond_info: dict with feat_info
    [B,R,S,G], color_info [B,R,S,3V], mask_info [B,R,S,V].
    Returns rgb [B,R,S,3], density [B,R,S].
    """
    skip = set(cfg.decoder.skip)
    legacy = cfg.nerf.legacy_coord
    enc_fn = nerf_posenc_legacy if legacy else nerf_posenc

    # opt-in mixed precision for the width-W MLP (training path; the eval
    # megakernel has its own decoder_matmul_dtype knob): bf16 matmuls on the
    # heavy [B*R*S, W] layers with f32 master weights (cast in-graph, grads
    # flow back through the cast). The 16-d density head, attention softmax
    # and all outputs stay f32 — they are tiny and numerically sensitive.
    prec = effective_precision(cfg)
    cd_name = prec.get("decoder_compute_dtype") if hasattr(prec, "get") else None
    cd = jnp.bfloat16 if str(cd_name) in ("bf16", "bfloat16") else None
    cast = (lambda x: x.astype(cd)) if cd is not None else (lambda x: x)
    castp = ((lambda q: jax.tree_util.tree_map(
        lambda x: x.astype(cd) if x.dtype == jnp.float32 else x, q))
        if cd is not None else (lambda q: q))

    if cfg.decoder.posenc:
        points_enc = jnp.concatenate(
            [points_3d, enc_fn(points_3d, cfg.decoder.posenc.L_3D)], axis=-1)
    else:
        points_enc = points_3d
    points_enc = cast(points_enc)

    input_feats = jnp.concatenate(
        [cond_info["feat_info"], cond_info["color_info"], cond_info["mask_info"]], axis=-1)

    h = points_enc
    bias = linear(castp(p["pts_bias"]), cast(input_feats))
    for i, lp in enumerate(p["pts_linears"]):
        h = relu(linear(castp(lp), h) * bias)
        if i in skip:
            h = jnp.concatenate([points_enc, h], axis=-1)

    if not cfg.nerf.view_dep:
        out = linear(p["output_linear"], h).astype(jnp.float32)
        return out[..., :3], out[..., 3]

    if cfg.decoder.posenc and cfg.decoder.posenc.L_view > 0:
        ray_enc = jnp.concatenate(
            [ray_unit, enc_fn(ray_unit, cfg.decoder.posenc.L_view)], axis=-1)
    else:
        ray_enc = ray_unit

    # density branch: 16-d token + ray transformer over samples
    act_name = cfg.decoder.get("raytrans_act", "ReLU") if hasattr(cfg.decoder, "get") \
        else getattr(cfg.decoder, "raytrans_act", "ReLU")
    raytrans_act = {"ReLU": relu, "ELU": jax.nn.elu,
                    "GELU": jax.nn.gelu}[act_name or "ReLU"]
    B, R, S = h.shape[:3]
    raw_alpha = raytrans_act(linear(p["alpha_linear"], h))    # [B,R,S,16]
    if cfg.decoder.raytrans_posenc:
        raw_alpha = raw_alpha + ray_sinusoid_table(16, S)
    mask = cond_info["mask_info"]
    num_valid_obs = mask.sum(axis=-1, keepdims=True)          # [B,R,S,1]
    raw_alpha = raw_alpha.reshape(B * R, S, 16)
    nv = num_valid_obs.reshape(B * R, S, 1)
    alpha = apply_ray_attention(p["ray_attention"], raw_alpha, raw_alpha, raw_alpha,
                                mask=(nv > 1).astype(jnp.float32))
    alpha = relu(linear(p["out_alpha_linear"][1],
                        raytrans_act(linear(p["out_alpha_linear"][0], alpha))))
    if cfg.decoder.density_maskfill:
        alpha = jnp.where(nv < 1, 0.0, alpha)
    density = alpha.reshape(B, R, S)

    # rgb branch
    feature = linear(castp(p["feature_linear"]), h)
    hv = jnp.concatenate([feature, cast(ray_enc)], axis=-1)
    for lp in p["views_linears"]:
        hv = relu(linear(castp(lp), hv))
    rgb = sigmoid(linear(p["rgb_linear"], hv)
                  .astype(jnp.float32))                       # [B,R,S,3]

    return rgb, density


def composite(cfg, ray, rgb_samples, density_samples, depth_samples,
              setbg_opaque: bool = False):
    """Emission-absorption quadrature (nerf.py:101-124).

    ray: [B,R,3] unnormalized directions; rgb_samples: [B,R,S,3];
    density_samples: [B,R,S]; depth_samples: [B,R,S,1].
    Returns rgb [B,R,3], depth [B,R,1], opacity [B,R,1], prob [B,R,S,1].
    """
    ray_length = jnp.linalg.norm(ray, axis=-1, keepdims=True)          # [B,R,1]
    depth = depth_samples[..., 0]                                      # [B,R,S]
    intv = depth[..., 1:] - depth[..., :-1]
    intv = jnp.concatenate([intv, jnp.full_like(intv[..., :1], 1e10)], axis=-1)
    dist = intv * ray_length
    sigma_delta = density_samples if cfg.nerf.wo_render_interval else density_samples * dist
    alpha = 1.0 - jnp.exp(-sigma_delta)
    T = jnp.exp(-jnp.cumsum(
        jnp.concatenate([jnp.zeros_like(sigma_delta[..., :1]), sigma_delta[..., :-1]],
                        axis=-1), axis=-1))
    prob = (T * alpha)[..., None]                                      # [B,R,S,1]
    depth_out = (depth_samples * prob).sum(axis=2)                      # [B,R,1]
    rgb_out = (rgb_samples * prob).sum(axis=2)                          # [B,R,3]
    opacity = prob.sum(axis=2)                                          # [B,R,1]
    if setbg_opaque:
        rgb_out = rgb_out + (1.0 - opacity)
    return rgb_out, depth_out, opacity, prob
