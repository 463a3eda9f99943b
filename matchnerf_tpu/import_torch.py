"""One-way importer: reference torch checkpoints -> matchnerf_tpu pytrees.

Maps the reference's `state_dict` naming (models/matchnerf.py module tree,
checkpoint layout per misc/utils.py:160-222) onto this package's plain-dict
parameter pytrees, transposing torch layouts into TPU-native ones:
Linear [out,in] -> [in,out]; Conv OIHW -> HWIO.

Two entry points:
- `import_matchnerf_checkpoint`: full model checkpoints (matchnerf_3v.pth),
  keys prefixed `feat_enc.` / `nerf_dec.` (+ optional DataParallel `module.`)
- `import_gmflow_pretrained`: GMFlow flow-pretrained weights with the
  reference's key filtering (drop transformer layers >= cap, the flow
  upsampler and refine attention; keep featup_net untouched —
  misc/utils.py:160-180)

torch is only needed to deserialize `.pth` files; state dicts of numpy
arrays work without it.
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np
import jax.numpy as jnp


def _np(t):
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    return {k: _np(v) for k, v in sd.items()}


def _strip_module(sd):
    return {re.sub(r"^module\.", "", k): v for k, v in sd.items()}


def _lin_w(w):
    return jnp.asarray(np.ascontiguousarray(w.T))          # [out,in] -> [in,out]


def _conv_w(w):
    return jnp.asarray(np.ascontiguousarray(w.transpose(2, 3, 1, 0)))  # OIHW -> HWIO


def _vec(v):
    return jnp.asarray(v)


# ------------------------------ encoder mapping -----------------------------


def _import_residual_block(sd, prefix):
    p = {
        "conv1": {"w": _conv_w(sd[f"{prefix}.conv1.weight"])},
        "conv2": {"w": _conv_w(sd[f"{prefix}.conv2.weight"])},
    }
    if f"{prefix}.downsample.0.weight" in sd:
        p["downsample"] = {"w": _conv_w(sd[f"{prefix}.downsample.0.weight"]),
                           "b": _vec(sd[f"{prefix}.downsample.0.bias"])}
    return p


def _import_backbone(sd, prefix="backbone"):
    p = {
        "conv1": {"w": _conv_w(sd[f"{prefix}.conv1.weight"])},
        "conv2": {"w": _conv_w(sd[f"{prefix}.conv2.weight"]),
                  "b": _vec(sd[f"{prefix}.conv2.bias"])},
    }
    for L in (1, 2, 3):
        p[f"layer{L}"] = [_import_residual_block(sd, f"{prefix}.layer{L}.{i}") for i in (0, 1)]
    return p


def _import_attn_layer(sd, prefix):
    p = {
        "q_proj": {"w": _lin_w(sd[f"{prefix}.q_proj.weight"])},
        "k_proj": {"w": _lin_w(sd[f"{prefix}.k_proj.weight"])},
        "v_proj": {"w": _lin_w(sd[f"{prefix}.v_proj.weight"])},
        "merge": {"w": _lin_w(sd[f"{prefix}.merge.weight"])},
        "norm1": {"scale": _vec(sd[f"{prefix}.norm1.weight"]),
                  "bias": _vec(sd[f"{prefix}.norm1.bias"])},
    }
    if f"{prefix}.mlp.0.weight" in sd:
        p["mlp"] = {"w1": {"w": _lin_w(sd[f"{prefix}.mlp.0.weight"])},
                    "w2": {"w": _lin_w(sd[f"{prefix}.mlp.2.weight"])}}
        p["norm2"] = {"scale": _vec(sd[f"{prefix}.norm2.weight"]),
                      "bias": _vec(sd[f"{prefix}.norm2.bias"])}
    return p


def _import_transformer(sd, prefix="transformer", num_layers=6):
    layers = []
    for i in range(num_layers):
        if f"{prefix}.layers.{i}.self_attn.q_proj.weight" not in sd:
            break
        layers.append({
            "self_attn": _import_attn_layer(sd, f"{prefix}.layers.{i}.self_attn"),
            "cross_attn_ffn": _import_attn_layer(sd, f"{prefix}.layers.{i}.cross_attn_ffn"),
        })
    return {"layers": layers}


def _import_upsampler(sd, prefix="featup_net"):
    def convs(name):
        out = []
        i = 0
        while f"{prefix}.{name}.{i}.weight" in sd:
            out.append({"w": _conv_w(sd[f"{prefix}.{name}.{i}.weight"]),
                        "b": _vec(sd[f"{prefix}.{name}.{i}.bias"])})
            i += 1
        return out
    return {"conv_ls": convs("conv_ls"), "conv_l2rs": convs("conv_l2rs")}


def import_gmflow_params(sd, num_layers=6, with_upsampler=True):
    p = {"backbone": _import_backbone(sd),
         "transformer": _import_transformer(sd, num_layers=num_layers)}
    if with_upsampler and "featup_net.conv_ls.0.weight" in sd:
        p["featup_net"] = _import_upsampler(sd)
    return p


def import_gmflow_pretrained(path_or_sd, existing_params, gmflow_n_blocks=6):
    """Init encoder from GMFlow flow weights, keeping the existing (randomly
    initialized) featup_net — mirrors utils.load_gmflow_checkpoint filtering
    (misc/utils.py:160-180)."""
    sd = load_torch_state_dict(path_or_sd) if isinstance(path_or_sd, str) else dict(path_or_sd)
    sd = _strip_module(sd)
    sd = {k: v for k, v in sd.items()
          if not k.startswith("upsampler") and not k.startswith("feature_flow_attn")
          and not any(k.startswith(f"transformer.layers.{i}") for i in range(gmflow_n_blocks, 6))}
    imported = import_gmflow_params(sd, num_layers=gmflow_n_blocks, with_upsampler=False)
    out = dict(existing_params)
    out["backbone"] = imported["backbone"]
    out["transformer"] = imported["transformer"]
    return out


# ------------------------------ decoder mapping -----------------------------


def _lin(sd, prefix, bias=True):
    p = {"w": _lin_w(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = _vec(sd[f"{prefix}.bias"])
    return p


def import_cond_nerf_params(sd, prefix=""):
    pre = prefix
    p = {}
    pts = []
    i = 0
    while f"{pre}pts_linears.{i}.weight" in sd:
        pts.append(_lin(sd, f"{pre}pts_linears.{i}"))
        i += 1
    p["pts_linears"] = pts
    p["pts_bias"] = _lin(sd, f"{pre}pts_bias")
    if f"{pre}views_linears.0.weight" in sd:
        p["views_linears"] = [_lin(sd, f"{pre}views_linears.0")]
        p["alpha_linear"] = _lin(sd, f"{pre}alpha_linear.0")
        p["ray_attention"] = {
            "w_qs": {"w": _lin_w(sd[f"{pre}ray_attention.w_qs.weight"])},
            "w_ks": {"w": _lin_w(sd[f"{pre}ray_attention.w_ks.weight"])},
            "w_vs": {"w": _lin_w(sd[f"{pre}ray_attention.w_vs.weight"])},
            "fc": {"w": _lin_w(sd[f"{pre}ray_attention.fc.weight"])},
            "layer_norm": {"scale": _vec(sd[f"{pre}ray_attention.layer_norm.weight"]),
                           "bias": _vec(sd[f"{pre}ray_attention.layer_norm.bias"])},
        }
        p["out_alpha_linear"] = [_lin(sd, f"{pre}out_alpha_linear.0"),
                                 _lin(sd, f"{pre}out_alpha_linear.2")]
        p["feature_linear"] = _lin(sd, f"{pre}feature_linear")
        p["rgb_linear"] = _lin(sd, f"{pre}rgb_linear")
    else:
        p["output_linear"] = _lin(sd, f"{pre}output_linear")
    return p


# ------------------------------- full model ---------------------------------


def import_matchnerf_checkpoint(path_or_sd, num_transformer_layers=6):
    """matchnerf_3v.pth-style checkpoint -> {'feat_enc':..., 'nerf_dec':...}."""
    sd = load_torch_state_dict(path_or_sd) if isinstance(path_or_sd, str) else dict(path_or_sd)
    sd = _strip_module(sd)
    enc_sd = {k[len("feat_enc."):]: v for k, v in sd.items() if k.startswith("feat_enc.")}
    dec_sd = {k[len("nerf_dec."):]: v for k, v in sd.items() if k.startswith("nerf_dec.")}
    enc_sd = _strip_module(enc_sd)   # DataParallel-wrapped children
    dec_sd = _strip_module(dec_sd)
    return {
        "feat_enc": import_gmflow_params(enc_sd, num_layers=num_transformer_layers),
        "nerf_dec": import_cond_nerf_params(dec_sd),
    }
