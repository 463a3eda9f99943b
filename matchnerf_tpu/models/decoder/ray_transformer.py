"""IBRNet-style multi-head attention over per-ray depth samples.

Functional port of models/rfdecoder/ray_transformer.py:6-79: 4 heads on a
16-d token, bias-free q/k/v/out projections, residual + LayerNorm(eps=1e-6).
The mask multiplies over the *query* axis exactly as the reference's
broadcasted masked_fill does (mask [B, L, 1] -> rows with mask==0 get a
uniform attention distribution, ray_transformer.py:14-26,65-67).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.nn import xavier_uniform
from ...ops.norm import layer_norm


def init_ray_attention(key, n_head=4, d_model=16, d_k=4, d_v=4):
    ks = jax.random.split(key, 4)
    return {
        "w_qs": {"w": xavier_uniform(ks[0], (d_model, n_head * d_k), d_model, n_head * d_k)},
        "w_ks": {"w": xavier_uniform(ks[1], (d_model, n_head * d_k), d_model, n_head * d_k)},
        "w_vs": {"w": xavier_uniform(ks[2], (d_model, n_head * d_v), d_model, n_head * d_v)},
        "fc": {"w": xavier_uniform(ks[3], (n_head * d_v, d_model), n_head * d_v, d_model)},
        "layer_norm": {"scale": jnp.ones((d_model,), jnp.float32),
                       "bias": jnp.zeros((d_model,), jnp.float32)},
    }


def apply_ray_attention(p, q_in, k_in, v_in, mask=None, n_head=4, d_k=4, d_v=4):
    """q_in/k_in/v_in: [B, L, d_model]; mask: [B, L, 1] floats (0 masks the
    query row). Returns [B, L, d_model]."""
    B, L, _ = q_in.shape
    residual = q_in

    q = (q_in @ p["w_qs"]["w"]).reshape(B, L, n_head, d_k).transpose(0, 2, 1, 3)
    k = (k_in @ p["w_ks"]["w"]).reshape(B, L, n_head, d_k).transpose(0, 2, 1, 3)
    v = (v_in @ p["w_vs"]["w"]).reshape(B, L, n_head, d_v).transpose(0, 2, 1, 3)

    attn = jnp.einsum("bhld,bhmd->bhlm", q / jnp.sqrt(jnp.float32(d_k)), k)
    if mask is not None:
        # reference broadcast: mask [B,1,L,1] fills along the last axis, i.e.
        # masked *queries* see -1e9 everywhere -> uniform rows
        attn = jnp.where(mask[:, None, :, :] == 0, -1e9, attn)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhlm,bhmd->bhld", attn, v)

    out = out.transpose(0, 2, 1, 3).reshape(B, L, n_head * d_v)
    out = out @ p["fc"]["w"] + residual
    return layer_norm(out, **p["layer_norm"], eps=1e-6)
