"""GMFlow feature transformer (functional JAX).

Six TransformerBlocks of (self-attention + cross-attention+FFN) with
single-head swin split-window attention and alternating shifted windows
(with_shift on odd layers), matching models/gmflow/transformer.py:108-339.

The two views of each pair are concatenated along the batch axis so self- and
cross-attention for both directions compute in one batched pass
(transformer.py:310-331) — on TPU this keeps the MXU fed with one large
batched matmul instead of two small ones.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.attention import (full_attention, generate_shift_window_attn_mask,
                              split_window_attention)
from ...ops.nn import gelu, init_layer_norm, linear, xavier_uniform
from ...ops.norm import layer_norm


def _init_attn_layer(key, d_model, ffn_dim_expansion=4, no_ffn=False):
    ks = jax.random.split(key, 6)
    p = {
        "q_proj": {"w": xavier_uniform(ks[0], (d_model, d_model), d_model, d_model)},
        "k_proj": {"w": xavier_uniform(ks[1], (d_model, d_model), d_model, d_model)},
        "v_proj": {"w": xavier_uniform(ks[2], (d_model, d_model), d_model, d_model)},
        "merge": {"w": xavier_uniform(ks[3], (d_model, d_model), d_model, d_model)},
        "norm1": init_layer_norm(d_model),
    }
    if not no_ffn:
        d_in = d_model * 2
        d_hid = d_in * ffn_dim_expansion
        p["mlp"] = {
            "w1": {"w": xavier_uniform(ks[4], (d_in, d_hid), d_in, d_hid)},
            "w2": {"w": xavier_uniform(ks[5], (d_hid, d_model), d_hid, d_model)},
        }
        p["norm2"] = init_layer_norm(d_model)
    return p


def _apply_attn_layer(p, source, target, h, w, attn_num_splits, with_shift,
                      shifted_window_attn_mask, backend: str = "xla",
                      stream_sharding=None):
    """source/target: [B, H*W, C]. Returns source + message (transformer.py:147-185)."""
    b, L, c = source.shape
    query = linear(p["q_proj"], source)
    key = linear(p["k_proj"], target)
    value = linear(p["v_proj"], target)

    if attn_num_splits > 1:
        kwargs = {}
        if backend == "pallas":
            from ...ops.pallas_attention import flash_window_attention
            attn_fn = flash_window_attention
        elif backend == "fused":
            from ...ops.pallas_window_attention import fused_window_attention
            attn_fn = fused_window_attention
            kwargs["stream_sharding"] = stream_sharding
        else:
            attn_fn = split_window_attention
        message = attn_fn(
            query.reshape(b, h, w, c), key.reshape(b, h, w, c), value.reshape(b, h, w, c),
            num_splits=attn_num_splits, with_shift=with_shift,
            attn_mask=shifted_window_attn_mask, **kwargs)
        message = message.reshape(b, L, c)
    else:
        message = full_attention(query, key, value)

    message = linear(p["merge"], message)
    message = layer_norm(message, **p["norm1"])

    if "mlp" in p:
        hcat = jnp.concatenate([source, message], axis=-1)
        message = linear(p["mlp"]["w2"], gelu(linear(p["mlp"]["w1"], hcat)))
        message = layer_norm(message, **p["norm2"])

    return source + message


def init_feature_transformer(key, num_layers=6, d_model=128, ffn_dim_expansion=4):
    ks = jax.random.split(key, num_layers)
    layers = []
    for i in range(num_layers):
        k_self, k_cross = jax.random.split(ks[i])
        layers.append({
            "self_attn": _init_attn_layer(k_self, d_model, ffn_dim_expansion, no_ffn=True),
            "cross_attn_ffn": _init_attn_layer(k_cross, d_model, ffn_dim_expansion, no_ffn=False),
        })
    return {"layers": layers}


def apply_feature_transformer(p, feature0, feature1, attn_num_splits: int,
                              layers_cap=None, wo_cross_attn=False, wo_self_attn=False,
                              attention_type: str = "swin", backend: str = "xla",
                              remat: bool = False, stream_sharding=None):
    """feature0/feature1: [B,H,W,C] paired views -> enhanced [B,H,W,C] each.

    Mirrors FeatureTransformer.forward (transformer.py:279-339): both views
    stacked along batch, alternating shifted windows, per-block partner swap."""
    b, h, w, c = feature0.shape
    f0 = feature0.reshape(b, h * w, c)
    f1 = feature1.reshape(b, h * w, c)

    if attention_type == "swin" and attn_num_splits > 1:
        ws_h, ws_w = h // attn_num_splits, w // attn_num_splits
        mask = generate_shift_window_attn_mask(h, w, ws_h, ws_w, ws_h // 2, ws_w // 2)
    else:
        mask = None

    concat0 = jnp.concatenate([f0, f1], axis=0)   # [2B, L, C]
    concat1 = jnp.concatenate([f1, f0], axis=0)

    n_layers = len(p["layers"]) if layers_cap is None else min(layers_cap, len(p["layers"]))

    def attn_apply(p_l, src, tgt, with_shift):
        return _apply_attn_layer(p_l, src, tgt, h, w, attn_num_splits,
                                 with_shift, mask, backend=backend,
                                 stream_sharding=stream_sharding)

    if remat:
        # recompute each attention layer in backward: activation memory per
        # layer drops to its inputs (static config closed over; with_shift
        # static so both variants get their own checkpointed trace)
        attn_apply = jax.checkpoint(attn_apply, static_argnums=(3,))
    for i in range(n_layers):
        layer = p["layers"][i]
        with_shift = attention_type == "swin" and (i % 2 == 1)
        if not wo_self_attn:
            concat0 = attn_apply(layer["self_attn"], concat0, concat0, with_shift)
        if not wo_cross_attn:
            concat0 = attn_apply(layer["cross_attn_ffn"], concat0, concat1, with_shift)
        # refresh partner: swap the two halves of the updated stack
        half0, half1 = jnp.split(concat0, 2, axis=0)
        concat1 = jnp.concatenate([half1, half0], axis=0)

    f0, f1 = jnp.split(concat0, 2, axis=0)
    return f0.reshape(b, h, w, c), f1.reshape(b, h, w, c)
