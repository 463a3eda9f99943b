"""GMFlow multi-view matching encoder (functional JAX, NHWC).

Top-level encoder mirroring models/gmflow/gmflow.py:11-150: ImageNet
normalization, shared CNN backbone over all views, C(V,2) ordered-pair
expansion, per-window sine position embedding, cross-view feature transformer,
and the two-branch feature upsampler. Returns per-scale pair-feature stacks
[B, P, 2, h, w, C] (side 0 = lower view index of the pair), raw 1/8-res scale
first then the upsampled scale — the layout consumed by the grouped
cosine-similarity matching prior.
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from ...ops.posenc import sine_position_embedding_2d
from ...ops.resize import resize_bilinear_align_corners
from .backbone import apply_cnn_encoder, init_cnn_encoder
from .superres import apply_upsampler, init_upsampler
from .transformer import apply_feature_transformer, init_feature_transformer

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


def pair_index_lists(n_views: int) -> List[Tuple[int, int]]:
    """All ordered pairs (a, b) with a < b (gmflow.py:49, matchnerf.py:193)."""
    return [(a, b) for a in range(n_views - 1) for b in range(a + 1, n_views)]


def normalize_images(images):
    """images: [..., H, W, 3] in [0,1] -> ImageNet-normalized (gmflow.py:82-89)."""
    return (images - IMAGENET_MEAN) / IMAGENET_STD


def init_gmflow(key, feature_channels: int = 128, num_transformer_layers: int = 6,
                ffn_dim_expansion: int = 4, feature_upsampler: str = "network",
                upsample_factor: int = 2, num_scales: int = 1):
    ks = jax.random.split(key, 3)
    p = {
        "backbone": init_cnn_encoder(ks[0], output_dim=feature_channels,
                                     num_output_scales=num_scales),
        "transformer": init_feature_transformer(ks[1], num_layers=num_transformer_layers,
                                                d_model=feature_channels,
                                                ffn_dim_expansion=ffn_dim_expansion),
    }
    if feature_upsampler == "network":
        p["featup_net"] = init_upsampler(ks[2], n_feat=feature_channels,
                                         upsample_factor=upsample_factor)
    return p


def _feature_add_position(feat, attn_splits: int, feature_channels: int):
    """Add DETR sine PE per attention window (models/gmflow/utils.py:68-88).

    feat: [B,H,W,C]. When attn_splits>1 the PE is computed at window shape and
    tiled over the K x K windows — identical to split/add/merge."""
    b, h, w, c = feat.shape
    if attn_splits > 1:
        hs, ws = h // attn_splits, w // attn_splits
        pos = sine_position_embedding_2d(hs, ws, num_pos_feats=feature_channels // 2)
        pos = jnp.tile(pos, (attn_splits, attn_splits, 1))
    else:
        pos = sine_position_embedding_2d(h, w, num_pos_feats=feature_channels // 2)
    return feat + pos[None].astype(feat.dtype)


def resolve_attention_backend(backend: str = "auto") -> str:
    """'auto' -> fused Pallas flash attention on TPU, plain XLA elsewhere."""
    if backend != "auto":
        return backend
    import jax
    return "pallas" if jax.default_backend() not in ("cpu", "gpu") else "xla"


def gmflow_extract_pair_features(params, images, attn_splits_list, n_views: int,
                                 keep_raw_feats: bool = True, wo_self_attn: bool = False,
                                 wo_cross_attn: bool = False, layers_caps=None,
                                 feature_channels: int = 128, num_scales: int = 1,
                                 feature_upsampler: str = "network",
                                 attention_backend: str = "auto",
                                 compute_dtype=None, remat: bool = False,
                                 stream_sharding=None,
                                 conv_data_format: str = "NHWC"):
    """Encode source views into matched pair features.

    images: [B, V, H, W, 3] in [0,1]. Returns a list over scales of
    [B, P, 2, h, w, C] arrays (raw transformer scale first when
    keep_raw_feats, then the upsampled scale), P = C(V,2).

    compute_dtype: None/f32 for exact parity; jnp.bfloat16 runs convs and
    attention matmuls in bf16 with f32 master weights (cast in-graph; grads
    flow back to f32 through the cast) and f32 norm/softmax statistics —
    the TPU mixed-precision training policy. Outputs are cast back to f32.
    remat: checkpoint each transformer layer (recompute in backward) to cut
    activation memory for large training shapes.
    stream_sharding: optional NamedSharding with the leading (stream) axis
    partitioned — shards the B*V backbone streams and the B*P pair-side
    streams across the mesh. At the flagship batch_size=1 recipe the
    ray-sharded train step otherwise REPLICATES the whole encoder fwd+bwd
    (the dominant cost) on every chip; with this, GSPMD distributes the
    streams (gradients psum as usual). Math is per-stream, so sharding is
    numerically inert. Attention: the 'fused' window kernel runs per-shard
    via shard_map (pallas_window_attention._run_sharded); the flash kernel
    has no shard_map wrapper, so non-fused backends drop to XLA (measured
    within ~1.5% of flash at these window sizes).
    """
    cd = None
    if compute_dtype is not None and jnp.dtype(compute_dtype) != jnp.float32:
        cd = jnp.dtype(compute_dtype)
        params = jax.tree_util.tree_map(
            lambda x: x.astype(cd) if x.dtype == jnp.float32 else x, params)
    b, v, img_h, img_w, _ = images.shape
    assert v == n_views
    pairs = pair_index_lists(n_views)
    n_pairs = len(pairs)

    # ibrnet inference-size hack (gmflow.py:100-103): 756x1008 -> 768x1024
    if img_h == 756 and img_w == 1008:
        flat = images.reshape(b * v, img_h, img_w, 3)
        flat = resize_bilinear_align_corners(flat, 768, 1024)
        img_h, img_w = 768, 1024
        images = flat.reshape(b, v, img_h, img_w, 3)

    def shard_streams(x):
        if stream_sharding is None:
            return x
        return jax.lax.with_sharding_constraint(x, stream_sharding)

    if stream_sharding is not None and \
            resolve_attention_backend(attention_backend) != "fused":
        # the flash kernel has no shard_map wrapper; under GSPMD it would
        # silently all-gather its operands. The fused kernel DOES run
        # per-shard (pallas_window_attention._run_sharded), so it keeps its
        # backend; everything else drops to XLA (measured within ~1.5% of
        # flash at train window sizes).
        attention_backend = "xla"

    # backbone over all views at once (gmflow.py:51)
    net_in = normalize_images(images).reshape(b * v, img_h, img_w, 3)
    if cd is not None:
        net_in = net_in.astype(cd)
    net_in = shard_streams(net_in)
    feats = apply_cnn_encoder(params["backbone"], net_in,
                              num_output_scales=num_scales,
                              data_format=conv_data_format)
    feats = feats[::-1]  # low-to-high resolution (gmflow.py:53-54)

    all_scales = list(range(num_scales))
    if len(all_scales) != len(attn_splits_list):
        all_scales += [all_scales[-1]] * (len(attn_splits_list) - len(all_scales))
    if layers_caps is None:
        layers_caps = [None] * len(attn_splits_list)

    out_scales = []
    for att_idx, scale_idx in enumerate(all_scales):
        feat = feats[scale_idx]
        _, h, w, c = feat.shape
        feat = feat.reshape(b, v, h, w, c)

        # pair expansion: gather view features for both sides of every pair
        idx0 = jnp.array([p[0] for p in pairs])
        idx1 = jnp.array([p[1] for p in pairs])
        feat0 = shard_streams(feat[:, idx0].reshape(b * n_pairs, h, w, c))
        feat1 = shard_streams(feat[:, idx1].reshape(b * n_pairs, h, w, c))

        attn_splits = attn_splits_list[att_idx]
        feat0 = _feature_add_position(feat0, attn_splits, feature_channels)
        feat1 = _feature_add_position(feat1, attn_splits, feature_channels)

        feat0, feat1 = apply_feature_transformer(
            params["transformer"], feat0, feat1, attn_num_splits=attn_splits,
            layers_cap=layers_caps[att_idx], wo_cross_attn=wo_cross_attn,
            wo_self_attn=wo_self_attn,
            backend=resolve_attention_backend(attention_backend),
            remat=remat, stream_sharding=stream_sharding)

        if keep_raw_feats:
            out_scales.append(jnp.stack([feat0, feat1], axis=1)
                              .reshape(b, n_pairs, 2, h, w, c))

        if feature_upsampler == "network":
            merged = shard_streams(jnp.concatenate([feat0, feat1], axis=0))
            up = apply_upsampler(params["featup_net"], merged)
            up0, up1 = jnp.split(up, 2, axis=0)
            uh, uw = up0.shape[1:3]
            out_scales.append(jnp.stack([up0, up1], axis=1)
                              .reshape(b, n_pairs, 2, uh, uw, c))
        else:
            out_scales.append(jnp.stack([feat0, feat1], axis=1)
                              .reshape(b, n_pairs, 2, h, w, c))

    if cd is not None:
        out_scales = [f.astype(jnp.float32) for f in out_scales]
    return out_scales
