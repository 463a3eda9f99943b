"""MatchNeRF model: encoder + matching prior + conditional NeRF renderer.

Functional re-design of models/matchnerf.py:13-325. The jittable core is
`render_rays`: given target-ray pixel coords, camera tensors, source images
and encoded pair features, it casts rays, samples depth, projects samples
into every source view, builds the grouped cosine-similarity matching prior
(matchnerf.py:209-293), evaluates the conditional NeRF and composites — all
with static shapes batched over [B, R, S].

Design notes (TPU-first):
- the per-view / per-pair python loops of the reference become `vmap`s over
  stacked view/pair axes -> a few large gathers and matmuls
- the reference computes the view-0 NDC projection twice (matchnerf.py:126
  and :232); here it is computed once and reused
- the legacy float64 target-pose inverse (camera.py:231-240) is precomputed
  host-side; the jitted graph takes `tgt_c2w` directly
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from .. import camera
from ..utils import effective_precision
from ..ops.grid_sample import (grid_sample_2d, grid_sample_2d_packed,
                               in_frustum_mask, pack_2x2, packed_rows_and_weights,
                               sample_features_by_grid)
from .decoder.cond_nerf import apply_cond_nerf, composite, init_cond_nerf
from .gmflow.gmflow import gmflow_extract_pair_features, init_gmflow, pair_index_lists


def init_matchnerf(key, cfg):
    k_enc, k_dec = jax.random.split(key)
    return {
        "feat_enc": init_gmflow(
            k_enc, feature_channels=128,
            num_transformer_layers=cfg.encoder.num_transformer_layers,
            ffn_dim_expansion=4,
            feature_upsampler=cfg.encoder.feature_upsampler,
            upsample_factor=cfg.encoder.upsample_factor),
        "nerf_dec": init_cond_nerf(k_dec, cfg),
    }


def encode(params, cfg, ref_images, stream_sharding=None) -> List[jnp.ndarray]:
    """ref_images: [B, V, H, W, 3] in [0,1] -> per-scale [B,P,2,h,w,C] stacks
    (matchnerf.py:183-207 / gmflow.py:91-150).

    precision.encoder_compute_dtype='bfloat16' runs the encoder under the
    mixed-precision policy (bf16 convs/matmuls, f32 master weights and
    norm/softmax stats); precision.remat_encoder checkpoints the transformer
    layers. Defaults (f32, no remat) are bit-exact with round-1.
    stream_sharding: see gmflow_extract_pair_features — distributes the
    encoder's view/pair streams across a device mesh."""
    prec = effective_precision(cfg)
    get = prec.get if hasattr(prec, "get") else (lambda *_: None)
    cd_name = get("encoder_compute_dtype", None)
    cd = jnp.bfloat16 if str(cd_name) in ("bf16", "bfloat16") else None
    return gmflow_extract_pair_features(
        params["feat_enc"], ref_images,
        attn_splits_list=list(cfg.encoder.attn_splits_list),
        n_views=cfg.n_src_views, keep_raw_feats=True,
        wo_self_attn=cfg.encoder.wo_self_attn,
        attention_backend=str(cfg.encoder.get("attention_backend", "auto")),
        compute_dtype=cd, remat=bool(get("remat_encoder", False)),
        stream_sharding=stream_sharding,
        conv_data_format=str(cfg.encoder.get("conv_data_format", "NHWC")))


def sample_depth(cfg, near_far, batch_size: int, num_rays: int,
                 rng: Optional[jax.Array] = None, stratified: bool = False):
    """[B,R,S,1] depth samples (matchnerf.py:163-181). `near_far`: [B,2] of the
    target pose; legacy uses 0 shift and S-1 denominator."""
    S = cfg.nerf.sample_intvs
    legacy = cfg.nerf.legacy_coord
    rand_shift = 0.0 if legacy else 0.5
    denom = (S - 1) if legacy else S
    if stratified:
        assert rng is not None
        rand = jax.random.uniform(rng, (batch_size, num_rays, S, 1))
    else:
        rand = jnp.full((batch_size, num_rays, S, 1), rand_shift, jnp.float32)
    rand = rand + jnp.arange(S, dtype=jnp.float32)[None, None, :, None]
    dmin = near_far[:, :1].reshape(batch_size, 1, 1, 1)
    dmax = near_far[:, 1:].reshape(batch_size, 1, 1, 1)
    depth = rand / denom * (dmax - dmin) + dmin
    if cfg.nerf.depth.param == "inverse":
        depth = 1.0 / (depth + 1e-8)
    return depth


def prepare_sampling_tables(cfg, pair_feats, ref_images, feat_dtype=None,
                            color_dtype=None, keep_unpacked: bool = False):
    """Pack feature maps and source images into 2x2-tap sampling tables.

    Done once per image set (amortized over all render slices/frames). Two
    structural rewrites of the query, both numerically identical to the
    reference's per-tap sampling:

    - `pack_2x2`: each pixel's four bilinear taps live in one row, so the hot
      loop does ONE gather per point instead of four (TPU gathers are
      byte/index-bound)
    - view-major channel concat: all pair-side features a view contributes
      (chunk order = pair order, matching matchnerf.py:198-203) merge into a
      single table per (view, scale), collapsing 12 feature gathers into 6

    feat_dtype=jnp.int8 additionally quantizes each feature table with a
    per-(view, channel) abs-max scale, halving gather bytes vs bf16; the
    dequant scale is applied AFTER bilinear interpolation, which is exact
    w.r.t. the quantized table because interpolation is linear per channel.

    color_dtype=jnp.uint8 stores the color table as round(img*255): 4x fewer
    gather bytes, and EXACT for real datasets (the loaders produce u8/255
    images) — the /255 dequant is applied after interpolation. The full-res
    u8 table (~3.9MB/view at 640x512) also gathers ~4x faster on v5e (tables
    under ~5MB stay VMEM-resident: tools/bench_gather.py sweep H).

    Returns {'view_feats': [per scale: [B,V,h,w,4*(V-1)*C]],
             'view_feat_scales': [per scale: [B,V,(V-1)*C] or None],
             'colors': [B,V,H,W,12], 'color_scale': float or None}.
    """
    n_views = cfg.n_src_views
    pairs = pair_index_lists(n_views)
    view_feats, view_scales, view_unpacked = [], [], []
    # feat_dtype may be a per-scale list (e.g. [int8, "int4"]: keep the small
    # raw-scale table at int8, drop the 4x-bigger upsampled one to int4)
    per_scale_dtypes = feat_dtype if isinstance(feat_dtype, (list, tuple)) \
        else [feat_dtype] * len(pair_feats)
    for scale_i, feats in enumerate(pair_feats):
        feat_dtype = per_scale_dtypes[scale_i]
        B, P, _, h, w, C = feats.shape
        per_view = []
        for v in range(n_views):
            chunks = [feats[:, p_idx, 0 if v == a else 1]
                      for p_idx, (a, b) in enumerate(pairs) if v in (a, b)]
            per_view.append(jnp.concatenate(chunks, axis=-1))     # [B,h,w,(V-1)C]
        stacked = jnp.stack(per_view, axis=1)                      # [B,V,h,w,(V-1)C]
        if feat_dtype is not None and str(feat_dtype).startswith("int4"):
            # nibble-packed int4 (uint8 carrier, bias +8): halves gather
            # bytes vs int8 AND drops the scale-1 table under the ~5MB
            # VMEM-residency window (tools/bench_gather.py sweep H). uint8
            # feature tables are the int4 marker downstream. "int4pXX.X"
            # clips the per-channel scale at the XX.X abs-percentile
            # (saturating outliers instead of inflating the quant step).
            from ..ops.grid_sample import pack_int4_channels
            name = str(feat_dtype)
            if name.startswith("int4p"):
                pct = float(name[len("int4p"):])
                B_, V_ = stacked.shape[:2]
                amax = jnp.percentile(
                    jnp.abs(stacked).reshape(B_, V_, h * w, -1), pct,
                    axis=2)[:, :, None, None, :]
            else:
                amax = jnp.max(jnp.abs(stacked), axis=(2, 3), keepdims=True)
            scale = jnp.maximum(amax, 1e-12) / 7.0                 # [B,V,1,1,C']
            q = jnp.clip(jnp.round(stacked / scale), -8, 7) \
                .astype(jnp.int32) + 8
            stacked = pack_int4_channels(q)
            view_scales.append(scale[:, :, 0, 0])                  # [B,V,C']
        elif feat_dtype is not None and jnp.dtype(feat_dtype) == jnp.int8:
            amax = jnp.max(jnp.abs(stacked), axis=(2, 3), keepdims=True)
            scale = jnp.maximum(amax, 1e-12) / 127.0               # [B,V,1,1,C']
            stacked = jnp.clip(jnp.round(stacked / scale), -127, 127) \
                .astype(jnp.int8)
            view_scales.append(scale[:, :, 0, 0])                  # [B,V,C']
        else:
            if feat_dtype is not None:
                stacked = stacked.astype(feat_dtype)
            view_scales.append(None)
        if keep_unpacked:
            # the block-banded kernel gathers from the 4x-smaller unpacked
            # table (its dilated union covers every bilinear tap); int4
            # scales store None -> that scale falls back per-ray
            view_unpacked.append(None if stacked.dtype == jnp.uint8
                                 else stacked)
        packed = pack_2x2(stacked.reshape(B * n_views, h, w, -1))
        view_feats.append(packed.reshape(B, n_views, h, w, -1))
    B, V, H, W, _ = ref_images.shape
    color_scale = None
    colors_sc = None
    if color_dtype is not None and jnp.dtype(color_dtype) == jnp.uint8:
        ref_images = jnp.round(jnp.clip(ref_images, 0.0, 1.0) * 255.0) \
            .astype(jnp.uint8)
        color_scale = 1.0 / 255.0
        prec = effective_precision(cfg)
        want_sc = bool(prec.get("color_block_kernel", True)) \
            if hasattr(prec, "get") else True
        if keep_unpacked and B == 1 and want_sc:
            # supercell color table for the block-union color kernel
            # (ops/pallas_color.py): one 5x5-window row per 4x4 supercell
            from ..ops.pallas_color import build_supercell_colors
            colors_sc = build_supercell_colors(
                ref_images.reshape(B * V, H, W, 3))
            colors_sc = colors_sc.reshape(B, V, *colors_sc.shape[1:])
    packed_colors = pack_2x2(ref_images.reshape(B * V, H, W, 3)) \
        .reshape(B, V, H, W, 12)
    out = {"view_feats": view_feats, "view_feat_scales": view_scales,
           "colors": packed_colors, "color_scale": color_scale}
    if keep_unpacked:
        out["view_feats_unpacked"] = view_unpacked
        out["colors_sc"] = colors_sc
    return out


def _grouped_cosine(a, b, n_groups: int, eps: float = 1e-8):
    """Split channels into groups and cosine-compare (matchnerf.py:262-268).

    a, b: [B,R,S,C] -> [B,R,S,G]; channel-major grouping matches the torch
    reshape (B, G, C/G, ...)."""
    B, R, S, C = a.shape
    ag = a.reshape(B, R, S, n_groups, C // n_groups)
    bg = b.reshape(B, R, S, n_groups, C // n_groups)
    dot = (ag * bg).sum(-1)
    na = jnp.maximum(jnp.linalg.norm(ag, axis=-1), eps)
    nb = jnp.maximum(jnp.linalg.norm(bg, axis=-1), eps)
    return dot / (na * nb)


def query_cond_info(cfg, pts_3d, ref_w2c, ref_intr, ref_near_far, ref_images,
                    pair_feats: List[jnp.ndarray], img_h: int, img_w: int,
                    tables: Optional[dict] = None, fused_cosine: bool = False,
                    banded_kt: Optional[tuple] = None,
                    banded_impl: str = "xla",
                    block_ut: Optional[tuple] = None,
                    color_ut: Optional[int] = None,
                    lane_major: bool = False):
    """Build the decoder conditioning from source views (matchnerf.py:209-293).

    pts_3d: [B,R,S,3] world points; ref_* : [B,V,...]; ref_images [B,V,H,W,3];
    pair_feats: per-scale [B,P,2,h,w,C].
    Returns dict(feat_info [B,R,S,sum(G)], color_info [B,R,S,3V],
    mask_info [B,R,S,V]) and the view-0 NDC coords [B,R,S,3] for reuse.

    lane_major=True (precision.lanemajor_cond) requests the decoder
    megakernel's native [N,ch,S] layout straight from the block/color
    kernels, skipping the [B,R,S,ch] round trip (two poorly-tiled
    small-channel XLA transposes per array). Honored only when EVERY chunk
    rides a lane-major-capable kernel (all scales on the block path, colors
    on the supercell kernel, B==1); otherwise the standard layout is
    returned and the caller transposes as usual. When honored, the returned
    dict carries lane_major=True with feat_info [R,sum(G),S], color_info
    [R,16,S] (rows 3V.. zero), mask_info [R,V,S] — bit-identical values.
    """
    B, V = ref_images.shape[:2]
    cos_n_group = cfg.encoder.cos_n_group
    cos_n_group = [cos_n_group] if isinstance(cos_n_group, int) else list(cos_n_group)
    inv_scale = jnp.tile(jnp.array([[img_w - 1, img_h - 1]], jnp.float32), (B, 1))

    # projected normalized coords per view: [V,B,R,S,3]
    ndc_all = jax.vmap(
        lambda extr, intr, nf: camera.get_coord_ref_ndc(extr, intr, pts_3d, inv_scale, nf),
        in_axes=(1, 1, 1))(ref_w2c, ref_intr, ref_near_far)
    grids = ndc_all[..., :2] * 2.0 - 1.0                          # [V,B,R,S,2]

    # lane-major eligibility: every feat scale must take the block-kernel
    # branch and colors the supercell kernel (see docstring)
    lane = (bool(lane_major) and B == 1 and tables is not None
            and hasattr(tables, "get") and not bool(fused_cosine)
            and cfg.encoder.feature_sample_local_radius <= 0
            and banded_impl == "block" and banded_kt is not None
            and block_ut is not None and color_ut is not None)
    if lane:
        _unp = tables.get("view_feats_unpacked")
        _scl = tables.get("view_feat_scales")
        lane = (tables.get("colors_sc") is not None and _unp is not None
                and _scl is not None
                and all(_unp[s] is not None and _scl[s] is not None
                        and banded_kt[s] is not None
                        and block_ut[s] is not None
                        for s in range(len(tables["view_feats"]))))

    # colors + masks per view (matchnerf.py:244-250); one gather per view —
    # vmapping stacks the tables into a single 3M-index gather whose source
    # exceeds the ~5MB VMEM-residency cliff (tools/bench_gather.py sweep H)
    if tables is not None:
        csc = tables.get("colors_sc") if hasattr(tables, "get") else None
        if color_ut is not None and csc is not None and B == 1:
            # supercell block-union color kernel (ops/pallas_color.py):
            # one union-row gather + bilinear collapse per 8-ray block
            # instead of one point-gather per (sample, view)
            from ..ops.pallas_color import supercell_color_sample
            colors = supercell_color_sample(csc, grids, img_h, img_w,
                                            ut=color_ut,
                                            lane_major=lane)
            # [V,1,R,S,3], or lane-major [R,16,S]
        else:
            colors = jnp.stack([grid_sample_2d_packed(tables["colors"][:, v],
                                                      grids[v])
                                for v in range(V)], axis=0)         # [V,B,R,S,3]
        cscale = tables.get("color_scale") if hasattr(tables, "get") else None
        if cscale is not None:
            colors = colors.astype(jnp.float32) * cscale
    else:
        colors = jax.vmap(lambda img, g: grid_sample_2d(img, g), in_axes=(1, 0))(
            ref_images, grids)                                     # [V,B,R,S,3]
    masks = in_frustum_mask(grids)                                 # [V,B,R,S]
    if lane:
        color_info = colors                                        # [R,16,S]
        mask_info = jnp.swapaxes(masks[:, 0], 0, 1)                # [R,V,S]
    else:
        color_info = jnp.moveaxis(colors, 0, -2).reshape(B, *pts_3d.shape[1:3], V * 3)
        mask_info = jnp.moveaxis(masks, 0, -1)                     # [B,R,S,V]

    # grouped cosine similarity per scale, averaged over pairs
    pairs = pair_index_lists(V)
    local_r = cfg.encoder.feature_sample_local_radius
    local_d = cfg.encoder.feature_sample_local_dilation
    use_packed = tables is not None and local_r <= 0
    fused = bool(fused_cosine) and use_packed and B == 1
    feat_chunks = []
    if use_packed:
        # one gather per (view, scale); then pair (i,j) compares view i's
        # chunk (j-1) against view j's chunk i — the reference's split/index
        # scheme (matchnerf.py:259-268)
        for scale_idx, vfeats in enumerate(tables["view_feats"]):
            G = cos_n_group[scale_idx]
            int4 = vfeats.dtype == jnp.uint8       # nibble-packed int4 marker
            C_chunk = vfeats.shape[-1] * (2 if int4 else 1) // (4 * (V - 1))
            if fused and not int4:
                # fused Pallas interp+cosine (eval path): consume raw gather
                # rows, never materialize per-view interpolations
                from ..ops.pallas_cond import fused_interp_grouped_cosine
                rws = [packed_rows_and_weights(vfeats[:, v], grids[v])
                       for v in range(V)]
                rows = jnp.stack([r[0][0] for r in rws], axis=0)       # [V,N,4Cc]
                wgt = jnp.stack([jnp.concatenate([r[1][0], r[2][0]], -1)
                                 for r in rws], axis=0)                # [V,N,2]
                cosv = fused_interp_grouped_cosine(
                    rows, wgt, n_views=V, chunk_c=C_chunk, n_groups=G,
                    pairs=pairs)
                feat_chunks.append(cosv.reshape(1, *pts_3d.shape[1:3], G))
                continue
            scales = (tables.get("view_feat_scales") or [None] * 2)[scale_idx]
            kt = banded_kt[scale_idx] if banded_kt is not None else None
            ut = block_ut[scale_idx] if block_ut is not None else None
            unpacked = (tables.get("view_feats_unpacked")
                        if hasattr(tables, "get") else None)
            if (kt is not None and ut is not None and unpacked is not None
                    and unpacked[scale_idx] is not None
                    and banded_impl == "block"):
                # block-level shared dilated-union megakernel: unpacked (4x
                # smaller, gather-resident) tables, one matmul for all four
                # bilinear taps (ops/pallas_block_banded.py). f32 tables
                # route through the custom-VJP variant (patch-aligned
                # training rays, nerf.train_ray_patches).
                if scales is None:
                    from ..ops.pallas_block_banded import (
                        block_banded_cosine_scale_trainable)
                    feat_chunks.append(block_banded_cosine_scale_trainable(
                        unpacked[scale_idx], grids, kt, ut, G,
                        tuple(pairs), 8))
                else:
                    from ..ops.pallas_block_banded import (
                        block_banded_cosine_scale)
                    feat_chunks.append(block_banded_cosine_scale(
                        unpacked[scale_idx], grids, kt=kt, ut=ut, n_groups=G,
                        pairs=pairs, dequant_scales=scales,
                        lane_major=lane))
                continue
            if kt is not None and banded_impl in ("pallas", "block"):
                # VMEM-fused dedup-gather + interp + cosine megakernel: only
                # the [R,S,G] cosine ever leaves HBM (ops/pallas_banded.py).
                # f32 tables route through the custom-VJP variant so the
                # training step can differentiate through the kernel.
                if scales is None:
                    from ..ops.pallas_banded import banded_cosine_scale_trainable
                    feat_chunks.append(banded_cosine_scale_trainable(
                        vfeats, grids, kt, G, tuple(pairs), 8))
                else:
                    from ..ops.pallas_banded import banded_cosine_scale
                    feat_chunks.append(banded_cosine_scale(
                        vfeats, grids, kt=kt, n_groups=G, pairs=pairs,
                        dequant_scales=scales))
                continue
            if kt is not None and not int4:
                from ..ops.banded_gather import banded_sample_packed
                sampled = [banded_sample_packed(
                    vfeats[:, v], grids[v], kt,
                    dequant_scale=None if scales is None else scales[:, v])
                    for v in range(V)]                             # [B,R,S,(V-1)C]
            elif int4:
                from ..ops.grid_sample import grid_sample_2d_packed_int4
                sampled = [grid_sample_2d_packed_int4(vfeats[:, v], grids[v])
                           .astype(jnp.float32)
                           * scales[:, v][:, None, None, :]
                           for v in range(V)]                      # [B,R,S,(V-1)C]
            else:
                sampled = [grid_sample_2d_packed(vfeats[:, v], grids[v])
                           for v in range(V)]                      # [B,R,S,(V-1)C]
                if scales is not None:
                    sampled = [s * scales[:, v][:, None, None, :].astype(s.dtype)
                               for v, s in enumerate(sampled)]
            per_pair = []
            for (i_idx, j_idx) in pairs:
                ca = j_idx - 1
                cb = i_idx
                fa = sampled[i_idx][..., ca * C_chunk:(ca + 1) * C_chunk]
                fb = sampled[j_idx][..., cb * C_chunk:(cb + 1) * C_chunk]
                per_pair.append(_grouped_cosine(fa, fb, G))
            feat_chunks.append(jnp.stack(per_pair, axis=0).mean(axis=0))
    else:
        for scale_idx, feats in enumerate(pair_feats):
            G = cos_n_group[scale_idx]
            per_pair = []
            for p_idx, (i_idx, j_idx) in enumerate(pairs):
                fa = sample_features_by_grid(feats[:, p_idx, 0], grids[i_idx],
                                             local_radius=local_r, local_dilation=local_d)
                fb = sample_features_by_grid(feats[:, p_idx, 1], grids[j_idx],
                                             local_radius=local_r, local_dilation=local_d)
                per_pair.append(_grouped_cosine(fa, fb, G))
            feat_chunks.append(jnp.stack(per_pair, axis=0).mean(axis=0))  # [B,R,S,G]
    feat_info = jnp.concatenate(feat_chunks, axis=1 if lane else -1)

    cond = {"feat_info": feat_info, "color_info": color_info, "mask_info": mask_info}
    if lane:
        cond["lane_major"] = True
    return cond, ndc_all[0]


def render_rays(params, cfg, pix_xy, tgt_intr, tgt_c2w, tgt_near_far,
                ref_w2c, ref_intr, ref_near_far, ref_images, pair_feats,
                img_h: int, img_w: int, rng: Optional[jax.Array] = None,
                stratified: bool = False, setbg_opaque: bool = False,
                tables: Optional[dict] = None, fused_cosine: bool = False,
                banded_kt: Optional[tuple] = None, banded_impl: str = "xla",
                decoder_impl: str = "xla",
                block_ut: Optional[tuple] = None,
                color_ut: Optional[int] = None):
    """Render a batch of rays (matchnerf.py:88-143).

    pix_xy: [B,R,2] target pixel coordinates (legacy-offset already applied
    by the caller via `camera.pixel_grid`). Returns dict(rgb [B,R,3],
    depth [B,R,1], opacity [B,R,1]).
    """
    B, R = pix_xy.shape[:2]
    center, ray = camera.get_center_and_ray(pix_xy, tgt_intr, tgt_c2w)   # [B,R,3]
    depth_samples = sample_depth(cfg, tgt_near_far, B, R, rng=rng, stratified=stratified)
    pts_3d = camera.get_3d_points_from_depth(center, ray, depth_samples,
                                             multi_samples=True)        # [B,R,S,3]

    lm = False
    if decoder_impl == "pallas" and cfg.nerf.view_dep:
        _prec = effective_precision(cfg)
        _get = _prec.get if hasattr(_prec, "get") else (lambda *_: None)
        # default ON: bit-exact (test_lane_major_cond_bit_exact) and measured
        # faster (25.10 vs 25.36 ms/slice device trace, 2026-08-19) — skips
        # the unfusable small-channel transposes between the block/color
        # kernels and the decoder kernel.
        lm = bool(_get("lanemajor_cond", True))
    cond_info, ndc_view0 = query_cond_info(
        cfg, pts_3d, ref_w2c, ref_intr, ref_near_far, ref_images, pair_feats,
        img_h, img_w, tables=tables, fused_cosine=fused_cosine,
        banded_kt=banded_kt, banded_impl=banded_impl, block_ut=block_ut,
        color_ut=color_ut, lane_major=lm)

    if cfg.nerf.view_dep:
        ray_unit = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
        R0 = ref_w2c[:, 0, :3, :3]                                        # [B,3,3]
        ray_unit_ref = ray_unit @ jnp.swapaxes(R0, -1, -2)
        ray_unit_ref = jnp.broadcast_to(ray_unit_ref[:, :, None, :],
                                        (*pts_3d.shape[:3], 3))
    else:
        ray_unit_ref = None

    if decoder_impl == "pallas" and cfg.nerf.view_dep:
        # VMEM-resident decoder megakernel (eval path; ops/pallas_decoder.py)
        from ..ops.pallas_decoder import cond_nerf_decode
        prec = effective_precision(cfg)
        get = prec.get if hasattr(prec, "get") else (lambda *_: None)
        md = jnp.bfloat16 if str(get("decoder_matmul_dtype", "")) in \
            ("bf16", "bfloat16") else None
        gr = int(get("decoder_group_rays", 4) or 4)
        # 16 rays/grid-step halves the grid count (measured 7.9 -> 7.5 ms)
        br = int(get("decoder_block_rays", 16) or 16)
        fold = get("decoder_fold_composite", True)
        fold = True if fold is None else bool(fold)
        eb = bool(get("decoder_extract_batched", False))
        if fold:
            # composite folded into the kernel: the [R,S,4] activation never
            # leaves VMEM; the kernel emits rgb/depth/opacity directly
            rgb, depth, opacity = cond_nerf_decode(
                params["nerf_dec"], cfg, ndc_view0, ray_unit_ref, cond_info,
                block_rays=br, group_rays=gr, matmul_dtype=md,
                fold_composite=True, depth_samples=depth_samples, ray=ray,
                setbg_opaque=setbg_opaque, extract_batched=eb)
            return {"rgb": rgb, "depth": depth, "opacity": opacity}
        rgb_samples, density_samples = cond_nerf_decode(
            params["nerf_dec"], cfg, ndc_view0, ray_unit_ref, cond_info,
            block_rays=br, group_rays=gr, matmul_dtype=md, extract_batched=eb)
    else:
        rgb_samples, density_samples = apply_cond_nerf(
            params["nerf_dec"], cfg, ndc_view0, ray_unit=ray_unit_ref,
            cond_info=cond_info)

    rgb, depth, opacity, _ = composite(cfg, ray, rgb_samples, density_samples,
                                       depth_samples, setbg_opaque=setbg_opaque)
    return {"rgb": rgb, "depth": depth, "opacity": opacity}
