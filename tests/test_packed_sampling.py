"""Packed 2x2-tap sampling must be numerically identical to the 4-tap path."""
import numpy as np

import jax
import jax.numpy as jnp

from matchnerf_tpu.ops.grid_sample import (grid_sample_2d, grid_sample_2d_packed,
                                           pack_2x2)


def test_packed_matches_unpacked_border():
    rng = np.random.default_rng(0)
    B, H, W, C = 2, 9, 13, 8
    feat = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    grid = jnp.asarray(rng.uniform(-1.5, 1.5, (B, 5, 7, 2)).astype(np.float32))
    ref = grid_sample_2d(feat, grid, align_corners=True, padding_mode="border")
    packed = pack_2x2(feat)
    out = grid_sample_2d_packed(packed, grid, align_corners=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_packed_exact_corners_and_edges():
    rng = np.random.default_rng(1)
    feat = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
    # exact corner/edge coordinates including x = W-1 (x0 == W-1 case)
    grid = jnp.asarray(np.array([[[[-1, -1], [1, 1], [1, -1], [-1, 1],
                                   [0.999, 0.5], [0.5, 0.999]]]], np.float32))
    ref = grid_sample_2d(feat, grid)
    out = grid_sample_2d_packed(pack_2x2(feat), grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_render_rays_with_tables_matches_without():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from matchnerf_tpu.models.matchnerf import (encode, init_matchnerf,
                                                prepare_sampling_tables,
                                                render_rays)

    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=4)
    B, H, W, R = 1, 16, 16, 32
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    d = ge._synthetic_inputs(cfg, B, H, W, R)
    images = jnp.asarray(d["images"])
    ref = images[:, :3]
    feats = encode(params, cfg, ref)
    tables = prepare_sampling_tables(cfg, feats, ref)

    kwargs = dict(
        pix_xy=jnp.asarray(d["pix"]), tgt_intr=jnp.asarray(d["intr"][:, -1]),
        tgt_c2w=jnp.asarray(d["tgt_c2w"]),
        tgt_near_far=jnp.asarray(d["near_fars"][:, -1]),
        ref_w2c=jnp.asarray(d["poses"][:, :-1, :3, :]),
        ref_intr=jnp.asarray(d["intr"][:, :-1]),
        ref_near_far=jnp.asarray(d["near_fars"][:, :-1]),
        ref_images=ref, img_h=H, img_w=W)
    out_a = render_rays(params, cfg, pair_feats=feats, **kwargs)
    out_b = render_rays(params, cfg, pair_feats=feats, tables=tables, **kwargs)
    np.testing.assert_allclose(np.asarray(out_a["rgb"]), np.asarray(out_b["rgb"]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_a["depth"]), np.asarray(out_b["depth"]),
                               atol=1e-5)


def test_uint8_color_table_exact_for_8bit_images():
    """round(img*255) color tables are exact when images are u8/255 (all the
    shipped dataset loaders) — interpolated colors match the f32 table path
    bit-for-bit up to f32 rounding of the /255 dequant."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from matchnerf_tpu.models.matchnerf import (encode, init_matchnerf,
                                                prepare_sampling_tables,
                                                query_cond_info)

    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=4)
    B, H, W, R = 1, 16, 16, 32
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    d = ge._synthetic_inputs(cfg, B, H, W, R)
    # quantize the synthetic images to u8/255 like the dataset loaders produce
    images = np.round(np.asarray(d["images"]) * 255.0) / 255.0
    ref = jnp.asarray(images[:, :3].astype(np.float32))
    feats = encode(params, cfg, ref)
    tables_f32 = prepare_sampling_tables(cfg, feats, ref)
    tables_u8 = prepare_sampling_tables(cfg, feats, ref, color_dtype=jnp.uint8)
    assert tables_u8["colors"].dtype == jnp.uint8

    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.uniform(-1, 1, (B, R, 4, 3)).astype(np.float32))
    kwargs = dict(
        cfg=cfg, pts_3d=pts, ref_w2c=jnp.asarray(d["poses"][:, :-1, :3, :]),
        ref_intr=jnp.asarray(d["intr"][:, :-1]),
        ref_near_far=jnp.asarray(d["near_fars"][:, :-1]),
        ref_images=ref, pair_feats=feats, img_h=H, img_w=W)
    a, _ = query_cond_info(tables=tables_f32, **kwargs)
    b, _ = query_cond_info(tables=tables_u8, **kwargs)
    np.testing.assert_allclose(np.asarray(b["color_info"]),
                               np.asarray(a["color_info"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(b["feat_info"]),
                               np.asarray(a["feat_info"]), atol=1e-6)
