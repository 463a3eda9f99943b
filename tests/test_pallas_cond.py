"""Fused Pallas interp+cosine kernel vs the XLA packed path (interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_fused_interp_cosine_matches_xla():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from matchnerf_tpu import camera
    from matchnerf_tpu.models.matchnerf import (encode, init_matchnerf,
                                                prepare_sampling_tables,
                                                query_cond_info, sample_depth)

    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=8)
    B, H, W, R = 1, 16, 16, 32
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    d = ge._synthetic_inputs(cfg, B, H, W, R)
    ref = jnp.asarray(d["images"][:, :3])
    feats = encode(params, cfg, ref)
    tables = prepare_sampling_tables(cfg, feats, ref)

    center, ray = camera.get_center_and_ray(jnp.asarray(d["pix"]),
                                            jnp.asarray(d["intr"][:, -1]),
                                            jnp.asarray(d["tgt_c2w"]))
    depth = sample_depth(cfg, jnp.asarray(d["near_fars"][:, -1]), B, R)
    pts = camera.get_3d_points_from_depth(center, ray, depth, multi_samples=True)

    args = (cfg, pts, jnp.asarray(d["poses"][:, :-1, :3, :]),
            jnp.asarray(d["intr"][:, :-1]), jnp.asarray(d["near_fars"][:, :-1]),
            ref, feats, H, W)
    cond_a, _ = query_cond_info(*args, tables=tables, fused_cosine=False)
    cond_b, _ = query_cond_info(*args, tables=tables, fused_cosine=True)
    np.testing.assert_allclose(np.asarray(cond_b["feat_info"]),
                               np.asarray(cond_a["feat_info"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(cond_b["color_info"]),
                               np.asarray(cond_a["color_info"]), atol=1e-6)


def test_fused_kernel_direct():
    from matchnerf_tpu.ops.pallas_cond import fused_interp_grouped_cosine

    rng = np.random.default_rng(0)
    V, N, C = 3, 100, 32          # non-multiple of block to exercise padding
    G = 4
    Cc = (V - 1) * C
    rows = rng.standard_normal((V, N, 4 * Cc)).astype(np.float32)
    w = rng.uniform(0, 1, (V, N, 2)).astype(np.float32)
    pairs = [(0, 1), (0, 2), (1, 2)]

    out = fused_interp_grouped_cosine(jnp.asarray(rows), jnp.asarray(w),
                                      n_views=V, chunk_c=C, n_groups=G,
                                      pairs=pairs, block_points=32)

    # numpy reference
    wx = w[:, :, :1]
    wy = w[:, :, 1:]
    t = rows.reshape(V, N, 4, Cc)
    interp = ((t[:, :, 0] * (1 - wx) + t[:, :, 1] * wx) * (1 - wy)
              + (t[:, :, 2] * (1 - wx) + t[:, :, 3] * wx) * wy)
    acc = np.zeros((N, G))
    for (i, j) in pairs:
        fa = interp[i][:, (j - 1) * C:j * C].reshape(N, G, C // G)
        fb = interp[j][:, i * C:(i + 1) * C].reshape(N, G, C // G)
        dot = (fa * fb).sum(-1)
        na = np.maximum(np.linalg.norm(fa, axis=-1), 1e-8)
        nb = np.maximum(np.linalg.norm(fb, axis=-1), 1e-8)
        acc += dot / (na * nb)
    np.testing.assert_allclose(np.asarray(out), acc / len(pairs), atol=1e-5)
