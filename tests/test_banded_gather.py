"""Banded (run-length-deduped) sampling and int8 tables.

The banded path must be EXACT vs the direct packed gather whenever each
ray's cell sequence has <= Kt runs; int8 tables are quantized but the
dequant-after-interp must recover the quantized values exactly.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matchnerf_tpu.ops.banded_gather import (banded_bound_from_endpoints,
                                             banded_sample_packed, bucket_kt)
from matchnerf_tpu.ops.grid_sample import grid_sample_2d_packed, pack_2x2


def _epipolar_grid(rng, B, R, S, max_span=6.0):
    """Per-ray straight segments in [-1,1]^2 (what depth samples project to),
    some partially out of frustum to exercise border clamping."""
    p0 = rng.uniform(-1.3, 1.3, (B, R, 1, 2))
    p1 = p0 + rng.uniform(-0.4, 0.4, (B, R, 1, 2))
    t = np.linspace(0, 1, S).reshape(1, 1, S, 1)
    # non-uniform spacing like real depth samples
    t = t ** 1.7
    return (p0 + (p1 - p0) * t).astype(np.float32)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_banded_matches_packed_exactly(dtype):
    rng = np.random.default_rng(0)
    B, H, W, C, R, S = 2, 24, 32, 8, 64, 40
    feat = rng.normal(0, 1, (B, H, W, C)).astype(np.float32)
    packed = jnp.asarray(pack_2x2(jnp.asarray(feat))).astype(jnp.dtype(dtype))
    grid = jnp.asarray(_epipolar_grid(rng, B, R, S))

    direct = np.asarray(grid_sample_2d_packed(packed, grid))
    banded = np.asarray(banded_sample_packed(packed, grid, kt=32))
    np.testing.assert_array_equal(direct.astype(np.float32),
                                  banded.astype(np.float32))


def test_banded_bound_covers_runs():
    """The endpoint bound must dominate the true distinct-run count for
    monotone segments (the z>0 guarantee)."""
    rng = np.random.default_rng(1)
    B, H, W, R, S = 1, 40, 48, 128, 64
    grid = _epipolar_grid(rng, B, R, S, max_span=4.0)
    x = np.clip((grid[..., 0] + 1) * 0.5 * (W - 1), 0, W - 1)
    y = np.clip((grid[..., 1] + 1) * 0.5 * (H - 1), 0, H - 1)
    cell = np.floor(y).astype(int) * W + np.floor(x).astype(int)  # [B,R,S]
    runs = 1 + (cell[..., 1:] != cell[..., :-1]).sum(-1)          # [B,R]
    bound, safe = banded_bound_from_endpoints(
        cell[..., 0].ravel(), cell[..., -1].ravel(), np.ones(1, bool), W)
    assert safe
    assert bound >= runs.max()


def test_bucket_kt():
    assert bucket_kt(10, 128) == 16
    assert bucket_kt(33, 128) == 48
    assert bucket_kt(140, 128) is None
    assert bucket_kt(64, 64) is None      # no profit at Kt >= S


def test_int8_tables_dequant_after_interp_exact():
    """Interpolating the int8 table then scaling must equal scaling then
    interpolating (linearity) — validated against explicit dequantization."""
    from matchnerf_tpu.models.matchnerf import prepare_sampling_tables
    from matchnerf_tpu.utils import DotDict

    rng = np.random.default_rng(2)
    B, V, h, w, C = 1, 3, 16, 20, 8
    P = 3
    feats = [jnp.asarray(rng.normal(0, 2, (B, P, 2, h, w, C)), jnp.float32)]
    imgs = jnp.asarray(rng.uniform(0, 1, (B, V, 2 * h, 2 * w, 3)), jnp.float32)
    cfg = DotDict({"n_src_views": V})

    t8 = prepare_sampling_tables(cfg, feats, imgs, feat_dtype=jnp.int8)
    assert t8["view_feats"][0].dtype == jnp.int8
    scales = t8["view_feat_scales"][0]                 # [B,V,C']
    grid = jnp.asarray(_epipolar_grid(rng, B, 32, 16))

    for v in range(V):
        # explicit dequantized table, sampled directly
        deq = t8["view_feats"][0][:, v].astype(jnp.float32)
        Cq = scales.shape[-1]
        full_scale = jnp.tile(scales[:, v], (1, 4))    # packed 4C layout
        deq = deq * full_scale[:, None, None, :]
        want = np.asarray(grid_sample_2d_packed(deq, grid))
        # production: int8 interp + post-scale
        got = np.asarray(banded_sample_packed(
            t8["view_feats"][0][:, v], grid, kt=16,
            dequant_scale=scales[:, v]))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

    # quantization quality: dequantized table close to the original stack
    # (per-channel abs-max int8 => error <= scale/2 per element)
    assert np.isfinite(np.asarray(t8["view_feats"][0])).all()


def test_render_by_slices_banded_matches_direct():
    """End-to-end: full-image eval with banded gather on vs off."""
    import __graft_entry__ as ge
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    from matchnerf_tpu.renderer import Renderer, extract_poses
    from matchnerf_tpu.utils import DotDict

    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=48)
    H, W = 32, 32
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    d = ge._synthetic_inputs(cfg, 1, H, W, R=16)
    poses = extract_poses({"extrinsics": d["poses"], "intrinsics": d["intr"],
                           "near_fars": d["near_fars"]})
    ref_images = jnp.asarray(d["images"][:, :3])
    engaged = {}

    def run(banded):
        c = DotDict(dict(cfg))
        c.precision = DotDict({"cond_sample_dtype": "float32",
                               "banded_gather": banded})
        r = Renderer(c)
        feats = r.encode(params, ref_images)
        tables = r.build_tables(ref_images, feats)
        if banded:
            engaged["kt"] = r._banded_kt(poses, poses["tgt"], tables, H, W)
        return r.render_by_slices(params, poses, ref_images, feats, H, W,
                                  tables=tables)

    out_direct = run(False)
    out_banded = run(True)
    assert engaged["kt"] is not None and any(k for k in engaged["kt"]), \
        f"banded path did not engage: {engaged}"
    np.testing.assert_allclose(out_banded["rgb"], out_direct["rgb"],
                               rtol=1e-6, atol=1e-7)
