"""Parity tests for the CondNeRF decoder Pallas megakernel
(ops/pallas_decoder.py) against apply_cond_nerf. Interpreter mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from matchnerf_tpu.models.decoder.cond_nerf import (apply_cond_nerf,
                                                    cond_feat_dim,
                                                    init_cond_nerf)
from matchnerf_tpu.ops.pallas_decoder import cond_nerf_decode
from matchnerf_tpu.utils import DotDict


def _setup(cfg, B=1, R=11, S=16, seed=0):
    rng = np.random.default_rng(seed)
    params = init_cond_nerf(jax.random.PRNGKey(seed), cfg)
    pts = jnp.asarray(rng.uniform(-1, 1, (B, R, S, 3)).astype(np.float32))
    ray = rng.normal(0, 1, (B, R, S, 3)).astype(np.float32)
    ray = jnp.asarray(ray / np.linalg.norm(ray, axis=-1, keepdims=True))
    G = int(sum(cfg.encoder.cos_n_group))
    V = cfg.n_src_views
    cond = {
        "feat_info": jnp.asarray(rng.uniform(-1, 1, (B, R, S, G)).astype(np.float32)),
        "color_info": jnp.asarray(rng.uniform(0, 1, (B, R, S, 3 * V)).astype(np.float32)),
        "mask_info": jnp.asarray(
            rng.integers(0, 2, (B, R, S, V)).astype(np.float32)),
    }
    return params, pts, ray, cond


def _compare(cfg, **kw):
    params, pts, ray, cond = _setup(cfg, **kw)
    rgb_ref, den_ref = apply_cond_nerf(params, cfg, pts, ray_unit=ray,
                                       cond_info=cond)
    rgb, den = cond_nerf_decode(params, cfg, pts, ray, cond, block_rays=4)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(den), np.asarray(den_ref),
                               atol=2e-4, rtol=1e-4)


def test_decoder_kernel_flagship_config():
    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=16)
    _compare(cfg)


def test_decoder_kernel_batched_and_ragged():
    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=16)
    _compare(cfg, B=2, R=7, S=16, seed=1)


def test_decoder_kernel_variants():
    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=16)
    cfg = DotDict(dict(cfg))
    cfg.decoder = DotDict(dict(cfg.decoder))
    cfg.decoder.raytrans_act = "ELU"
    cfg.decoder.density_maskfill = True
    cfg.decoder.raytrans_posenc = True
    _compare(cfg, seed=2)


def test_decoder_kernel_view_posenc():
    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=16)
    cfg = DotDict(dict(cfg))
    cfg.decoder = DotDict(dict(cfg.decoder))
    cfg.decoder.posenc = DotDict({"L_3D": 10, "L_view": 4})
    _compare(cfg, seed=3)


def _compare_folded(cfg, setbg=False, seed=0, B=1, R=11, S=16):
    from matchnerf_tpu.models.decoder.cond_nerf import composite
    params, pts, ray_unit, cond = _setup(cfg, B=B, R=R, S=S, seed=seed)
    rng = np.random.default_rng(seed + 100)
    # stratified-ish increasing depths + an unnormalized ray for dist scaling
    base = np.sort(rng.uniform(2.0, 4.5, (B, R, S)), axis=-1).astype(np.float32)
    depth_samples = jnp.asarray(base[..., None])
    ray_raw = jnp.asarray(rng.normal(0, 1, (B, R, 3)).astype(np.float32))

    rgb_s, den_s = apply_cond_nerf(params, cfg, pts, ray_unit=ray_unit,
                                   cond_info=cond)
    rgb_ref, dep_ref, op_ref, _ = composite(cfg, ray_raw, rgb_s, den_s,
                                            depth_samples, setbg_opaque=setbg)
    rgb, dep, op = cond_nerf_decode(
        params, cfg, pts, ray_unit, cond, block_rays=4, fold_composite=True,
        depth_samples=depth_samples, ray=ray_raw, setbg_opaque=setbg)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dep), np.asarray(dep_ref),
                               atol=3e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(op), np.asarray(op_ref),
                               atol=3e-5, rtol=1e-4)


def test_decoder_kernel_folded_composite():
    """Composite-in-kernel (triangular-matmul transmittance) vs the XLA
    apply_cond_nerf + composite pipeline (reference nerf.py:101-124)."""
    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=16)
    _compare_folded(cfg)


def test_decoder_kernel_folded_composite_variants():
    # with render intervals (sigma*delta) + opaque background + maskfill
    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=16)
    cfg = DotDict(dict(cfg))
    cfg.nerf = DotDict(dict(cfg.nerf))
    cfg.nerf.wo_render_interval = False
    cfg.decoder = DotDict(dict(cfg.decoder))
    cfg.decoder.density_maskfill = True
    _compare_folded(cfg, setbg=True, seed=4, B=2, R=7)


def test_lane_major_cond_bit_exact():
    """precision.lanemajor_cond feeds the decoder megakernel the block/color
    kernels' native [N,ch,S] layout (skipping the [B,R,S,ch] transpose round
    trip). Pure layout change -> the rendered image must be BIT-identical
    to the default path on the production int8/uint8 kernel stack."""
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

    def run(lanemajor):
        c = DotDict(dict(cfg))
        c.precision = DotDict({"cond_sample_dtype": "int8",
                               "color_sample_dtype": "uint8",
                               "banded_kernel": True, "block_kernel": True,
                               "decoder_kernel": True,
                               "color_block_kernel": True,
                               "lanemajor_cond": lanemajor})
        r = Renderer(c)
        feats = r.encode(params, ref_images)
        tables = r.build_tables(ref_images, feats)
        assert tables.get("colors_sc") is not None
        return r.render_by_slices(params, poses, ref_images, feats, H, W,
                                  tables=tables)

    out_std = run(False)

    # spy: the lane path must actually engage (eligibility silently failing
    # would make this test vacuous)
    from matchnerf_tpu.ops import pallas_color as pc
    calls = []
    orig = pc.supercell_color_sample
    def spy(*a, **kw):
        calls.append(bool(kw.get("lane_major", False)))
        return orig(*a, **kw)
    pc.supercell_color_sample = spy
    try:
        out_lane = run(True)
    finally:
        pc.supercell_color_sample = orig
    assert any(calls), "lane-major path never engaged"

    for k in ("rgb", "depth", "opacity"):
        np.testing.assert_array_equal(
            np.asarray(out_lane[k]), np.asarray(out_std[k]),
            err_msg=f"lane-major path changed {k} (must be layout-only)")


def test_decoder_kernel_extract_batched_parity():
    """extract_batched=True (attention-output extraction as 3 fat constant
    matmuls, head-major query columns) matches both the XLA decoder and the
    slice-loop kernel path, incl. the masked-query vmean fallback."""
    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=16)
    params, pts, ray, cond = _setup(cfg, B=1, R=11, S=16, seed=4)
    # force some rays to have <=1 valid view so the vmean/where path engages
    m = np.array(cond["mask_info"])
    m[:, :3] = 0.0
    m[:, 3:5] = np.eye(3, dtype=np.float32)[0]
    cond["mask_info"] = jnp.asarray(m)
    rgb_ref, den_ref = apply_cond_nerf(params, cfg, pts, ray_unit=ray,
                                       cond_info=cond)
    for gr in (2, 4):
        rgb, den = cond_nerf_decode(params, cfg, pts, ray, cond,
                                    block_rays=4, group_rays=gr,
                                    extract_batched=True)
        np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                                   atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(den), np.asarray(den_ref),
                                   atol=2e-4, rtol=1e-4)


def test_decoder_kernel_extract_batched_folded():
    """extract_batched composes with fold_composite (the production eval
    configuration under A/B)."""
    from matchnerf_tpu.models.decoder.cond_nerf import composite
    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=16)
    params, pts, ray_unit, cond = _setup(cfg, B=1, R=11, S=16, seed=5)
    rng = np.random.default_rng(105)
    base = np.sort(rng.uniform(2.0, 4.5, (1, 11, 16)), axis=-1).astype(np.float32)
    depth_samples = jnp.asarray(base[..., None])
    ray_raw = jnp.asarray(rng.normal(0, 1, (1, 11, 3)).astype(np.float32))
    rgb_s, den_s = apply_cond_nerf(params, cfg, pts, ray_unit=ray_unit,
                                   cond_info=cond)
    rgb_ref, dep_ref, op_ref, _ = composite(cfg, ray_raw, rgb_s, den_s,
                                            depth_samples)
    rgb, dep, op = cond_nerf_decode(
        params, cfg, pts, ray_unit, cond, block_rays=4, fold_composite=True,
        depth_samples=depth_samples, ray=ray_raw, extract_batched=True)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dep), np.asarray(dep_ref),
                               atol=3e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(op), np.asarray(op_ref),
                               atol=3e-5, rtol=1e-4)
