"""Parity and precision evidence at REAL DTU eval shapes (640x512, S=128).

Round-1 oracle parity only covered toy shapes (32x48, S=8); grid-sample
border behavior, cumsum transmittance drift, and bf16-table rounding are
shape- and content-dependent, so this file re-proves parity at the
production shapes (subsampled rays keep CPU runtime sane) and quantifies the
bf16 sampling-table PSNR cost on a STRUCTURED scene (uniform noise cannot
surface interpolation error).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torch_oracle import install_reference, reference_opts, tpu_cfg_from_opts

install_reference()

from models.matchnerf import MatchNeRF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from matchnerf_tpu import camera  # noqa: E402
from matchnerf_tpu.import_torch import import_matchnerf_checkpoint  # noqa: E402
from matchnerf_tpu.models.matchnerf import (encode,  # noqa: E402
                                            prepare_sampling_tables,
                                            render_rays)
from test_render_e2e import look_at_pose  # noqa: E402

H, W, V, S = 512, 640, 3, 128


def structured_images(rng, H=H, W=W, n=V + 1):
    """Views as shifted crops of one multi-frequency world texture: spatially
    coherent content with cross-view correlation (what bilinear interpolation
    and the cosine prior actually see on DTU, unlike iid noise)."""
    HT, WT = H + 64, W + 64
    yy, xx = np.meshgrid(np.arange(HT, dtype=np.float32),
                         np.arange(WT, dtype=np.float32), indexing="ij")
    tex = np.zeros((HT, WT, 3), np.float32)
    for c in range(3):
        t = 0.5 + 0.16 * np.sin(xx * (0.011 + 0.004 * c) + c) \
            + 0.16 * np.sin(yy * (0.017 - 0.003 * c) - 2 * c) \
            + 0.10 * np.sin((xx + yy) * 0.053 + 0.7 * c) \
            + 0.08 * np.sin(np.hypot(xx - WT / 2, yy - HT / 2) * 0.031)
        tex[..., c] = t
    tex += rng.normal(0, 0.015, tex.shape).astype(np.float32)  # mild sensor noise
    tex = np.clip(tex, 0, 1)
    views = []
    for v in range(n):
        oy, ox = 8 + 13 * v, 8 + 17 * v
        views.append(tex[oy:oy + H, ox:ox + W])
    return np.stack(views)[None]                               # [1,n,H,W,3]


def realistic_batch(rng):
    eyes = [(3, 0.3, 0.2), (2.8, -0.4, 0.9), (2.9, 0.5, -0.8), (3.1, 0.1, 0.4)]
    poses = np.stack([look_at_pose(e) for e in eyes])          # [V+1,3,4]
    f = 520.0                                                   # DTU-ish focal
    intr = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    return {
        "images": structured_images(rng),                       # [1,V+1,H,W,3]
        "extrinsics": poses[None],
        "intrinsics": np.tile(intr[None, None], (1, V + 1, 1, 1)),
        "near_fars": np.tile(np.array([[2.0, 4.5]], np.float32), (1, V + 1, 1)),
    }


def _our_render(params, cfg, batch, pix, tables_dtype=None, color_dtype=None,
                banded_kt=None, banded_impl="xla", decoder_impl="xla",
                block_ut=None, color_ut=None, keep_unpacked=False):
    """Render the given pixel coords through the packed-table production
    path; tables_dtype None => no tables (raw 4-tap path)."""
    ref_images = jnp.asarray(batch["images"][:, :V])
    pair_feats = encode(params, cfg, ref_images)
    tables = None
    if tables_dtype is not None:
        tables = jax.jit(lambda fs, im: prepare_sampling_tables(
            cfg, fs, im, feat_dtype=tables_dtype,
            color_dtype=color_dtype,
            keep_unpacked=keep_unpacked))(pair_feats, ref_images)
    c2w = camera.pose_inverse_legacy_np(batch["extrinsics"][:, -1, :3, :])
    return render_rays(
        params, cfg, jnp.asarray(pix),
        tgt_intr=jnp.asarray(batch["intrinsics"][:, -1]),
        tgt_c2w=jnp.asarray(c2w),
        tgt_near_far=jnp.asarray(batch["near_fars"][:, -1]),
        ref_w2c=jnp.asarray(batch["extrinsics"][:, :-1, :3, :]),
        ref_intr=jnp.asarray(batch["intrinsics"][:, :-1]),
        ref_near_far=jnp.asarray(batch["near_fars"][:, :-1]),
        ref_images=ref_images, pair_feats=pair_feats,
        img_h=H, img_w=W, tables=tables, banded_kt=banded_kt,
        banded_impl=banded_impl, decoder_impl=decoder_impl,
        block_ut=block_ut, color_ut=color_ut)


def test_oracle_parity_dtu_shapes():
    """Torch-reference parity at 640x512 / S=128 on a 512-ray subset."""
    opts = reference_opts()
    opts.encoder.num_transformer_layers = 2    # CPU-runtime compromise;
    # shapes/content stay production-sized, layer count doesn't change the
    # sampling/compositing numerics under test
    torch.manual_seed(0)
    model = MatchNeRF(opts)
    model.eval()

    rng = np.random.default_rng(0)
    batch = realistic_batch(rng)
    ray_idx = np.sort(rng.permutation(H * W)[:512])

    imgs_t = torch.from_numpy(batch["images"][:, :V].transpose(0, 1, 4, 2, 3))
    with torch.no_grad():
        feats_ref = model.get_img_feat(imgs_t, attn_splits_list=[2],
                                       cur_n_src_views=V)
        ret_ref = model.render(
            opts,
            {"extrinsics": torch.from_numpy(batch["extrinsics"][:, -1, :3, :]),
             "intrinsics": torch.from_numpy(batch["intrinsics"][:, -1]),
             "near_fars": torch.from_numpy(batch["near_fars"][:, -1])},
            ray_idx=torch.from_numpy(ray_idx), mode="test",
            ref_poses={
                "extrinsics": torch.from_numpy(batch["extrinsics"][:, :-1, :3, :]),
                "intrinsics": torch.from_numpy(batch["intrinsics"][:, :-1]),
                "near_fars": torch.from_numpy(batch["near_fars"][:, :-1])},
            ref_images=imgs_t, ref_feats_list=feats_ref)

    params = import_matchnerf_checkpoint(
        {k: v.numpy() for k, v in model.state_dict().items()})
    cfg = tpu_cfg_from_opts(opts)
    grid = np.asarray(camera.pixel_grid(H, W, legacy=True))
    pix = grid[ray_idx][None]

    out = _our_render(params, cfg, batch, pix, tables_dtype=jnp.float32)
    rgb_ref = ret_ref["rgb"].numpy()
    np.testing.assert_allclose(np.asarray(out["rgb"]), rgb_ref, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               ret_ref["depth"].numpy(), atol=5e-3)
    mae = np.abs(np.asarray(out["rgb"]) - rgb_ref).mean()
    assert mae < 2e-4, f"rgb MAE too high at DTU shapes: {mae}"


def test_bf16_tables_psnr_delta_structured():
    """bf16 sampling tables vs f32 on the structured scene at DTU shapes.

    PSNR(bf16, f32) >= 46.5 dB bounds the end-metric impact: with render
    quality at the DTU anchor (26.91 dB vs GT), independent bf16 error at
    x dB adds <= 4.34 * 10^((26.91 - x)/10) dB of PSNR loss — 46.5 dB
    corresponds to the repo's 0.05 dB flip threshold (CLAUDE.md)."""
    opts = reference_opts()
    opts.encoder.num_transformer_layers = 2
    cfg = tpu_cfg_from_opts(opts)

    from matchnerf_tpu.models.matchnerf import init_matchnerf
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    batch = realistic_batch(rng)
    ray_idx = np.sort(rng.permutation(H * W)[:4096])
    pix = np.asarray(camera.pixel_grid(H, W, legacy=True))[ray_idx][None]

    rgb_f32 = np.asarray(
        _our_render(params, cfg, batch, pix, tables_dtype=jnp.float32)["rgb"])
    rgb_bf16 = np.asarray(
        _our_render(params, cfg, batch, pix, tables_dtype=jnp.bfloat16)["rgb"])

    mse = float(np.mean((rgb_f32 - rgb_bf16) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-20))
    implied_delta = 4.34 * 10 ** ((26.91 - psnr) / 10.0)
    print(f"bf16-vs-f32 tables: PSNR {psnr:.1f} dB, "
          f"implied DTU delta {implied_delta:.4f} dB")
    assert psnr >= 46.5, (
        f"bf16 tables cost too much: {psnr:.1f} dB vs f32 "
        f"(implied DTU PSNR delta {implied_delta:.3f} dB > 0.05); flip "
        "precision.cond_sample_dtype default to float32")


def test_production_eval_stack_psnr_delta_structured():
    """The full configs/test.yaml precision stack (int8 feature tables, u8
    color tables, block-banded cosine megakernel, decoder megakernel) vs the
    strict-f32 path at DTU shapes. Same 46.5 dB bar as the bf16 test (0.05 dB
    implied DTU delta)."""
    opts = reference_opts()
    opts.encoder.num_transformer_layers = 2
    cfg = tpu_cfg_from_opts(opts)

    from matchnerf_tpu.models.matchnerf import init_matchnerf
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    batch = realistic_batch(rng)
    # loader-faithful 8-bit images: the u8 color table is exact for these
    batch["images"] = np.round(batch["images"] * 255.0).astype(np.float32) / 255.0
    # contiguous production ray order (the block kernel's gather adjacency)
    off = ((H * W) // 2 // 8) * 8
    pix = np.asarray(camera.pixel_grid(H, W, legacy=True))[off:off + 1024][None]

    # per-scale run bounds + union buckets, exactly as the renderer computes
    from matchnerf_tpu.renderer import Renderer, extract_poses
    from matchnerf_tpu.utils import DotDict
    bcfg = DotDict(dict(cfg))
    bcfg.precision = DotDict({"banded_kernel": True, "block_kernel": True})
    ref_images = jnp.asarray(batch["images"][:, :V])
    pair_feats = encode(params, cfg, ref_images)
    tables = prepare_sampling_tables(cfg, pair_feats, ref_images,
                                     feat_dtype=jnp.int8,
                                     color_dtype=jnp.uint8,
                                     keep_unpacked=True)
    poses = extract_poses(batch)
    rend = Renderer(bcfg)
    scale_hws = [(v.shape[2], v.shape[3]) for v in tables["view_feats"]]
    banded_kt, block_ut, color_ut = rend._pose_prep(
        poses, poses["tgt"], scale_hws, H, W, measure_color=True)
    assert banded_kt is not None and all(k for k in banded_kt), banded_kt
    assert block_ut is not None and all(u for u in block_ut), block_ut
    assert color_ut is not None, "color supercell union overflowed at DTU"


    rgb_f32 = np.asarray(
        _our_render(params, cfg, batch, pix, tables_dtype=jnp.float32)["rgb"])
    rgb_prod = np.asarray(
        _our_render(params, cfg, batch, pix, tables_dtype=jnp.int8,
                    color_dtype=jnp.uint8, banded_kt=banded_kt,
                    banded_impl="block", block_ut=block_ut,
                    color_ut=color_ut, keep_unpacked=True,
                    decoder_impl="pallas")["rgb"])

    mse = float(np.mean((rgb_f32 - rgb_prod) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-20))
    implied_delta = 4.34 * 10 ** ((26.91 - psnr) / 10.0)
    print(f"production-stack-vs-f32: PSNR {psnr:.1f} dB, "
          f"implied DTU delta {implied_delta:.4f} dB")
    assert psnr >= 46.5, (
        f"production eval stack costs too much: {psnr:.1f} dB vs f32 "
        f"(implied DTU PSNR delta {implied_delta:.3f} dB > 0.05)")
