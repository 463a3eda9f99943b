"""Precision-mode plumbing: strict-f32 tables match the raw sampling path
exactly; bf16 tables stay within tolerance; wo_self_attn encoder parity."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_engine import SyntheticDataset, tiny_cfg


def _render_both(tmp_path, dtype_name):
    from matchnerf_tpu.data.loader import collate
    from matchnerf_tpu.models.matchnerf import init_matchnerf, encode, render_rays
    from matchnerf_tpu.renderer import Renderer, extract_poses
    from matchnerf_tpu import camera
    from matchnerf_tpu.utils import DotDict

    cfg = tiny_cfg(tmp_path)
    cfg.precision = DotDict(cond_sample_dtype=dtype_name, fused_cosine=False)
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    batch = collate([SyntheticDataset(n=1, H=16, W=16)[0]])
    r = Renderer(cfg)
    out_tables = r.forward(params, batch, mode="test")

    # raw 4-tap reference path (no tables)
    poses = extract_poses(batch)
    ref_images = jnp.asarray(batch["images"][:, :3])
    feats = encode(params, cfg, ref_images)
    grid = np.asarray(camera.pixel_grid(16, 16, legacy=True))
    c2w = camera.pose_inverse_legacy_np(np.asarray(poses["tgt"]["extrinsics"]))
    out_raw = render_rays(
        params, cfg, jnp.asarray(grid[None]),
        tgt_intr=jnp.asarray(poses["tgt"]["intrinsics"]), tgt_c2w=jnp.asarray(c2w),
        tgt_near_far=jnp.asarray(poses["tgt"]["near_fars"]),
        ref_w2c=jnp.asarray(poses["ref"]["extrinsics"]),
        ref_intr=jnp.asarray(poses["ref"]["intrinsics"]),
        ref_near_far=jnp.asarray(poses["ref"]["near_fars"]),
        ref_images=ref_images, pair_feats=feats, img_h=16, img_w=16)
    return np.asarray(out_tables["rgb"]), np.asarray(out_raw["rgb"])


def test_strict_f32_tables_match_raw_path(tmp_path):
    # packed bilinear nests the weights ((x-lerp)-then-(y-lerp)) vs the raw
    # path's 4-weight sum — identical math, ~1e-5 float reassociation drift
    a, b = _render_both(tmp_path, "float32")
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_bf16_tables_within_tolerance(tmp_path):
    a, b = _render_both(tmp_path, "bfloat16")
    assert np.abs(a - b).mean() < 2e-3      # sampling in bf16: small drift only
    assert np.abs(a - b).max() < 5e-2


def test_strict_preset_disables_every_fast_path():
    """precision.strict=true must collapse all lossy/fast-path knobs at read
    time, whatever the config (or its _parent_) sets — the de-risked one-switch
    recipe for the real-asset parity run (docs/REPRODUCE.md)."""
    from matchnerf_tpu.renderer import (banded_impl, color_sample_dtype,
                                        cond_sample_dtype, decoder_impl)
    from matchnerf_tpu.utils import DotDict, effective_precision

    cfg = DotDict(precision=DotDict(
        # worst case: every fast path explicitly enabled...
        cond_sample_dtype="int8", color_sample_dtype="uint8",
        encoder_compute_dtype="bfloat16", decoder_matmul_dtype="bfloat16",
        decoder_compute_dtype="bfloat16",
        banded_kernel=True, block_kernel=True, banded_gather=True,
        decoder_kernel=True, fused_cosine=True,
        # ...then the one switch
        strict=True))
    assert cond_sample_dtype(cfg) is jnp.float32
    assert color_sample_dtype(cfg) is None          # None = f32 color path
    assert banded_impl(cfg) is None                 # direct XLA cond query
    assert decoder_impl(cfg) == "xla"
    prec = effective_precision(cfg)
    assert prec["encoder_compute_dtype"] == "float32"
    assert prec["decoder_compute_dtype"] == "float32"
    assert prec["decoder_matmul_dtype"] == "float32"
    assert not prec["fused_cosine"]
    # without the switch the fast settings are honored unchanged
    cfg.precision.strict = False
    assert cond_sample_dtype(cfg) is jnp.int8
    assert banded_impl(cfg) == "block"
    assert decoder_impl(cfg) == "pallas"


def test_strict_yaml_preset_overrides_parent():
    """configs/test_strict.yaml inherits the fast eval stack from test.yaml
    and must still resolve to the strict path."""
    from matchnerf_tpu.config import load_options
    from matchnerf_tpu.renderer import (banded_impl, color_sample_dtype,
                                        cond_sample_dtype, decoder_impl)

    cfg = load_options("test_strict")
    # the parent really does enable the fast stack...
    assert cfg.precision.block_kernel and cfg.precision.decoder_kernel
    assert cfg.precision.strict
    # ...and the accessors resolve strict anyway
    assert cond_sample_dtype(cfg) is jnp.float32
    assert color_sample_dtype(cfg) is None
    assert banded_impl(cfg) is None
    assert decoder_impl(cfg) == "xla"


def test_strict_preset_renders_like_explicit_f32(tmp_path):
    """End to end: a strict-preset render is bit-identical to the manual
    five-override f32 configuration it replaces."""
    from matchnerf_tpu.data.loader import collate
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    from matchnerf_tpu.renderer import Renderer
    from matchnerf_tpu.utils import DotDict

    cfg = tiny_cfg(tmp_path)
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    batch = collate([SyntheticDataset(n=1, H=16, W=16)[0]])

    cfg_fast_plus_strict = tiny_cfg(tmp_path)
    cfg_fast_plus_strict.precision = DotDict(
        cond_sample_dtype="int8", color_sample_dtype="uint8",
        banded_kernel=True, block_kernel=True, decoder_kernel=True,
        strict=True)
    cfg_manual = tiny_cfg(tmp_path)
    cfg_manual.precision = DotDict(
        cond_sample_dtype="float32", color_sample_dtype="float32",
        encoder_compute_dtype="float32", banded_kernel=False,
        block_kernel=False, decoder_kernel=False)
    a = Renderer(cfg_fast_plus_strict).forward(params, batch, mode="test")
    b = Renderer(cfg_manual).forward(params, batch, mode="test")
    np.testing.assert_array_equal(np.asarray(a["rgb"]), np.asarray(b["rgb"]))


def test_wo_self_attn_encoder_parity():
    torch = pytest.importorskip("torch")
    from torch_oracle import install_reference
    install_reference()
    from models.gmflow.gmflow import GMFlow

    from matchnerf_tpu.import_torch import import_gmflow_params
    from matchnerf_tpu.models.gmflow.gmflow import gmflow_extract_pair_features

    torch.manual_seed(0)
    net = GMFlow(feature_channels=128, num_scales=1, num_head=1, attention_type="swin",
                 ffn_dim_expansion=4, feature_upsampler="network", upsample_factor=2,
                 num_transformer_layers=2, device="cpu")
    net.eval()
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (1, 3, 3, 32, 48)).astype(np.float32)
    with torch.no_grad():
        ref = net(imgs=torch.from_numpy(imgs), attn_splits_list=[2],
                  keep_raw_feats=True, wo_self_attn=True)
    params = import_gmflow_params({k: v.numpy() for k, v in net.state_dict().items()},
                                  num_layers=2)
    scales = gmflow_extract_pair_features(
        params, jnp.asarray(imgs.transpose(0, 1, 3, 4, 2)), attn_splits_list=[2],
        n_views=3, keep_raw_feats=True, wo_self_attn=True)
    np.testing.assert_allclose(
        np.asarray(scales[0][:, :, 0]).transpose(0, 1, 4, 2, 3),
        ref["aug_feat0s"][0].numpy(), atol=2e-3, rtol=1e-4)
