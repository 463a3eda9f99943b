"""Parity for optional model variants: local-neighborhood feature sampling,
the ibrnet inference resize hack, ELU ray-transformer activation, inverse
depth parametrization."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torch_oracle import install_reference, reference_opts, tpu_cfg_from_opts

install_reference()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def test_local_radius_sampling_parity():
    from models.gmflow.utils import sample_features_by_grid as ref_sample

    from matchnerf_tpu.ops.grid_sample import sample_features_by_grid

    rng = np.random.default_rng(0)
    B, H, W, C = 2, 12, 16, 8
    feat = rng.standard_normal((B, H, W, C)).astype(np.float32)
    grid = rng.uniform(-1.2, 1.2, (B, 5, 7, 2)).astype(np.float32)

    ref = ref_sample(torch.from_numpy(feat.transpose(0, 3, 1, 2)),
                     torch.from_numpy(grid), local_radius=2, local_dilation=1)
    ours = sample_features_by_grid(jnp.asarray(feat), jnp.asarray(grid),
                                   local_radius=2, local_dilation=1)
    # ref returns [B, C, n_rays, n_pts]
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=1e-5)

    ref_d = ref_sample(torch.from_numpy(feat.transpose(0, 3, 1, 2)),
                       torch.from_numpy(grid), local_radius=1, local_dilation=2)
    ours_d = sample_features_by_grid(jnp.asarray(feat), jnp.asarray(grid),
                                     local_radius=1, local_dilation=2)
    np.testing.assert_allclose(np.asarray(ours_d).transpose(0, 3, 1, 2),
                               ref_d.numpy(), atol=1e-5)


def test_inverse_depth_param():
    """depth.param='inverse' (matchnerf.py:177-180)."""
    from matchnerf_tpu.models.matchnerf import sample_depth

    opts = reference_opts()
    opts.nerf.depth.param = "inverse"
    opts.nerf.sample_intvs = 8
    cfg = tpu_cfg_from_opts(opts)
    nf = jnp.array([[1.0, 5.0]], jnp.float32)
    d = np.asarray(sample_depth(cfg, nf, 1, 3))
    # legacy: metric bins 1 + i/7*4, inverted
    expect = 1.0 / (1.0 + np.arange(8) / 7.0 * 4.0 + 1e-8)
    np.testing.assert_allclose(d[0, 0, :, 0], expect, atol=1e-6)


def test_elu_decoder_parity():
    """ELU raytrans activation variant (configs/train_ibrnet.yaml, demo_own)."""
    from models.rfdecoder.cond_nerf import CondNeRF

    from matchnerf_tpu.import_torch import import_cond_nerf_params
    from matchnerf_tpu.models.decoder.cond_nerf import apply_cond_nerf

    opts = reference_opts()
    opts.decoder.raytrans_act = "ELU"
    opts.decoder.raytrans_posenc = True
    opts.decoder.density_maskfill = True
    opts.nerf.sample_intvs = 16
    torch.manual_seed(0)
    net = CondNeRF(opts)
    net.eval()

    rng = np.random.default_rng(0)
    B, R, S, V, G = 1, 4, 16, 3, 10
    pts = rng.uniform(-1, 2, (B, R, S, 3)).astype(np.float32)
    ray = rng.standard_normal((B, R, 3)).astype(np.float32)
    ray_unit = np.repeat((ray / np.linalg.norm(ray, axis=-1, keepdims=True))[:, :, None],
                         S, axis=2)
    cond = {
        "feat_info": rng.uniform(-1, 1, (B, R, S, G)).astype(np.float32),
        "color_info": rng.uniform(0, 1, (B, R, S, 3 * V)).astype(np.float32),
        "mask_info": (rng.uniform(0, 1, (B, R, S, V)) > 0.3).astype(np.float32),
    }
    with torch.no_grad():
        ref_rgb, ref_alpha = net(opts, torch.from_numpy(pts),
                                 ray_unit=torch.from_numpy(ray_unit),
                                 cond_info={k: torch.from_numpy(v) for k, v in cond.items()})
    params = import_cond_nerf_params({k: v.numpy() for k, v in net.state_dict().items()})
    cfg = tpu_cfg_from_opts(opts)
    rgb, density = apply_cond_nerf(params, cfg, jnp.asarray(pts),
                                   ray_unit=jnp.asarray(ray_unit),
                                   cond_info={k: jnp.asarray(v) for k, v in cond.items()})
    np.testing.assert_allclose(np.asarray(rgb), ref_rgb.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(density), ref_alpha.numpy(), atol=2e-5)


def test_ibrnet_resize_hack():
    """756x1008 inputs are resized to 768x1024 before the backbone
    (gmflow.py:100-103); check shapes flow through our encoder."""
    from matchnerf_tpu.models.gmflow.gmflow import gmflow_extract_pair_features
    from matchnerf_tpu.models.gmflow.gmflow import init_gmflow

    params = init_gmflow(jax.random.PRNGKey(0), num_transformer_layers=1)
    imgs = jnp.zeros((1, 3, 756, 1008, 3), jnp.float32)
    # attn_splits [4] as the ibrnet config uses (configs/train_ibrnet.yaml:9)
    scales = gmflow_extract_pair_features(params, imgs, attn_splits_list=[4],
                                          n_views=3)
    assert scales[0].shape == (1, 3, 2, 96, 128, 128)   # 768/8, 1024/8
    assert scales[1].shape == (1, 3, 2, 192, 256, 128)  # 1/4 after upsampler
