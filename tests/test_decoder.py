"""Parity: conditional NeRF decoder + compositing vs the torch reference.

Instantiates the reference `CondNeRF` with its own random init, imports the
weights through `import_torch`, and asserts our functional decoder produces
the same outputs — validating both the importer's name/layout mapping and
the decoder math (MLP bias-conditioning, ray transformer, composite).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torch_oracle import install_reference, reference_opts, tpu_cfg_from_opts

install_reference()

from models.rfdecoder.cond_nerf import CondNeRF  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from matchnerf_tpu.import_torch import import_cond_nerf_params  # noqa: E402
from matchnerf_tpu.models.decoder.cond_nerf import (apply_cond_nerf,  # noqa: E402
                                                    composite)


def _rand_inputs(rng, B=2, R=5, S=16, V=3, G=10):
    pts = rng.uniform(-1, 2, (B, R, S, 3)).astype(np.float32)
    ray = rng.standard_normal((B, R, 3)).astype(np.float32)
    ray_unit = ray / np.linalg.norm(ray, axis=-1, keepdims=True)
    ray_unit = np.repeat(ray_unit[:, :, None, :], S, axis=2)
    cond = {
        "feat_info": rng.uniform(-1, 1, (B, R, S, G)).astype(np.float32),
        "color_info": rng.uniform(0, 1, (B, R, S, 3 * V)).astype(np.float32),
        "mask_info": (rng.uniform(0, 1, (B, R, S, V)) > 0.3).astype(np.float32),
    }
    return pts, ray, ray_unit, cond


@pytest.mark.parametrize("legacy", [True, False])
@pytest.mark.parametrize("density_maskfill", [False, True])
def test_cond_nerf_forward_parity(legacy, density_maskfill):
    opts = reference_opts()
    opts.nerf.legacy_coord = legacy
    opts.decoder.density_maskfill = density_maskfill
    opts.nerf.sample_intvs = 16
    torch.manual_seed(0)
    net = CondNeRF(opts)
    net.eval()

    rng = np.random.default_rng(0)
    pts, ray, ray_unit, cond = _rand_inputs(rng)

    with torch.no_grad():
        ref_rgb, ref_alpha = net(
            opts, torch.from_numpy(pts), ray_unit=torch.from_numpy(ray_unit),
            cond_info={k: torch.from_numpy(v) for k, v in cond.items()})

    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params = import_cond_nerf_params(sd)
    cfg = tpu_cfg_from_opts(opts)
    rgb, density = apply_cond_nerf(params, cfg, jnp.asarray(pts),
                                   ray_unit=jnp.asarray(ray_unit),
                                   cond_info={k: jnp.asarray(v) for k, v in cond.items()})

    np.testing.assert_allclose(np.asarray(rgb), ref_rgb.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(density), ref_alpha.numpy(), atol=2e-5)


@pytest.mark.parametrize("setbg_opaque", [False, True])
def test_composite_parity(setbg_opaque):
    opts = reference_opts()
    opts.nerf.sample_intvs = 16
    torch.manual_seed(1)
    net = CondNeRF(opts)

    rng = np.random.default_rng(1)
    B, R, S = 2, 7, 16
    ray = rng.standard_normal((B, R, 3)).astype(np.float32)
    rgb_samples = rng.uniform(0, 1, (B, R, S, 3)).astype(np.float32)
    density = rng.uniform(0, 2, (B, R, S)).astype(np.float32)
    depth = np.sort(rng.uniform(0.5, 4.0, (B, R, S, 1)).astype(np.float32), axis=2)

    ref_rgb, ref_depth, ref_op, ref_prob = net.composite(
        opts, torch.from_numpy(ray), torch.from_numpy(rgb_samples),
        torch.from_numpy(density), torch.from_numpy(depth), setbg_opaque=setbg_opaque)

    cfg = tpu_cfg_from_opts(opts)
    rgb, depth_o, opac, prob = composite(cfg, jnp.asarray(ray), jnp.asarray(rgb_samples),
                                         jnp.asarray(density), jnp.asarray(depth),
                                         setbg_opaque=setbg_opaque)
    np.testing.assert_allclose(np.asarray(rgb), ref_rgb.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth_o), ref_depth.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(opac), ref_op.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(prob), ref_prob.numpy(), atol=1e-5)


def test_composite_with_render_interval():
    """Exercise the sigma*delta path (wo_render_interval=False, nerf.py:113)."""
    opts = reference_opts()
    opts.nerf.wo_render_interval = False
    torch.manual_seed(2)
    net = CondNeRF(opts)
    rng = np.random.default_rng(2)
    B, R, S = 1, 4, 8
    ray = rng.standard_normal((B, R, 3)).astype(np.float32)
    rgb_samples = rng.uniform(0, 1, (B, R, S, 3)).astype(np.float32)
    density = rng.uniform(0, 2, (B, R, S)).astype(np.float32)
    depth = np.sort(rng.uniform(0.5, 4.0, (B, R, S, 1)).astype(np.float32), axis=2)
    ref = net.composite(opts, torch.from_numpy(ray), torch.from_numpy(rgb_samples),
                        torch.from_numpy(density), torch.from_numpy(depth), setbg_opaque=False)
    cfg = tpu_cfg_from_opts(opts)
    ours = composite(cfg, jnp.asarray(ray), jnp.asarray(rgb_samples),
                     jnp.asarray(density), jnp.asarray(depth))
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(np.asarray(o), r.numpy(), atol=1e-5)


def test_ray_transformer_posenc_variant():
    """raytrans_posenc=True adds the sinusoid table (cond_nerf.py:77-78)."""
    opts = reference_opts()
    opts.decoder.raytrans_posenc = True
    opts.nerf.sample_intvs = 16
    torch.manual_seed(3)
    net = CondNeRF(opts)
    net.eval()
    rng = np.random.default_rng(3)
    pts, ray, ray_unit, cond = _rand_inputs(rng)
    with torch.no_grad():
        ref_rgb, ref_alpha = net(
            opts, torch.from_numpy(pts), ray_unit=torch.from_numpy(ray_unit),
            cond_info={k: torch.from_numpy(v) for k, v in cond.items()})
    params = import_cond_nerf_params({k: v.numpy() for k, v in net.state_dict().items()})
    cfg = tpu_cfg_from_opts(opts)
    rgb, density = apply_cond_nerf(params, cfg, jnp.asarray(pts),
                                   ray_unit=jnp.asarray(ray_unit),
                                   cond_info={k: jnp.asarray(v) for k, v in cond.items()})
    np.testing.assert_allclose(np.asarray(rgb), ref_rgb.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(density), ref_alpha.numpy(), atol=2e-5)
