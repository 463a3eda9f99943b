"""Parity: generic (unconditional) NeRF decoder vs reference NeRF.forward."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torch_oracle import install_reference, reference_opts, tpu_cfg_from_opts

install_reference()

from models.rfdecoder.nerf import NeRF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from matchnerf_tpu.import_torch import _lin  # noqa: E402
from matchnerf_tpu.models.decoder.nerf import apply_nerf  # noqa: E402


def _generic_opts():
    opts = reference_opts()
    opts.decoder.layers_feat = [None, 32, 32, 32, 32]
    opts.decoder.layers_rgb = [None, 16, 3]
    opts.decoder.skip = [2]
    opts.decoder.tf_init = True
    opts.decoder.density_activ = "relu_"
    opts.decoder.posenc = reference_opts().decoder.posenc
    opts.decoder.posenc.L_view = 4
    opts.nerf.legacy_coord = False
    return opts


def _import_generic(sd):
    p = {"mlp_feat": [], "mlp_rgb": []}
    i = 0
    while f"mlp_feat.{i}.weight" in sd:
        p["mlp_feat"].append(_lin(sd, f"mlp_feat.{i}"))
        i += 1
    i = 0
    while f"mlp_rgb.{i}.weight" in sd:
        p["mlp_rgb"].append(_lin(sd, f"mlp_rgb.{i}"))
        i += 1
    return p


def test_generic_nerf_forward_parity():
    opts = _generic_opts()
    torch.manual_seed(0)
    net = NeRF(opts)
    net.eval()

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (2, 5, 7, 3)).astype(np.float32)
    ray = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
    ray = ray / np.linalg.norm(ray, axis=-1, keepdims=True)

    with torch.no_grad():
        ref_rgb, ref_density = net(opts, torch.from_numpy(pts),
                                   ray_unit=torch.from_numpy(ray))

    params = _import_generic({k: v.numpy() for k, v in net.state_dict().items()})
    cfg = tpu_cfg_from_opts(opts)
    rgb, density = apply_nerf(params, cfg, jnp.asarray(pts), ray_unit=jnp.asarray(ray))

    np.testing.assert_allclose(np.asarray(rgb), ref_rgb.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(density), ref_density.numpy(), atol=2e-5)


def test_generic_nerf_init_shapes():
    from matchnerf_tpu.models.decoder.nerf import init_nerf

    cfg = tpu_cfg_from_opts(_generic_opts())
    p = init_nerf(jax.random.PRNGKey(0), cfg)
    assert p["mlp_feat"][0]["w"].shape == (63, 32)
    assert p["mlp_feat"][2]["w"].shape == (32 + 63, 32)   # skip at layer 2
    assert p["mlp_feat"][-1]["w"].shape == (32, 33)       # +1 density channel
    assert p["mlp_rgb"][0]["w"].shape == (32 + 27, 16)    # feat + view posenc(L=4)
    assert p["mlp_rgb"][-1]["w"].shape == (16, 3)
