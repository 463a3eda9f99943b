"""Torch-oracle parity at the NON-DTU reference eval shapes.

Counterpart of test_realistic_shapes.test_oracle_parity_dtu_shapes at the
other shapes of /root/reference/configs/test.yaml:14-37 — LLFF/TnT 960x640
and Blender 800x800 — on a 512-ray subset (full-frame CPU rendering through
the oracle is prohibitive; the sampled rays exercise the same shape-dependent
grid-sample border and NDC code paths). Auto-marked `parity` (torch import).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torch_oracle import install_reference, reference_opts, tpu_cfg_from_opts

install_reference()

from models.matchnerf import MatchNeRF  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from matchnerf_tpu import camera  # noqa: E402
from matchnerf_tpu.import_torch import import_matchnerf_checkpoint  # noqa: E402
from test_full_shapes import SHAPES, V, _render, shape_batch  # noqa: E402


@pytest.mark.parametrize("name,H,W,fmul,nf,setbg",
                         SHAPES, ids=[s[0] for s in SHAPES])
def test_oracle_parity_full_shape(name, H, W, fmul, nf, setbg):
    opts = reference_opts()
    opts.encoder.num_transformer_layers = 2    # CPU-runtime compromise (the
    # layer count doesn't change the shape-dependent numerics under test)
    torch.manual_seed(0)
    model = MatchNeRF(opts)
    model.eval()

    rng = np.random.default_rng(10)
    batch = shape_batch(rng, H, W, fmul, nf)
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

    out = _render(params, cfg, batch, pix, H=H, W=W,
                  tables_dtype=jnp.float32)
    rgb_ref = ret_ref["rgb"].numpy()
    np.testing.assert_allclose(np.asarray(out["rgb"]), rgb_ref, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               ret_ref["depth"].numpy(), atol=5e-3)
    mae = np.abs(np.asarray(out["rgb"]) - rgb_ref).mean()
    assert mae < 2e-4, f"rgb MAE too high at {name} {W}x{H}: {mae}"
