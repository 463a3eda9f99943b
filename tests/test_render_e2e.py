"""End-to-end render parity: full MatchNeRF pipeline vs the torch reference.

Builds the reference `MatchNeRF` with random weights and synthetic cameras,
renders a full (tiny) image deterministically, imports the weights, and
asserts our jitted `render_rays` produces the same pixels. This covers ray
casting, depth sampling, the grouped cosine matching prior, NDC
canonicalization, the decoder and compositing in one shot.
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
from matchnerf_tpu.models.matchnerf import encode, render_rays  # noqa: E402


def look_at_pose(eye, target=(0, 0, 0), up=(0, 1, 0)):
    """w2c [3,4] for a camera at `eye` looking at `target` (OpenCV convention)."""
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)
    z = target - eye
    z = z / np.linalg.norm(z)
    x = np.cross(z, up)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=0)
    t = -R @ eye
    return np.concatenate([R, t[:, None]], axis=1).astype(np.float32)


def synthetic_batch(rng, B=1, V=3, H=32, W=48):
    eyes = [(3, 0.3, 0.2), (2.8, -0.4, 0.9), (2.9, 0.5, -0.8), (3.1, 0.1, 0.4)]
    poses = np.stack([look_at_pose(e) for e in eyes[: V + 1]])       # [V+1,3,4]
    extrinsics = np.tile(poses[None], (B, 1, 1, 1))
    f = 40.0
    intr = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    intrinsics = np.tile(intr[None, None], (B, V + 1, 1, 1))
    near_fars = np.tile(np.array([[1.5, 4.5]], np.float32), (B * (V + 1), 1)).reshape(B, V + 1, 2)
    images = rng.uniform(0, 1, (B, V + 1, 3, H, W)).astype(np.float32)
    return dict(images=images, extrinsics=extrinsics, intrinsics=intrinsics,
                near_fars=near_fars)


@pytest.mark.parametrize("legacy", [True, False])
def test_render_full_image_parity(legacy):
    opts = reference_opts()
    opts.nerf.sample_intvs = 8
    opts.nerf.legacy_coord = legacy
    torch.manual_seed(0)
    model = MatchNeRF(opts)
    model.eval()

    rng = np.random.default_rng(0)
    B, V, H, W = 1, 3, 32, 48
    batch = synthetic_batch(rng, B, V, H, W)

    ref_images_t = torch.from_numpy(batch["images"][:, :V])
    with torch.no_grad():
        feats_ref = model.get_img_feat(ref_images_t, attn_splits_list=[2],
                                       cur_n_src_views=V)
        tgt_pose = {
            "extrinsics": torch.from_numpy(batch["extrinsics"][:, -1, :3, :]),
            "intrinsics": torch.from_numpy(batch["intrinsics"][:, -1]),
            "near_fars": torch.from_numpy(batch["near_fars"][:, -1]),
        }
        ref_poses = {
            "extrinsics": torch.from_numpy(batch["extrinsics"][:, :-1, :3, :]),
            "intrinsics": torch.from_numpy(batch["intrinsics"][:, :-1]),
            "near_fars": torch.from_numpy(batch["near_fars"][:, :-1]),
        }
        ret_ref = model.render(opts, tgt_pose, ray_idx=None, mode="test",
                               ref_poses=ref_poses,
                               ref_images=ref_images_t,
                               ref_feats_list=feats_ref)

    # ---- ours ----
    params = import_matchnerf_checkpoint(
        {k: v.numpy() for k, v in model.state_dict().items()})
    cfg = tpu_cfg_from_opts(opts)

    ref_images_j = jnp.asarray(batch["images"][:, :V].transpose(0, 1, 3, 4, 2))
    pair_feats = encode(params, cfg, ref_images_j)

    tgt_pose_np = batch["extrinsics"][:, -1, :3, :]
    c2w = (camera.pose_inverse_legacy_np(tgt_pose_np) if legacy
           else np.asarray(camera.pose_inverse(jnp.asarray(tgt_pose_np))))
    pix = np.asarray(camera.pixel_grid(H, W, legacy=legacy))[None]

    out = render_rays(
        params, cfg,
        pix_xy=jnp.asarray(pix),
        tgt_intr=jnp.asarray(batch["intrinsics"][:, -1]),
        tgt_c2w=jnp.asarray(c2w),
        tgt_near_far=jnp.asarray(batch["near_fars"][:, -1]),
        ref_w2c=jnp.asarray(batch["extrinsics"][:, :-1, :3, :]),
        ref_intr=jnp.asarray(batch["intrinsics"][:, :-1]),
        ref_near_far=jnp.asarray(batch["near_fars"][:, :-1]),
        ref_images=ref_images_j,
        pair_feats=pair_feats,
        img_h=H, img_w=W)

    np.testing.assert_allclose(np.asarray(out["rgb"]), ret_ref["rgb"].numpy(),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["depth"]), ret_ref["depth"].numpy(),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(out["opacity"]), ret_ref["opacity"].numpy(),
                               atol=2e-3)
    # tighter aggregate check: mean abs error well below visual threshold
    mae = np.abs(np.asarray(out["rgb"]) - ret_ref["rgb"].numpy()).mean()
    assert mae < 2e-4, f"rgb MAE too high: {mae}"
