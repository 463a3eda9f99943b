"""Parity tests: camera/pose math vs the torch reference (misc/camera.py)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torch_oracle import install_reference

install_reference()

from misc import camera as ref_camera  # noqa: E402  (reference oracle)

import jax.numpy as jnp  # noqa: E402

from matchnerf_tpu import camera  # noqa: E402


def random_pose(rng, batch=2):
    """Random valid w2c poses [B,3,4]."""
    from scipy.spatial.transform import Rotation
    R = Rotation.random(batch, random_state=rng).as_matrix().astype(np.float32)
    t = rng.standard_normal((batch, 3)).astype(np.float32)
    return np.concatenate([R, t[..., None]], axis=-1)


def test_pose_inverse():
    rng = np.random.default_rng(0)
    pose = random_pose(rng)
    ours = np.asarray(camera.pose_inverse(jnp.asarray(pose)))
    ref = ref_camera.Pose().invert(torch.from_numpy(pose)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_pose_inverse_legacy_matches_f64():
    rng = np.random.default_rng(1)
    pose = random_pose(rng)
    ours = camera.pose_inverse_legacy_np(pose)
    sq = np.repeat(np.eye(4, dtype=np.float64)[None], len(pose), axis=0)
    sq[:, :3, :] = pose
    ref = np.linalg.inv(sq)[:, :3, :].astype(np.float32)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("legacy", [False, True])
def test_get_center_and_ray(legacy):
    rng = np.random.default_rng(2)
    B, H, W = 2, 8, 12
    pose = random_pose(rng, B)
    intr = np.tile(np.array([[20.0, 0, 6.0], [0, 18.0, 4.0], [0, 0, 1]], np.float32), (B, 1, 1))
    intr += rng.standard_normal((B, 3, 3)).astype(np.float32) * np.array(
        [[0.1, 0, 0.1], [0, 0.1, 0.1], [0, 0, 0]], np.float32)

    ref_center, ref_ray = ref_camera.get_center_and_ray(
        H, W, torch.from_numpy(pose), intr=torch.from_numpy(intr),
        legacy=legacy, device="cpu")

    xy = camera.pixel_grid(H, W, legacy=legacy)
    c2w = (camera.pose_inverse_legacy_np(pose) if legacy
           else np.asarray(camera.pose_inverse(jnp.asarray(pose))))
    center, ray = camera.get_center_and_ray(xy, jnp.asarray(intr), jnp.asarray(c2w))

    np.testing.assert_allclose(np.asarray(center), ref_center.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ray), ref_ray.numpy(), atol=2e-5)


def test_get_coord_ref_ndc():
    rng = np.random.default_rng(3)
    B, R, S = 2, 5, 7
    pose = random_pose(rng, B)
    intr = np.tile(np.array([[30.0, 0, 8.0], [0, 28.0, 6.0], [0, 0, 1]], np.float32), (B, 1, 1))
    pts = rng.standard_normal((B, R, S, 3)).astype(np.float32) * 2.0
    inv_scale = np.tile(np.array([[15.0, 11.0]], np.float32), (B, 1))
    near_far = np.tile(np.array([[0.5, 4.0]], np.float32), (B, 1))

    ref = ref_camera.get_coord_ref_ndc(
        torch.from_numpy(pose), torch.from_numpy(intr), torch.from_numpy(pts),
        torch.from_numpy(inv_scale), torch.from_numpy(near_far)).numpy()
    ours = np.asarray(camera.get_coord_ref_ndc(
        jnp.asarray(pose), jnp.asarray(intr), jnp.asarray(pts),
        jnp.asarray(inv_scale), jnp.asarray(near_far)))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_3d_points_from_depth():
    rng = np.random.default_rng(4)
    B, R, S = 2, 6, 4
    center = rng.standard_normal((B, R, 3)).astype(np.float32)
    ray = rng.standard_normal((B, R, 3)).astype(np.float32)
    depth = rng.uniform(0.5, 3.0, (B, R, S, 1)).astype(np.float32)
    ours = np.asarray(camera.get_3d_points_from_depth(
        jnp.asarray(center), jnp.asarray(ray), jnp.asarray(depth), multi_samples=True))
    ref = (center[:, :, None] + ray[:, :, None] * depth)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_interpolate_render_path_matches_reference():
    rng = np.random.default_rng(5)
    from scipy.spatial.transform import Rotation
    c2ws = np.repeat(np.eye(4, dtype=np.float64)[None], 3, axis=0)
    c2ws[:, :3, :3] = Rotation.random(3, random_state=rng).as_matrix()
    c2ws[:, :3, 3] = rng.standard_normal((3, 3))
    ref = ref_camera.get_interpolate_render_path(c2ws.copy(), 30)
    ours = camera.get_interpolate_render_path(c2ws.copy(), 30)
    np.testing.assert_allclose(ours, ref, atol=1e-8)


def test_spiral_render_path_matches_reference():
    rng = np.random.default_rng(6)
    from scipy.spatial.transform import Rotation
    c2ws = np.repeat(np.eye(4, dtype=np.float64)[None], 5, axis=0)
    c2ws[:, :3, :3] = Rotation.random(5, random_state=rng).as_matrix()
    c2ws[:, :3, 3] = rng.standard_normal((5, 3)) * 0.3
    ref = ref_camera.get_spiral_render_path(c2ws.copy(), [1.0, 5.0], rads_scale=0.1, N_views=12)
    ours = camera.get_spiral_render_path(c2ws.copy(), [1.0, 5.0], rads_scale=0.1, n_frames=12)
    np.testing.assert_allclose(ours, ref, atol=1e-8)
