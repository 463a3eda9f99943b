"""Camera / pose / projection math (pure JAX) + host-side render-path generators.

Functional re-design of the reference geometry layer `misc/camera.py`
(/root/reference/misc/camera.py). Device-side ops are pure jnp functions safe
under jit/vmap with static shapes; trajectory generators (interpolate/spiral,
misc/camera.py:382-468) are host-side numpy since they run once per video.

Conventions (same as reference):
- a pose is a [..., 3, 4] world-to-camera matrix [R|t]
- `legacy` variants bit-match the original MatchNeRF weights: pixel grid
  without the +0.5 center offset (misc/camera.py:261-262) and float64 pose
  inverse (`cam2world_legacy`, misc/camera.py:231-240) — the f64 inverse is
  done host-side in numpy (JAX default is f32) via `pose_inverse_legacy_np`.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# pose utilities
# ---------------------------------------------------------------------------


def make_pose(R=None, t=None):
    """Assemble [...,3,4] pose from rotation and/or translation (Pose.__call__)."""
    assert R is not None or t is not None
    if R is None:
        t = jnp.asarray(t, jnp.float32)
        R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (*t.shape[:-1], 3, 3))
    elif t is None:
        R = jnp.asarray(R, jnp.float32)
        t = jnp.zeros(R.shape[:-1], jnp.float32)
    else:
        R = jnp.asarray(R, jnp.float32)
        t = jnp.asarray(t, jnp.float32)
    return jnp.concatenate([R, t[..., None]], axis=-1)


def pose_inverse(pose):
    """Invert [...,3,4] rigid pose using R^T (misc/camera.py:36-42)."""
    R, t = pose[..., :3], pose[..., 3:]
    R_inv = jnp.swapaxes(R, -1, -2)
    t_inv = (-R_inv @ t)[..., 0]
    return jnp.concatenate([R_inv, t_inv[..., None]], axis=-1)


def pose_compose_pair(pose_a, pose_b):
    """pose_new(x) = pose_b(pose_a(x)) (misc/camera.py:52-59)."""
    R_a, t_a = pose_a[..., :3], pose_a[..., 3:]
    R_b, t_b = pose_b[..., :3], pose_b[..., 3:]
    R_new = R_b @ R_a
    t_new = (R_b @ t_a + t_b)[..., 0]
    return jnp.concatenate([R_new, t_new[..., None]], axis=-1)


def pose_compose(pose_list):
    pose_new = pose_list[0]
    for p in pose_list[1:]:
        pose_new = pose_compose_pair(pose_new, p)
    return pose_new


def pose_inverse_legacy_np(pose: np.ndarray) -> np.ndarray:
    """float64 4x4 inverse of a [...,3,4] pose, cast back to f32.

    Matches `cam2world_legacy`'s numpy-double inverse (misc/camera.py:231-240),
    required to bit-match the shipped matchnerf_3v weights. Host-side only.
    """
    pose = np.asarray(pose)
    batch_shape = pose.shape[:-2]
    sq = np.broadcast_to(np.eye(4, dtype=np.float64), (*batch_shape, 4, 4)).copy()
    sq[..., :3, :] = pose.astype(np.float64)
    inv = np.linalg.inv(sq)
    return inv[..., :3, :].astype(np.float32)


# ---------------------------------------------------------------------------
# coordinate transforms (misc/camera.py:204-240)
# ---------------------------------------------------------------------------


def to_hom(X):
    return jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)


def world2cam(X, pose):
    """[...,N,3] world points -> camera frame given [...,3,4] w2c pose."""
    return to_hom(X) @ jnp.swapaxes(pose, -1, -2)


def cam2img(X, cam_intr):
    return X @ jnp.swapaxes(cam_intr, -1, -2)


def img2cam(X, cam_intr):
    return X @ jnp.swapaxes(jnp.linalg.inv(cam_intr), -1, -2)


def cam2world(X, pose=None, c2w=None):
    """Camera-frame points -> world. Accepts either the w2c `pose` (inverted
    in-graph with R^T) or a precomputed `c2w` (for the legacy f64 path)."""
    if c2w is None:
        c2w = pose_inverse(pose)
    return to_hom(X) @ jnp.swapaxes(c2w, -1, -2)


# ---------------------------------------------------------------------------
# ray casting (misc/camera.py:255-286)
# ---------------------------------------------------------------------------


def pixel_grid(img_h: int, img_w: int, legacy: bool = False):
    """[H*W, 2] (x, y) pixel coordinates, +0.5 centered unless legacy."""
    off = 0.0 if legacy else 0.5
    y = jnp.arange(img_h, dtype=jnp.float32) + off
    x = jnp.arange(img_w, dtype=jnp.float32) + off
    Y, X = jnp.meshgrid(y, x, indexing="ij")
    return jnp.stack([X, Y], axis=-1).reshape(-1, 2)


def get_center_and_ray(xy_grid, intr, c2w):
    """Camera centers and (unnormalized) ray directions for given pixels.

    xy_grid: [R,2] or [B,R,2] pixel coords; intr: [B,3,3]; c2w: [B,3,4]
    (precompute with `pose_inverse` or `pose_inverse_legacy_np` to pick the
    legacy/non-legacy inverse). Returns center, ray: [B,R,3].
    """
    if xy_grid.ndim == 2:
        xy_grid = jnp.broadcast_to(xy_grid[None], (intr.shape[0], *xy_grid.shape))
    grid_3d_cam = img2cam(to_hom(xy_grid), intr)          # [B,R,3]
    center_3d_cam = jnp.zeros_like(grid_3d_cam)
    grid_3d = cam2world(grid_3d_cam, c2w=c2w)              # [B,R,3]
    center_3d = cam2world(center_3d_cam, c2w=c2w)          # [B,R,3]
    return center_3d, grid_3d - center_3d


def get_3d_points_from_depth(center, ray, depth, multi_samples=False):
    """x = c + d*v (misc/camera.py:281-286). depth: [B,R,S,1] when multi."""
    if multi_samples:
        center, ray = center[:, :, None], ray[:, :, None]
    return center + ray * depth


# ---------------------------------------------------------------------------
# reference-view NDC projection (misc/camera.py:351-379)
# ---------------------------------------------------------------------------


def get_coord_ref_ndc(extr_ref, intr_ref, pts_3d, inv_scale, near_far, lindisp: bool = False):
    """Project world points into a reference view's normalized coordinates.

    extr_ref: [B,3,4] w2c; intr_ref: [B,3,3]; pts_3d: [B,R,S,3];
    inv_scale: [B,2] = (W-1, H-1); near_far: [B,2].
    Returns [B,R,S,3] with xy in [0,1] image coords and z depth-normalized.
    """
    bs, n_rays, n_samples, _ = pts_3d.shape
    pts = pts_3d.reshape(bs, -1, 3)
    near, far = near_far[..., :1], near_far[..., 1:]

    pts_ref = world2cam(pts, extr_ref)                       # [B,RS,3]
    pix = pts_ref @ jnp.swapaxes(intr_ref, -1, -2)           # [B,RS,3]
    xy = pix[..., :2] / pix[..., -1:] / inv_scale.reshape(bs, 1, 2)
    if not lindisp:
        z = (pix[..., 2] - near) / (far - near)
    else:
        z = (1.0 / pix[..., 2] - 1.0 / near) / (1.0 / far - 1.0 / near)
    out = jnp.concatenate([xy, z[..., None]], axis=-1)
    return out.reshape(bs, n_rays, n_samples, 3)


def convert_ndc(center, ray, intr, near=1.0):
    """Shift ray origins to the near plane and project to NDC
    (misc/camera.py:289-306; +z-facing convention)."""
    center = center + (near - center[..., 2:]) / ray[..., 2:] * ray
    cx, cy, cz = center[..., 0], center[..., 1], center[..., 2]
    rx, ry, rz = ray[..., 0], ray[..., 1], ray[..., 2]
    scale_x = (intr[:, 0, 0] / intr[:, 0, 2])[:, None]
    scale_y = (intr[:, 1, 1] / intr[:, 1, 2])[:, None]
    cnx = scale_x * (cx / cz)
    cny = scale_y * (cy / cz)
    cnz = 1 - 2 * near / cz
    rnx = scale_x * (rx / rz - cx / cz)
    rny = scale_y * (ry / rz - cy / cz)
    rnz = 2 * near / cz
    center_ndc = jnp.stack([cnx, cny, cnz], axis=-1)
    ray_ndc = jnp.stack([rnx, rny, rnz], axis=-1)
    return center_ndc, ray_ndc


def rotation_distance(R1, R2, eps=1e-7):
    """Angle between rotations (misc/camera.py:309-314)."""
    R_diff = R1 @ jnp.swapaxes(R2, -2, -1)
    trace = R_diff[..., 0, 0] + R_diff[..., 1, 1] + R_diff[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1) / 2, -1 + eps, 1 - eps))


def procrustes_analysis(X0, X1):
    """Similarity transform aligning point sets (misc/camera.py:317-335). Host numpy."""
    X0, X1 = np.asarray(X0, np.float64), np.asarray(X1, np.float64)
    t0, t1 = X0.mean(0, keepdims=True), X1.mean(0, keepdims=True)
    X0c, X1c = X0 - t0, X1 - t1
    s0 = np.sqrt((X0c ** 2).sum(-1).mean())
    s1 = np.sqrt((X1c ** 2).sum(-1).mean())
    U, _, Vt = np.linalg.svd((X0c / s0).T @ (X1c / s1))
    R = U @ Vt
    if np.linalg.det(R) < 0:
        R[2] *= -1
    return dict(t0=t0[0].astype(np.float32), t1=t1[0].astype(np.float32),
                s0=np.float32(s0), s1=np.float32(s1), R=R.astype(np.float32))


# ---------------------------------------------------------------------------
# host-side render-path generators (misc/camera.py:382-468); numpy/scipy
# ---------------------------------------------------------------------------


def get_interpolate_render_path(c2ws: np.ndarray, n_views: int = 30) -> np.ndarray:
    """Euler-angle interpolation between source camera poses
    (misc/camera.py:382-411). c2ws: [N,3or4,4] camera-to-world. Returns [n,4,4]."""
    from scipy.spatial.transform import Rotation

    N = len(c2ws)
    rotvec, positions = [], []
    rotvec_interp, positions_interp = [], []
    # max(1,...): n_views < 3 would otherwise yield an empty path and crash
    weight = np.linspace(1.0, 0.0, max(1, n_views // 3),
                         endpoint=False).reshape(-1, 1)
    for i in range(N):
        r = Rotation.from_matrix(c2ws[i, :3, :3])
        euler = r.as_euler("xyz", degrees=True).reshape(1, 3)
        if i:
            mask = np.abs(euler - rotvec[0]) > 180
            euler[mask] += 360.0
        rotvec.append(euler)
        positions.append(c2ws[i, :3, 3:].reshape(1, 3))
        if i:
            rotvec_interp.append(weight * rotvec[i - 1] + (1.0 - weight) * rotvec[i])
            positions_interp.append(weight * positions[i - 1] + (1.0 - weight) * positions[i])
    rotvec_interp.append(weight * rotvec[-1] + (1.0 - weight) * rotvec[0])
    positions_interp.append(weight * positions[-1] + (1.0 - weight) * positions[0])

    out = []
    for rv, pos in zip(np.concatenate(rotvec_interp), np.concatenate(positions_interp)):
        c2w = np.eye(4)
        c2w[:3, :3] = Rotation.from_euler("xyz", rv, degrees=True).as_matrix()
        c2w[:3, 3:] = pos.reshape(3, 1)
        out.append(c2w)
    return np.stack(out)


def _normalize_np(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def viewmatrix(z, up, pos):
    vec2 = _normalize_np(z)
    vec0 = _normalize_np(np.cross(up, vec2))
    vec1 = _normalize_np(np.cross(vec2, vec0))
    m = np.eye(4)
    m[:3] = np.stack([vec0, vec1, vec2, pos], 1)
    return m


def poses_avg(poses):
    center = poses[:, :3, 3].mean(0)
    vec2 = _normalize_np(poses[:, :3, 2].sum(0))
    up = poses[:, :3, 1].sum(0)
    return viewmatrix(vec2, up, center)


def render_path_spiral(c2w, up, rads, focal, zrate, n_rots=2, n_frames=120):
    render_poses = []
    rads = np.array(list(rads) + [1.0])
    for theta in np.linspace(0.0, 2.0 * np.pi * n_rots, n_frames + 1)[:-1]:
        c = np.dot(c2w[:3, :4],
                   np.array([np.cos(theta), -np.sin(theta), -np.sin(theta * zrate), 1.0]) * rads)
        z = _normalize_np(c - np.dot(c2w[:3, :4], np.array([0, 0, -focal, 1.0])))
        render_poses.append(viewmatrix(z, up, c))
    return render_poses


def get_spiral_render_path(c2ws_all, near_far, rads_scale=0.5, n_frames=120):
    """LLFF spiral path (misc/camera.py:415-434)."""
    c2w = poses_avg(c2ws_all)
    up = _normalize_np(c2ws_all[:, :3, 1].sum(0))
    close_depth, inf_depth = near_far
    dt = 0.75
    focal = 1.0 / ((1.0 - dt) / close_depth + dt / inf_depth)
    tt = c2ws_all[:, :3, 3] - c2w[:3, 3][None]
    rads = np.percentile(np.abs(tt), 70, 0) * rads_scale
    return np.stack(render_path_spiral(c2w, up, rads, focal, zrate=0.5, n_frames=n_frames))


def get_novel_view_poses(pose_anchor, N=60, scale=1.0):
    """Small circular oscillation around an anchor pose (misc/camera.py:338-348)."""
    theta = np.arange(N) / N * 2 * np.pi
    out = []
    from scipy.spatial.transform import Rotation

    for th in theta:
        rx = Rotation.from_euler("x", np.arcsin(np.sin(th) * 0.05)).as_matrix()
        ry = Rotation.from_euler("y", np.arcsin(np.cos(th) * 0.05)).as_matrix()
        R = ry @ rx
        pose_rot = np.concatenate([R, np.zeros((3, 1))], axis=-1)
        shift1 = np.concatenate([np.eye(3), np.array([[0], [0], [-4 * scale]])], axis=-1)
        shift2 = np.concatenate([np.eye(3), np.array([[0], [0], [3.8 * scale]])], axis=-1)

        def comp(a, b):
            Ra, ta = a[:, :3], a[:, 3:]
            Rb, tb = b[:, :3], b[:, 3:]
            return np.concatenate([Rb @ Ra, Rb @ ta + tb], axis=-1)

        oscil = comp(comp(shift1, pose_rot), shift2)
        out.append(comp(oscil, np.asarray(pose_anchor)))
    return np.stack(out).astype(np.float32)
