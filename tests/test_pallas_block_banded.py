"""Parity tests for the block-banded (shared dilated-union) megakernel
(ops/pallas_block_banded.py) against the direct packed path.

Interpreter mode on the CPU backend; exactness argument: integer tap
matching + the same folded bilinear stencil, so only float rounding differs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matchnerf_tpu.models.gmflow.gmflow import pair_index_lists
from matchnerf_tpu.ops.grid_sample import pack_2x2
from matchnerf_tpu.ops.pallas_block_banded import (block_banded_cosine_scale,
                                                   block_union_size,
                                                   bucket_ut)

from test_pallas_banded import _coherent_grids, _reference_cosine


def test_block_union_size_covers_true_union():
    rng = np.random.default_rng(0)
    V, H, W = 3, 32, 40
    R, S = 24, 32
    grids = _coherent_grids(rng, V, R, S)
    for v in range(V):
        n = int(block_union_size(grids[v, 0], H, W, kt=48, block_rays=8))
        assert 1 <= n <= 8 * 48 * 4
        assert bucket_ut(n) is not None


def test_block_banded_f32_matches_direct():
    rng = np.random.default_rng(1)
    V, H, W, C = 3, 32, 40, 16
    R, S, G = 24, 32, 4
    Cc = (V - 1) * C
    feat = rng.normal(0, 1, (V, H, W, Cc)).astype(np.float32)
    unpacked = jnp.asarray(feat)[None]                             # [1,V,H,W,Cc]
    packed = jax.vmap(lambda f: pack_2x2(f[None])[0])(jnp.asarray(feat))[None]
    grids = _coherent_grids(rng, V, R, S)
    pairs = pair_index_lists(V)

    ut = max(bucket_ut(int(block_union_size(grids[v, 0], H, W, kt=48)))
             for v in range(V))
    ref = _reference_cosine(packed, grids, C, G, pairs)
    out = block_banded_cosine_scale(unpacked, grids, kt=48, ut=ut,
                                    n_groups=G, pairs=pairs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_block_banded_int8_dequant():
    rng = np.random.default_rng(2)
    V, H, W, C = 3, 24, 24, 16
    R, S, G = 16, 32, 2
    Cc = (V - 1) * C
    feat = rng.normal(0, 1, (V, H, W, Cc)).astype(np.float32)
    amax = np.abs(feat).max(axis=(1, 2), keepdims=True)
    scale = np.maximum(amax, 1e-12) / 127.0
    q = np.clip(np.round(feat / scale), -127, 127).astype(np.int8)
    unpacked = jnp.asarray(q)[None]
    packed = jax.vmap(lambda f: pack_2x2(f[None])[0])(jnp.asarray(q))[None]
    scales = jnp.asarray(scale[:, 0, 0])[None]
    grids = _coherent_grids(rng, V, R, S)
    pairs = pair_index_lists(V)

    ut = max(bucket_ut(int(block_union_size(grids[v, 0], H, W, kt=48)))
             for v in range(V))
    ref = _reference_cosine(packed, grids, C, G, pairs, scales=scales)
    out = block_banded_cosine_scale(unpacked, grids, kt=48, ut=ut,
                                    n_groups=G, pairs=pairs,
                                    dequant_scales=scales)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-2)


def test_render_by_slices_block_kernel_matches_direct():
    """End-to-end: full-image eval with precision.block_kernel vs direct,
    including the per-pose device measurement of the union bucket."""
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
    engaged = {}

    def run(block_kernel):
        c = DotDict(dict(cfg))
        c.precision = DotDict({"cond_sample_dtype": "float32",
                               "banded_kernel": True,
                               "block_kernel": block_kernel})
        r = Renderer(c)
        feats = r.encode(params, ref_images)
        tables = r.build_tables(ref_images, feats)
        if block_kernel:
            kt = r._banded_kt(poses, poses["tgt"], tables, H, W)
            engaged["ut"] = r._block_ut(poses, poses["tgt"], tables, H, W, kt)
        return r.render_by_slices(params, poses, ref_images, feats, H, W,
                                  tables=tables)

    out_direct = run(False)
    out_block = run(True)
    assert engaged["ut"] is not None, "block path did not engage"
    np.testing.assert_allclose(out_block["rgb"], out_direct["rgb"],
                               rtol=1e-4, atol=1e-5)


def test_sharded_eval_block_kernel_matches_single_device():
    """render_by_slices under an 8-device CPU mesh with the block kernel.
    B=2 so the batched-eval per-pose split composes with ray sharding (each
    sub-render is a B=1 shard_map over the mesh)."""
    import __graft_entry__ as ge
    from jax.sharding import Mesh
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    from matchnerf_tpu.renderer import Renderer, extract_poses
    from matchnerf_tpu.utils import DotDict

    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=48)
    cfg = DotDict(dict(cfg))
    cfg.precision = DotDict({"cond_sample_dtype": "float32",
                             "banded_kernel": True, "block_kernel": True,
                             "decoder_kernel": True})
    H, W = 32, 32
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    d = ge._synthetic_inputs(cfg, 2, H, W, R=16)
    poses = extract_poses({"extrinsics": d["poses"], "intrinsics": d["intr"],
                           "near_fars": d["near_fars"]})
    ref_images = jnp.asarray(d["images"][:, :3])

    def run(mesh):
        r = Renderer(cfg, mesh=mesh)
        feats = r.encode(params, ref_images)
        tables = r.build_tables(ref_images, feats)
        return r.render_by_slices(params, poses, ref_images, feats, H, W,
                                  tables=tables)

    out_single = run(None)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    out_mesh = run(mesh)
    np.testing.assert_allclose(out_mesh["rgb"], out_single["rgb"],
                               atol=1e-5, rtol=1e-5)


def test_unsafe_pose_falls_back_to_direct_path():
    """A target pose looking AWAY from the sources (samples behind the
    reference cameras) must fail the z-safety prep and render through the
    direct path — bit-identical to a config with all kernels off."""
    import __graft_entry__ as ge
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    from matchnerf_tpu.renderer import Renderer, extract_poses
    from matchnerf_tpu.utils import DotDict

    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=48)
    H, W = 32, 32
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    d = ge._synthetic_inputs(cfg, 1, H, W, R=16)
    # target co-located with source 0 but looking BACKWARD: every sample
    # has z < 0 in source 0's frame — the monotone-band proof fails and the
    # prep must reject the pose
    poses_np = np.array(d["poses"])
    w2c0 = poses_np[0, 0]                                          # [3,4]
    R0, t0 = w2c0[:, :3], w2c0[:, 3]
    c2w_R = R0.T @ np.diag([-1.0, 1.0, -1.0]).astype(np.float32)
    c2w_t = -R0.T @ t0
    poses_np[0, -1, :3, :3] = c2w_R.T
    poses_np[0, -1, :3, 3] = -c2w_R.T @ c2w_t
    poses = extract_poses({"extrinsics": poses_np, "intrinsics": d["intr"],
                           "near_fars": d["near_fars"]})
    ref_images = jnp.asarray(d["images"][:, :3])

    def run(kernels):
        c = DotDict(dict(cfg))
        c.precision = DotDict({"cond_sample_dtype": "float32",
                               "banded_kernel": kernels,
                               "block_kernel": kernels})
        r = Renderer(c)
        feats = r.encode(params, ref_images)
        tables = r.build_tables(ref_images, feats)
        if kernels:
            scale_hws = [(v.shape[2], v.shape[3])
                         for v in tables["view_feats"]]
            kt, ut, _ = r._pose_prep(poses, poses["tgt"], scale_hws, H, W)
            assert kt is None and ut is None, (kt, ut)
        return r.render_by_slices(params, poses, ref_images, feats, H, W,
                                  tables=tables)

    out_direct = run(False)
    out_fall = run(True)
    np.testing.assert_allclose(out_fall["rgb"], out_direct["rgb"],
                               rtol=0, atol=0)


def test_block_trainable_grads_match_direct():
    """Custom-VJP block-banded query: value and table gradients match
    autodiff through the direct packed path (patch-aligned coherent rays)."""
    from matchnerf_tpu.ops.pallas_block_banded import (
        block_banded_cosine_scale_trainable)

    rng = np.random.default_rng(11)
    V, H, W, C = 3, 24, 28, 16
    R, S, G = 16, 24, 4
    Cc = (V - 1) * C
    feat = rng.normal(0, 1, (V, H, W, Cc)).astype(np.float32)
    unpacked = jnp.asarray(feat)[None]
    packed = jax.vmap(lambda f: pack_2x2(f[None])[0])(jnp.asarray(feat))[None]
    # blocks of 8 rays sharing nearly-identical bands (patch sampling)
    base = _coherent_grids(rng, V, R // 8, S)
    jitter = rng.normal(0, 0.01, (V, 1, R // 8, 8, 1, 2)).astype(np.float32)
    grids = jnp.clip(jnp.asarray(
        np.repeat(np.asarray(base), 8, axis=2).reshape(V, 1, R // 8, 8, S, 2)
        + jitter), -1, 1).reshape(V, 1, R, S, 2)
    pairs = tuple(pair_index_lists(V))
    gcot = jnp.asarray(rng.normal(0, 1, (1, R, S, G)).astype(np.float32))
    ut = max(bucket_ut(int(block_union_size(grids[v, 0], H, W, kt=48)))
             for v in range(V))

    def loss_direct(vf_packed):
        out = _reference_cosine(vf_packed, grids, C, G, pairs)
        return jnp.vdot(out, gcot)

    def loss_block(vf):
        out = block_banded_cosine_scale_trainable(vf, grids, 48, ut, G,
                                                  pairs, 8)
        return jnp.vdot(out, gcot)

    v_d, g_d = jax.value_and_grad(loss_direct)(packed)
    v_b, g_b = jax.value_and_grad(loss_block)(unpacked)
    np.testing.assert_allclose(float(v_b), float(v_d), rtol=1e-5)
    # fold the packed-table gradient back onto the unpacked table: pack_2x2
    # is shift+concat, so its transpose is 4 shifted adds
    gp = np.asarray(g_d)[0]                                        # [V,H,W,4Cc]
    acc = np.zeros((V, H, W, Cc), np.float32)
    acc += gp[..., :Cc]
    acc[:, :, 1:] += gp[:, :, :-1, Cc:2 * Cc]
    acc[:, :, -1] += gp[:, :, -1, Cc:2 * Cc]
    acc[:, 1:] += gp[:, :-1, :, 2 * Cc:3 * Cc]
    acc[:, -1] += gp[:, -1, :, 2 * Cc:3 * Cc]
    acc[:, 1:, 1:] += gp[:, :-1, :-1, 3 * Cc:]
    acc[:, 1:, -1] += gp[:, :-1, -1, 3 * Cc:]
    acc[:, -1, 1:] += gp[:, -1, :-1, 3 * Cc:]
    acc[:, -1, -1] += gp[:, -1, -1, 3 * Cc:]
    np.testing.assert_allclose(np.asarray(g_b)[0], acc, atol=1e-4, rtol=1e-3)


@pytest.mark.slow
def test_block_train_grads_through_render_rays():
    """End-to-end training gradients (encoder+decoder params) through
    render_rays with the trainable block kernel (patch-aligned rays) vs the
    direct packed path."""
    import __graft_entry__ as ge
    from matchnerf_tpu.models.matchnerf import (encode, init_matchnerf,
                                                prepare_sampling_tables,
                                                render_rays)

    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=32)
    B, H, W, R = 1, 48, 48, 16
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    d = ge._synthetic_inputs(cfg, B, H, W, R)
    ref = jnp.asarray(d["images"][:, :3])
    # patch-aligned rays: two 8-pixel strips
    from matchnerf_tpu import camera
    grid = np.asarray(camera.pixel_grid(H, W, legacy=cfg.nerf.legacy_coord))
    idx = np.concatenate([np.arange(8) + 1104, np.arange(8) + 1616])
    pix = jnp.asarray(grid[idx][None])
    tgt = jnp.asarray(d["images"][:, 3].reshape(1, H * W, 3)[:, idx])

    kwargs = dict(
        pix_xy=pix,
        tgt_intr=jnp.asarray(d["intr"][:, -1]),
        tgt_c2w=jnp.asarray(d["tgt_c2w"]),
        tgt_near_far=jnp.asarray(d["near_fars"][:, -1]),
        ref_w2c=jnp.asarray(d["poses"][:, :-1, :3, :]),
        ref_intr=jnp.asarray(d["intr"][:, :-1]),
        ref_near_far=jnp.asarray(d["near_fars"][:, :-1]),
        img_h=H, img_w=W)

    def loss(p, impl, kt, ut, unpacked):
        feats = encode(p, cfg, ref)
        tables = prepare_sampling_tables(cfg, feats, ref,
                                         keep_unpacked=unpacked)
        out = render_rays(p, cfg, ref_images=ref, pair_feats=feats,
                          tables=tables, banded_kt=kt, banded_impl=impl,
                          block_ut=ut, **kwargs)
        return jnp.mean((out["rgb"] - tgt) ** 2)

    v_d, g_d = jax.value_and_grad(loss)(params, "xla", None, None, False)
    v_b, g_b = jax.value_and_grad(loss)(params, "block", (16, 16), (96, 96),
                                        True)
    np.testing.assert_allclose(float(v_b), float(v_d), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_d),
                    jax.tree_util.tree_leaves(g_b)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-6, rtol=2e-3)


def test_engine_patch_training_engages_block_buckets(tmp_path):
    """Coach.train_model with nerf.train_ray_patches + precision.block_kernel
    measures per-pose (kt, ut) buckets on device and compiles a block-kernel
    train step."""
    import __graft_entry__ as ge
    from matchnerf_tpu.data.loader import DataLoader
    from matchnerf_tpu.engine import Coach
    from matchnerf_tpu.utils import DotDict

    from test_engine import tiny_cfg

    gcfg = ge._tiny_cfg(n_layers=1, sample_intvs=32)
    H = W = 32

    class GeSceneDataset:
        """Look-at geometry (the synthetic pose rig the kernel e2e tests
        use) served through the training sample contract."""
        max_len = -1

        def get_name(self):
            return "synthetic"

        def __len__(self):
            return 2

        def __getitem__(self, i):
            d = ge._synthetic_inputs(gcfg, 1, H, W, R=8)
            ext4 = np.repeat(np.eye(4, dtype=np.float32)[None], 4, 0)
            ext4[:, :3, :] = d["poses"][0]
            return {
                "images": d["images"][0],
                "extrinsics": ext4,
                "intrinsics": d["intr"][0],
                "near_fars": d["near_fars"][0],
                "view_ids": np.arange(4),
                "scene": f"scene{i}",
                "img_wh": np.array([W, H]),
            }

    cfg = tiny_cfg(tmp_path)
    cfg.max_epoch = 1
    cfg.nerf.sample_intvs = 32
    cfg.nerf.rand_rays_train = 64
    cfg.nerf.train_ray_patches = True
    cfg.data_train = DotDict(root_dir="", dataset_name="dtu", img_wh=[W, H],
                             num_workers=1, max_len=-1)
    cfg.parallel = DotDict(data_parallel=1)
    cfg.precision = DotDict({"banded_kernel": True, "block_kernel": True,
                             "cond_sample_dtype": "float32",
                             "train_packed_tables": True})
    coach = Coach(cfg)
    coach.train_loader = DataLoader(GeSceneDataset(), batch_size=1,
                                    shuffle=False, num_workers=1)
    coach.build_networks()
    coach.setup_optimizer()
    coach.train_model()
    keys = [k for k in coach._train_steps if k is not None]
    assert any(k[1] is not None for k in keys), \
        f"block buckets never engaged: {list(coach._train_steps)}"


def test_per_scale_dtype_list_mixed_int4():
    """cond_sample_dtype as a per-scale list ([int4, int8]): the int4 scale
    falls back to the per-ray path under block_kernel, the int8 scale rides
    the block kernel; whole-image render matches the direct path on the
    same quantized tables."""
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

    def run(kernels):
        c = DotDict(dict(cfg))
        c.precision = DotDict({"cond_sample_dtype": ["int4", "int8"],
                               "banded_kernel": kernels,
                               "block_kernel": kernels,
                               "decoder_kernel": False})
        r = Renderer(c)
        feats = r.encode(params, ref_images)
        tables = r.build_tables(ref_images, feats)
        if kernels:
            assert tables["view_feats"][0].dtype == jnp.uint8       # int4
            assert tables["view_feats"][1].dtype == jnp.int8
            assert tables["view_feats_unpacked"][0] is None
            assert tables["view_feats_unpacked"][1] is not None
        return r.render_by_slices(params, poses, ref_images, feats, H, W,
                                  tables=tables)

    out_direct = run(False)
    out_kern = run(True)
    np.testing.assert_allclose(out_kern["rgb"], out_direct["rgb"],
                               rtol=1e-3, atol=2e-4)


def test_block_banded_ragged_and_border():
    """R not divisible by block_rays; grids pushed to the border-clamp
    region (taps at the image edge carry zero weight)."""
    rng = np.random.default_rng(3)
    V, H, W, C = 3, 16, 16, 8
    R, S, G = 11, 16, 2
    Cc = (V - 1) * C
    feat = rng.normal(0, 1, (V, H, W, Cc)).astype(np.float32)
    unpacked = jnp.asarray(feat)[None]
    packed = jax.vmap(lambda f: pack_2x2(f[None])[0])(jnp.asarray(feat))[None]
    grids = np.array(_coherent_grids(rng, V, R, S))
    grids[:, :, :3] = np.clip(grids[:, :, :3] * 3.0, -1.0, 1.0)  # hit borders
    grids = jnp.asarray(grids)
    pairs = pair_index_lists(V)

    gpad = jnp.pad(grids, ((0, 0), (0, 0), (0, 5), (0, 0), (0, 0)),
                   mode="edge")
    ut = max(bucket_ut(int(block_union_size(gpad[v, 0], H, W, kt=32)))
             for v in range(V))
    ref = _reference_cosine(packed, grids, C, G, pairs)
    out = block_banded_cosine_scale(unpacked, grids, kt=32, ut=ut,
                                    n_groups=G, pairs=pairs)
    assert out.shape == (1, R, S, G)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_batched_eval_rides_block_kernel():
    """B=2 eval splits into per-pose block-kernel sub-renders (renderer.py
    `_index_batch` split): each element matches an independent B=1 pipeline
    bit-for-bit, and the block path actually engages (VERDICT r3 item 5;
    reference batched eval: models/matchnerf.py:145-161)."""
    import __graft_entry__ as ge
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    from matchnerf_tpu.renderer import Renderer, _index_batch, extract_poses
    from matchnerf_tpu.utils import DotDict

    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=48)
    cfg = DotDict(dict(cfg))
    cfg.precision = DotDict({"cond_sample_dtype": "float32",
                             "banded_kernel": True, "block_kernel": True})
    H, W = 32, 32
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    d = ge._synthetic_inputs(cfg, 2, H, W, R=16)
    poses = extract_poses({"extrinsics": d["poses"], "intrinsics": d["intr"],
                           "near_fars": d["near_fars"]})
    ref_images = jnp.asarray(d["images"][:, :3])

    r = Renderer(cfg)
    feats = r.encode(params, ref_images)
    tables = r.build_tables(ref_images, feats)
    out_b2 = r.render_by_slices(params, poses, ref_images, feats, H, W,
                                tables=tables)
    assert out_b2["rgb"].shape[0] == 2
    engaged = [k for k in r._render_jit
               if k[0] == "multi" and k[6] is not None]
    assert engaged, "batched eval did not engage the block kernel"

    for b in range(2):
        r1 = Renderer(cfg)
        f1 = r1.encode(params, ref_images[b:b + 1])
        t1 = r1.build_tables(ref_images[b:b + 1], f1)
        out1 = r1.render_by_slices(params, _index_batch(poses, b),
                                   ref_images[b:b + 1], f1, H, W, tables=t1)
        np.testing.assert_allclose(out_b2["rgb"][b], out1["rgb"][0],
                                   atol=1e-6, rtol=1e-6)
