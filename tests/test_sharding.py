"""Multi-device sharding tests on the 8-device virtual CPU mesh — the same
path the driver's dryrun_multichip exercises."""
import sys

import numpy as np
import jax
import pytest


def test_eight_cpu_devices():
    assert len(jax.devices()) == 8, jax.devices()


@pytest.mark.slow
def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(jax.block_until_ready(out))
    assert out.shape == (1, 1024, 3)
    assert np.isfinite(out).all()


def test_dp_matches_single_device():
    """A dp-sharded train step must produce the same loss as unsharded."""
    sys.path.insert(0, "/root/repo")
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as ge
    from matchnerf_tpu.parallel import make_mesh
    from matchnerf_tpu.train_step import build_optimizer, make_train_step

    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=4)
    B, H, W = 4, 16, 16
    params = ge.init_params_for_test(cfg) if hasattr(ge, "init_params_for_test") else None
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    tx, _ = build_optimizer(cfg, total_steps=100)
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx, H, W, n_rays=16)

    d = ge._synthetic_inputs(cfg, B, H, W, R=16)
    batch = {"images": d["images"], "extrinsics": d["poses"], "intrinsics": d["intr"],
             "near_fars": d["near_fars"], "tgt_c2w": d["tgt_c2w"]}
    rng = jax.random.PRNGKey(1)
    _, _, loss_single = step(params, opt_state, batch, rng)

    mesh = make_mesh(n_devices=4)
    repl, dp = NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))
    params_r = jax.device_put(params, repl)
    opt_r = jax.device_put(opt_state, repl)
    batch_dp = {k: jax.device_put(jax.numpy.asarray(v), dp) for k, v in batch.items()}
    _, _, loss_dp = step(params_r, opt_r, batch_dp, rng)

    np.testing.assert_allclose(float(loss_dp["all"]), float(loss_single["all"]),
                               rtol=2e-5)


def test_ray_sharded_train_step_matches_single_device():
    """batch_size=1 (flagship train.yaml recipe): sharding the RAY axis over
    the mesh must reproduce the unsharded loss."""
    sys.path.insert(0, "/root/repo")
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as ge
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    from matchnerf_tpu.parallel import make_mesh
    from matchnerf_tpu.train_step import build_optimizer, make_train_step

    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=4)
    B, H, W, n_rays = 1, 16, 16, 32
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    tx, _ = build_optimizer(cfg, total_steps=100)
    opt_state = tx.init(params)

    d = ge._synthetic_inputs(cfg, B, H, W, R=16)
    batch = {"images": d["images"], "extrinsics": d["poses"], "intrinsics": d["intr"],
             "near_fars": d["near_fars"], "tgt_c2w": d["tgt_c2w"]}
    rng = jax.random.PRNGKey(1)

    step = make_train_step(cfg, tx, H, W, n_rays=n_rays)
    p_single, _, loss_single = step(params, opt_state, batch, rng)

    mesh = make_mesh(n_devices=8)
    repl = NamedSharding(mesh, P())
    params_r = jax.device_put(params, repl)
    opt_r = jax.device_put(opt_state, repl)
    batch_r = {k: jax.device_put(jax.numpy.asarray(v), repl) for k, v in batch.items()}
    step_rays = make_train_step(cfg, tx, H, W, n_rays=n_rays, mesh=mesh,
                                shard_rays=True)
    p_rays, _, loss_rays = step_rays(params_r, opt_r, batch_r, rng)

    np.testing.assert_allclose(float(loss_rays["all"]), float(loss_single["all"]),
                               rtol=2e-5)
    # updated params must agree too (grad psum correctness, not just loss)
    flat_s = jax.tree_util.tree_leaves(p_single)
    flat_r = jax.tree_util.tree_leaves(p_rays)
    for a, b in zip(flat_s, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-6)


def test_sharded_renderer_matches_single_device():
    """Production render_by_slices with a ray-sharding mesh must reproduce
    the unsharded pixels."""
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    from matchnerf_tpu.parallel import make_mesh, replicate
    from matchnerf_tpu.renderer import Renderer, extract_poses

    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=4)
    H, W = 16, 32
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    d = ge._synthetic_inputs(cfg, 1, H, W, R=16)
    poses = extract_poses({"extrinsics": d["poses"], "intrinsics": d["intr"],
                           "near_fars": d["near_fars"]})
    ref_images = jax.numpy.asarray(d["images"][:, : cfg.n_src_views])

    def run(mesh):
        r = Renderer(cfg, mesh=mesh)
        p = params if mesh is None else jax.device_put(params, replicate(mesh))
        imgs = ref_images if mesh is None else jax.device_put(ref_images,
                                                              replicate(mesh))
        feats = r.encode(p, imgs)
        tables = r.build_tables(imgs, feats)
        return r.render_by_slices(p, poses, imgs, feats, H, W, tables=tables)

    out_single = run(None)
    out_mesh = run(make_mesh(n_devices=8))
    np.testing.assert_allclose(out_mesh["rgb"], out_single["rgb"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out_mesh["depth"], out_single["depth"],
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_sharded_renderer_lane_major_kernel_stack():
    """The full production kernel stack (int8/uint8 tables, block + color +
    decoder kernels) with precision.lanemajor_cond must render identically
    under an 8-device ray-sharding mesh (per-shard kernels, interpret mode)
    and on a single device — safety gate before flipping the default."""
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    from matchnerf_tpu.parallel import make_mesh, replicate
    from matchnerf_tpu.renderer import Renderer, extract_poses
    from matchnerf_tpu.utils import DotDict

    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=8)
    cfg = DotDict(dict(cfg))
    cfg.precision = DotDict({"cond_sample_dtype": "int8",
                             "color_sample_dtype": "uint8",
                             "banded_kernel": True, "block_kernel": True,
                             "decoder_kernel": True,
                             "color_block_kernel": True,
                             "lanemajor_cond": True})
    H, W = 16, 32
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    d = ge._synthetic_inputs(cfg, 1, H, W, R=16)
    poses = extract_poses({"extrinsics": d["poses"], "intrinsics": d["intr"],
                           "near_fars": d["near_fars"]})
    ref_images = jax.numpy.asarray(d["images"][:, : cfg.n_src_views])

    def run(mesh):
        r = Renderer(cfg, mesh=mesh)
        p = params if mesh is None else jax.device_put(params, replicate(mesh))
        imgs = ref_images if mesh is None else jax.device_put(ref_images,
                                                              replicate(mesh))
        feats = r.encode(p, imgs)
        tables = r.build_tables(imgs, feats)
        assert tables.get("colors_sc") is not None
        return r.render_by_slices(p, poses, imgs, feats, H, W, tables=tables)

    out_single = run(None)
    out_mesh = run(make_mesh(n_devices=8))
    np.testing.assert_allclose(out_mesh["rgb"], out_single["rgb"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out_mesh["opacity"], out_single["opacity"],
                               rtol=1e-5, atol=1e-5)


def test_eval_encoder_stream_sharding_within_budget():
    """parallel.shard_encoder_streams_eval (default ON in configs/base.yaml)
    distributes the encoder's view/pair streams over the mesh at eval. GSPMD
    reassociation costs bit-equality, so this guards the quantified budget:
    the sharded-encoder render must agree with the single-device render to
    >= 60 dB PSNR (measured 2026-08-19: 106 dB, max |d| 7e-5 — a ~1e-4 dB
    perturbation of a 27 dB eval metric, vs the 0.05 dB flip budget).
    precision.strict must force the sharding back off (bit-equal)."""
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    from matchnerf_tpu.parallel import make_mesh, replicate
    from matchnerf_tpu.renderer import Renderer, extract_poses
    from matchnerf_tpu.utils import DotDict

    base = ge._tiny_cfg(n_layers=2, sample_intvs=8)
    H, W = 16, 32
    params = init_matchnerf(jax.random.PRNGKey(0), base)
    d = ge._synthetic_inputs(base, 1, H, W, R=16)
    poses = extract_poses({"extrinsics": d["poses"], "intrinsics": d["intr"],
                           "near_fars": d["near_fars"]})
    ref_images = jax.numpy.asarray(d["images"][:, : base.n_src_views])

    def run(mesh, shard_enc, strict=False):
        cfg = DotDict(dict(base))
        cfg.parallel = DotDict({"shard_encoder_streams_eval": shard_enc})
        if strict:
            cfg.precision = DotDict({"strict": True})
        r = Renderer(cfg, mesh=mesh)
        p = params if mesh is None else jax.device_put(params, replicate(mesh))
        imgs = ref_images if mesh is None else jax.device_put(
            ref_images, replicate(mesh))
        feats = r.encode(p, imgs)
        tables = r.build_tables(imgs, feats)
        return np.asarray(
            r.render_by_slices(p, poses, imgs, feats, H, W,
                               tables=tables)["rgb"])

    single = run(None, False)
    mesh = make_mesh(n_devices=8)
    sharded = run(mesh, True)
    mse = float(np.mean((sharded - single) ** 2))
    psnr = np.inf if mse == 0 else -10 * np.log10(mse)
    assert psnr >= 60.0, f"sharded-encoder eval agreement {psnr:.1f} dB"

    # strict preset wins over the config knob: bit-equal again
    strict_mesh = run(mesh, True, strict=True)
    strict_single = run(None, False, strict=True)
    np.testing.assert_array_equal(strict_mesh, strict_single)
