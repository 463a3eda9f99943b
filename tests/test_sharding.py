"""Multi-device sharding tests on the 8-device virtual CPU mesh — the same
path the driver's dryrun_multichip exercises."""
import sys

import numpy as np
import jax
import pytest


def test_eight_cpu_devices():
    assert len(jax.devices()) == 8, jax.devices()


def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


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
