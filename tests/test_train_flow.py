"""Full training-lifecycle flow: train_model epochs, periodic checkpoints,
validation/test hooks, and mid-training resume."""
import os

import numpy as np
import pytest

from test_engine import SyntheticDataset, tiny_cfg

from matchnerf_tpu.utils import DotDict


def _coach_with_data(tmp_path, **cfg_over):
    from matchnerf_tpu.data.loader import DataLoader
    from matchnerf_tpu.engine import Coach

    cfg = tiny_cfg(tmp_path, **cfg_over)
    cfg.max_epoch = 2
    cfg.sanity_check = True
    cfg.save_test_image = False
    cfg.data_train = DotDict(root_dir="", dataset_name="dtu", img_wh=[16, 16],
                             num_workers=1, max_len=-1)
    cfg.freq = DotDict(scalar=1, log_ep=1, ckpt_ep=1, ckpt_it=-1, val_ep=1,
                       val_it=-1, test_ep=1, test_ep_start=0, test_it=-1)
    coach = Coach(cfg)
    coach.train_loader = DataLoader(SyntheticDataset(n=2, H=16, W=16), batch_size=1,
                                    shuffle=True, num_workers=1)
    coach.val_loader = DataLoader(SyntheticDataset(n=1, H=16, W=16), batch_size=1)
    coach.test_loaders = [DataLoader(SyntheticDataset(n=1, H=16, W=16), batch_size=1)]
    return coach


def test_train_model_full_flow(tmp_path):
    coach = _coach_with_data(tmp_path)
    coach.build_networks()
    coach.setup_optimizer()
    coach.restore_checkpoint_if_needed()
    coach.setup_visualizer()
    coach.train_model()

    # 2 epochs x 2 iters
    assert coach.it == 4
    # per-epoch checkpoints + backups exist
    mdir = os.path.join(coach.cfg.output_path, "models")
    assert os.path.exists(os.path.join(mdir, "latest.ckpt"))
    assert os.path.exists(os.path.join(mdir, "ep1_it2.ckpt"))
    assert os.path.exists(os.path.join(mdir, "ep2_it4.ckpt"))
    # validation images + test results written
    assert os.listdir(os.path.join(coach.cfg.output_path, "validation"))
    assert os.path.exists(os.path.join(coach.cfg.output_path, "test",
                                       "0results_synthetic.txt"))
    # scalars logged
    assert os.path.exists(coach.scalars_path)


def test_resume_from_checkpoint(tmp_path):
    coach = _coach_with_data(tmp_path)
    coach.cfg.sanity_check = False
    coach.cfg.freq.val_ep = -1
    coach.cfg.freq.test_ep = -1
    coach.build_networks()
    coach.setup_optimizer()
    coach.train_model()
    assert coach.it == 4

    # resume: should fast-forward past completed iterations
    coach2 = _coach_with_data(tmp_path)
    coach2.cfg.sanity_check = False
    coach2.cfg.freq.val_ep = -1
    coach2.cfg.freq.test_ep = -1
    coach2.cfg.resume = True
    coach2.build_networks()
    coach2.setup_optimizer()
    coach2.restore_checkpoint_if_needed()
    assert coach2.epoch_start == 2 and coach2.iter_start == 4
    p_a = np.asarray(coach.params["nerf_dec"]["pts_bias"]["w"])
    p_b = np.asarray(coach2.params["nerf_dec"]["pts_bias"]["w"])
    np.testing.assert_array_equal(p_a, p_b)


def test_topk_ray_sampler_is_valid_subset():
    """nerf.train_ray_sampler=topk: same distribution family as randperm
    (order by iid uniform keys) — unique in-range indices, deterministic
    per seed, and the train step runs."""
    import jax
    import numpy as np

    import __graft_entry__ as ge
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    from matchnerf_tpu.train_step import build_optimizer, make_train_step
    from matchnerf_tpu.utils import DotDict

    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=4)
    cfg = DotDict(dict(cfg))
    cfg.nerf = DotDict(dict(cfg.nerf))
    cfg.nerf.train_ray_sampler = "topk"
    B, H, W = 1, 16, 16
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    tx, _ = build_optimizer(cfg, total_steps=10)
    opt_state = tx.init(params)
    d = ge._synthetic_inputs(cfg, B, H, W, R=16)
    batch = {"images": d["images"], "extrinsics": d["poses"],
             "intrinsics": d["intr"], "near_fars": d["near_fars"],
             "tgt_c2w": d["tgt_c2w"]}
    step = make_train_step(cfg, tx, H, W, n_rays=32)
    _, _, l1 = step(params, opt_state, batch, jax.random.PRNGKey(1))
    _, _, l1b = step(params, opt_state, batch, jax.random.PRNGKey(1))
    _, _, l2 = step(params, opt_state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(l1["all"]))
    assert float(l1["all"]) == float(l1b["all"])      # deterministic
    assert float(l1["all"]) != float(l2["all"])       # rng-sensitive

    # the sampled subset itself: unique and in range
    keys = jax.random.uniform(jax.random.PRNGKey(3), (H * W,))
    _, idx = jax.lax.top_k(keys, 32)
    idx = np.asarray(idx)
    assert len(np.unique(idx)) == 32 and idx.min() >= 0 and idx.max() < H * W


def test_train_step_nchw_matches_nhwc():
    """The shipped train.yaml default (encoder.conv_data_format: NCHW)
    composes through the full jitted train step and reproduces the NHWC
    loss (pure relayout; reductions reassociate -> tolerance)."""
    import jax
    import numpy as np

    import __graft_entry__ as ge
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    from matchnerf_tpu.train_step import build_optimizer, make_train_step
    from matchnerf_tpu.utils import DotDict

    B, H, W = 1, 16, 16
    losses = {}
    for fmt in ("NHWC", "NCHW"):
        cfg = ge._tiny_cfg(n_layers=1, sample_intvs=4)
        cfg = DotDict(dict(cfg))
        cfg.encoder = DotDict(dict(cfg.encoder))
        cfg.encoder.conv_data_format = fmt
        params = init_matchnerf(jax.random.PRNGKey(0), cfg)
        tx, _ = build_optimizer(cfg, total_steps=10)
        opt_state = tx.init(params)
        d = ge._synthetic_inputs(cfg, B, H, W, R=16)
        batch = {"images": d["images"], "extrinsics": d["poses"],
                 "intrinsics": d["intr"], "near_fars": d["near_fars"],
                 "tgt_c2w": d["tgt_c2w"]}
        step = make_train_step(cfg, tx, H, W, n_rays=32)
        _, _, loss = step(params, opt_state, batch, jax.random.PRNGKey(1))
        losses[fmt] = float(loss["all"])
    np.testing.assert_allclose(losses["NCHW"], losses["NHWC"], rtol=1e-4)
