"""Engine smoke tests: train step descends, checkpoint round-trip, renderer
forward, metrics aggregation — all on tiny synthetic scenes (CPU)."""
import os

import numpy as np
import pytest

import jax

from torch_oracle import reference_opts, tpu_cfg_from_opts
from test_render_e2e import synthetic_batch

from matchnerf_tpu.utils import DotDict


def tiny_cfg(tmp_path, **over):
    opts = reference_opts()
    cfg = tpu_cfg_from_opts(opts)
    cfg.encoder.num_transformer_layers = 2
    cfg.encoder.pretrain_weight = None
    cfg.nerf.sample_intvs = 8
    cfg.nerf.rand_rays_train = 64
    cfg.nerf.rand_rays_val = 256
    cfg.nerf.rand_rays_test = 256
    cfg.batch_size = 1
    cfg.max_epoch = 1
    cfg.seed = 0
    cfg.load = None
    cfg.resume = False
    cfg.vis_depth = False
    cfg.tb = False
    cfg.output_path = str(tmp_path)
    cfg.loss_weight = DotDict(render=1)
    cfg.optim = DotDict(lr_enc=5e-5, lr_dec=5e-4, clip_enc=1.0,
                        algo=DotDict(type="AdamW", weight_decay=1e-4),
                        sched=DotDict(type="OneCycleLR", pct_start=0.05))
    cfg.freq = DotDict(scalar=1, log_ep=1, ckpt_ep=1, ckpt_it=-1, val_ep=-1,
                       val_it=-1, test_ep=-1, test_ep_start=0, test_it=-1)
    for k, v in over.items():
        cfg[k] = v
    return cfg


class SyntheticDataset:
    """In-memory dataset of random posed scenes matching the sample contract."""

    def __init__(self, n=4, H=32, W=32, split="train", with_depth=False):
        self.n, self.H, self.W = n, H, W
        self.split = split
        self.with_depth = with_depth
        self.max_len = -1

    def get_name(self):
        return "synthetic"

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        b = synthetic_batch(rng, B=1, V=3, H=self.H, W=self.W)
        ext4 = np.repeat(np.eye(4, dtype=np.float32)[None], 4, 0)
        ext4[:, :3, :] = b["extrinsics"][0]
        sample = {
            "images": b["images"][0].transpose(0, 2, 3, 1),
            "extrinsics": ext4,
            "intrinsics": b["intrinsics"][0],
            "near_fars": b["near_fars"][0],
            "view_ids": np.arange(4),
            "scene": f"scene{i}",
            "img_wh": np.array([self.W, self.H]),
        }
        if self.with_depth:
            sample["depth"] = rng.uniform(1, 3, (self.H, self.W)).astype(np.float32)
        return sample


def test_train_step_descends(tmp_path):
    from matchnerf_tpu.data.loader import DataLoader
    from matchnerf_tpu.engine import Coach

    cfg = tiny_cfg(tmp_path)
    cfg.max_epoch = 5  # keep the OneCycle schedule inside its horizon (20 steps)
    cfg.data_train = DotDict(root_dir="", dataset_name="dtu", img_wh=[32, 32],
                             num_workers=1, max_len=-1)
    coach = Coach(cfg)
    coach.train_loader = DataLoader(SyntheticDataset(n=4), batch_size=1, shuffle=True,
                                    num_workers=1)
    coach.build_networks()
    coach.setup_optimizer()

    coach.timer = {"start": 0.0, "it_mean": None}
    coach.it, coach.ep = 0, 0
    coach.val_it = coach.test_it = coach.ckpt_it = -1
    from matchnerf_tpu.train_step import make_train_step
    coach._train_step = make_train_step(cfg, coach.tx, 32, 32, 64)
    coach._rng = jax.random.PRNGKey(0)

    losses = []
    batches = list(coach.train_loader)
    for _ in range(6):
        for b in batches[:2]:
            loss = coach.train_iteration(b)
            losses.append(float(loss["all"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), \
        f"loss did not descend: {losses}"
    # scalars were logged
    assert os.path.exists(coach.scalars_path)

    # host-sync gating: summarize_loss (host float() + NaN asserts, which
    # blocks on the step result) must run only on freq.scalar boundaries by
    # default, every step with sync_loss_every_step
    import matchnerf_tpu.engine as engine_mod
    calls = []
    orig = engine_mod.summarize_loss
    engine_mod.summarize_loss = lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
    try:
        coach.cfg.freq.scalar = 2
        l1 = coach.train_iteration(batches[0])    # it odd -> gated, no sync
        assert not calls and np.isfinite(float(l1["all"]))
        coach.train_iteration(batches[0])         # it even -> summarized
        assert len(calls) == 1
        coach.cfg.sync_loss_every_step = True
        coach.train_iteration(batches[0])         # forced reference behavior
        assert len(calls) == 2
    finally:
        engine_mod.summarize_loss = orig


def test_checkpoint_roundtrip(tmp_path):
    from matchnerf_tpu.engine import Coach
    from matchnerf_tpu.data.loader import DataLoader
    from matchnerf_tpu.utils.checkpoint import restore_checkpoint

    cfg = tiny_cfg(tmp_path)
    coach = Coach(cfg)
    coach.train_loader = DataLoader(SyntheticDataset(n=2), batch_size=1)
    coach.build_networks()
    coach.setup_optimizer()
    coach.save_checkpoint_now(ep=3, it=42, backup_ckpt=True)

    ckpt_path = os.path.join(cfg.output_path, "models", "latest.ckpt")
    assert os.path.exists(ckpt_path)
    assert os.path.exists(os.path.join(cfg.output_path, "models", "ep3_it42.ckpt"))

    # perturb then restore
    orig_leaf = np.asarray(coach.params["nerf_dec"]["pts_bias"]["w"]).copy()
    coach.params["nerf_dec"]["pts_bias"]["w"] = coach.params["nerf_dec"]["pts_bias"]["w"] * 0
    params2, opt2, ep, it = restore_checkpoint(coach.params, ckpt_path, resume=True,
                                               optim_state=coach.opt_state)
    assert ep == 3 and it == 42
    np.testing.assert_array_equal(np.asarray(params2["nerf_dec"]["pts_bias"]["w"]),
                                  orig_leaf)
    assert opt2 is not None


def test_renderer_full_image_and_video(tmp_path):
    from matchnerf_tpu.data.loader import collate
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    from matchnerf_tpu.renderer import Renderer

    cfg = tiny_cfg(tmp_path)
    cfg.nerf.video_n_frames = 3
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    r = Renderer(cfg)
    batch = collate([SyntheticDataset(H=16, W=16)[0]])

    out = r.forward(params, batch, mode="test")
    assert out["rgb"].shape == (1, 256, 3)
    assert out["depth"].shape == (1, 256, 1)
    assert np.isfinite(np.asarray(out["rgb"])).all()

    vid = r.forward(params, batch, mode="test", render_video=True,
                    render_path_mode="interpolate")
    assert vid["rgb"].shape == (3, 256, 3)


def test_validate_and_test_model(tmp_path):
    from matchnerf_tpu.data.loader import DataLoader
    from matchnerf_tpu.engine import Coach

    cfg = tiny_cfg(tmp_path)
    cfg.data_test = DotDict(synthetic=DotDict(dataset_name="synthetic"))
    coach = Coach(cfg)
    coach.val_loader = DataLoader(SyntheticDataset(n=1, H=16, W=16, with_depth=False),
                                  batch_size=1)
    coach.test_loaders = [DataLoader(SyntheticDataset(n=1, H=16, W=16), batch_size=1)]
    coach.build_networks()
    coach.validate_model(iteration=0)
    sums = coach.test_model(ep=1, save_images=True)
    assert "synthetic" in sums
    assert np.isfinite(sums["synthetic"]["PSNR"]).all()
    # results file written
    assert os.path.exists(os.path.join(cfg.output_path, "test",
                                       "0results_synthetic.txt"))


def test_metrics_ssim_matches_skimage_formula():
    from matchnerf_tpu.metrics import ssim

    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    v = ssim(a, b)
    assert 0.5 < v < 1.0
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-6)


def test_summarize_metrics_aggregation(tmp_path):
    from collections import OrderedDict

    from matchnerf_tpu.metrics import summarize_metrics

    metrics = {"dtu": OrderedDict([
        ("scan1_001", {"PSNR": 20.0, "SSIM": 0.8}),
        ("scan1_002", {"PSNR": 22.0, "SSIM": 0.9}),
        ("scan2_001", {"PSNR": 30.0, "SSIM": 0.7}),
    ])}
    out = summarize_metrics(metrics, str(tmp_path))
    assert np.isclose(np.mean(out["dtu"]["PSNR"]), 24.0)
    assert os.path.exists(tmp_path / "0results_dtu.txt")
