"""Batched rendering, frozen-encoder finetune mode, optimizer group behavior."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_engine import SyntheticDataset, tiny_cfg

from matchnerf_tpu.utils import DotDict


def test_batch2_render_matches_two_singles(tmp_path):
    """B=2 rendering must equal two independent B=1 renders (the reference
    had a nondeterministic NaN bug for batch>1, matchnerf.py:106-108 — we
    assert our path is simply correct)."""
    from matchnerf_tpu.data.loader import collate
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    from matchnerf_tpu.renderer import Renderer

    cfg = tiny_cfg(tmp_path)
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    ds = SyntheticDataset(n=2, H=16, W=16)
    r = Renderer(cfg)

    b2 = collate([ds[0], ds[1]])
    out2 = r.forward(params, b2, mode="test")
    outs = [r.forward(params, collate([ds[i]]), mode="test") for i in (0, 1)]
    np.testing.assert_allclose(out2["rgb"][0], outs[0]["rgb"][0], atol=1e-5)
    np.testing.assert_allclose(out2["rgb"][1], outs[1]["rgb"][0], atol=1e-5)


def test_frozen_encoder_finetune_mode(tmp_path):
    """lr_enc<=0 freezes the encoder (per-scene finetuning, coach.py:92-96)."""
    from matchnerf_tpu.data.loader import collate
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    from matchnerf_tpu.train_step import build_optimizer, make_train_step
    from matchnerf_tpu import camera

    cfg = tiny_cfg(tmp_path)
    cfg.optim.lr_enc = 0.0
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    tx, scheds = build_optimizer(cfg, total_steps=100)
    assert scheds["enc"] is None
    opt = tx.init(params)
    step = make_train_step(cfg, tx, 16, 16, 32)

    batch = collate([SyntheticDataset(n=1, H=16, W=16)[0]])
    dev = {k: jnp.asarray(batch[k]) for k in
           ("images", "extrinsics", "intrinsics", "near_fars")}
    dev["tgt_c2w"] = jnp.asarray(camera.pose_inverse_legacy_np(
        np.asarray(batch["extrinsics"][:, -1, :3, :])))
    p1, _, loss = step(params, opt, dev, jax.random.PRNGKey(1))

    enc_before = jax.tree_util.tree_leaves(params["feat_enc"])
    enc_after = jax.tree_util.tree_leaves(p1["feat_enc"])
    for a, b in zip(enc_before, enc_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    dec_before = np.asarray(params["nerf_dec"]["pts_bias"]["w"])
    dec_after = np.asarray(p1["nerf_dec"]["pts_bias"]["w"])
    assert np.abs(dec_before - dec_after).max() > 0


def test_onecycle_schedule_shape():
    """Warmup to peak then cosine to ~peak/1e4 (torch OneCycleLR defaults)."""
    from matchnerf_tpu.train_step import make_schedule

    optim_cfg = DotDict(sched=DotDict(type="OneCycleLR", pct_start=0.1))
    sched = make_schedule(optim_cfg, peak_lr=1e-3, total_steps=1000)
    assert float(sched(0)) == pytest.approx(1e-3 / 25, rel=1e-3)
    assert float(sched(100)) == pytest.approx(1e-3, rel=1e-3)
    # torch floor: (peak/div_factor)/final_div_factor
    assert float(sched(1000)) == pytest.approx(1e-3 / 25 / 1e4, rel=1e-2)
    mid = float(sched(550))
    assert 1e-3 / 25 / 1e4 < mid < 1e-3


def test_render_by_slices_ragged_tail_grouping(tmp_path):
    """Slice grouping with a ragged tail must equal a single-slice render."""
    from matchnerf_tpu.data.loader import collate
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    from matchnerf_tpu.renderer import Renderer

    cfg = tiny_cfg(tmp_path)
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    batch = collate([SyntheticDataset(n=1, H=16, W=16)[0]])

    cfg.nerf.rand_rays_test = 96            # 256 px -> 3 slices, ragged tail
    cfg.nerf.slices_per_dispatch = 2        # 2 groups, second group padded
    r_a = Renderer(cfg)
    out_a = r_a.forward(params, batch, mode="test")

    cfg2 = tiny_cfg(tmp_path)
    cfg2.nerf.rand_rays_test = 256          # one exact slice
    r_b = Renderer(cfg2)
    out_b = r_b.forward(params, batch, mode="test")

    np.testing.assert_allclose(out_a["rgb"], out_b["rgb"], atol=1e-5)
    np.testing.assert_allclose(out_a["depth"], out_b["depth"], atol=1e-5)


def test_write_video_mp4_roundtrip(tmp_path):
    """write_video must produce a real, readable .mp4 in this container
    (reference misc/utils.py:316-320 uses skvideo/ffmpeg; our cv2 mp4v
    fallback needs no system ffmpeg). Round-trips via cv2.VideoCapture."""
    cv2 = pytest.importorskip("cv2")
    from matchnerf_tpu.utils.visualize import write_video

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
              for _ in range(4)]
    out = write_video(str(tmp_path / "vid.mp4"), frames, pts_rate=2.0)
    assert out.endswith(".mp4"), f"fell back to {out}"

    cap = cv2.VideoCapture(out)
    n = 0
    while True:
        ok, fr = cap.read()
        if not ok:
            break
        assert fr.shape == (64, 80, 3)
        n += 1
    cap.release()
    assert n == len(frames)
