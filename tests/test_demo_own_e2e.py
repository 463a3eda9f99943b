"""End-to-end own-data (COLMAP) video flow on the in-repo printer demo scene:
dataset -> encode -> interpolated trajectory -> sliced rendering -> video
outputs — the demo_own.yaml user journey with a tiny random-weight model."""
import os

import numpy as np
import pytest

import jax

from test_engine import tiny_cfg

from matchnerf_tpu.utils import DotDict

DEMO_ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "demo_data")


@pytest.mark.skipif(not os.path.isdir(DEMO_ROOT), reason="demo data missing")
def test_demo_own_video_flow(tmp_path):
    from matchnerf_tpu.data import COLMAPDataset, DataLoader
    from matchnerf_tpu.engine import Coach

    cfg = tiny_cfg(tmp_path)
    cfg.nerf.render_video = True
    cfg.nerf.video_n_frames = 3
    cfg.nerf.save_gif = False
    cfg.nerf.save_frames = False
    cfg.nerf.rand_rays_test = 512
    cfg.data_test = DotDict(colmap=DotDict(
        root_dir=DEMO_ROOT, dataset_name="colmap", img_wh=[64, 32],
        num_workers=1, max_len=-1, scene_list=["printer"],
        test_views_method="fixed", render_path_mode="interpolate",
        nf_mode="minmax"))

    coach = Coach(cfg)
    ds = COLMAPDataset(root_dir=DEMO_ROOT, split="test", n_views=3,
                       img_wh=(64, 32), scene_list=["printer"],
                       test_views_method="fixed", nf_mode="minmax")
    coach.test_loaders = [DataLoader(ds, batch_size=1, num_workers=1)]
    coach.build_networks()
    coach.test_model_video()

    outdir = os.path.join(cfg.output_path, "test_videos", "colmap")
    files = os.listdir(outdir)
    # source contact sheet + a real mp4 (cv2's bundled codec needs no ffmpeg)
    assert any(f.endswith(".jpg") for f in files), files
    mp4s = [f for f in files if f.endswith(".mp4")]
    assert mp4s, f"expected an mp4 container, got {files}"
    import cv2
    cap = cv2.VideoCapture(os.path.join(outdir, mp4s[0]))
    ok, frame = cap.read()
    assert ok and frame is not None and frame.size, "mp4 not decodable"


@pytest.mark.skipif(not os.path.isdir(DEMO_ROOT), reason="demo data missing")
def test_spiral_video_path_llff_style(tmp_path):
    """Spiral trajectory generation + rendering through the renderer API."""
    from matchnerf_tpu.data import COLMAPDataset
    from matchnerf_tpu.data.loader import collate
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    from matchnerf_tpu.renderer import Renderer

    cfg = tiny_cfg(tmp_path)
    cfg.nerf.video_n_frames = 3
    cfg.nerf.rand_rays_test = 512
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    ds = COLMAPDataset(root_dir=DEMO_ROOT, split="test", n_views=3,
                       img_wh=(64, 32), scene_list=["printer"],
                       test_views_method="fixed", nf_mode="minmax")
    batch = collate([ds[0]])
    r = Renderer(cfg)
    out = r.forward(params, batch, mode="test", render_video=True,
                    render_path_mode="spiral")
    assert out["rgb"].shape == (3, 64 * 32, 3)
    assert np.isfinite(out["rgb"]).all()
