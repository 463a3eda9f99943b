"""End-to-end CLI smoke tests: `python test.py --yaml=...` on the printer demo
scene with a tiny random-init model, run as a real subprocess on CPU."""
import json
import os
import subprocess
import sys

import pytest

DEMO_ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "demo_data")
REPO = "/root/repo"


def _cli_env():
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)            # drop the axon sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    env["MATCHNERF_YES"] = "1"
    return env


@pytest.mark.skipif(not os.path.isdir(DEMO_ROOT), reason="demo data missing")
def test_test_cli_on_printer(tmp_path):
    cfg = f"""
_parent_: {REPO}/configs/base.yaml
name: cli_smoke
load:
output_root: {tmp_path}/outputs
encoder:
    num_transformer_layers: 1
    pretrain_weight:
nerf:
    sample_intvs: 8
    rand_rays_test: 512
data_test:
    colmap:
        root_dir: {DEMO_ROOT}
        dataset_name: colmap
        img_wh: [64, 32]
        num_workers: 1
        max_len: 1
        scene_list: [printer]
        test_views_method: nearest
        nf_mode: minmax
        render_path_mode: interpolate
"""
    cfg_path = tmp_path / "smoke.yaml"
    cfg_path.write_text(cfg)

    proc = subprocess.run(
        [sys.executable, "test.py", f"--yaml={cfg_path}"],
        cwd=REPO, env=_cli_env(), capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]

    outdir = tmp_path / "outputs" / "cli_smoke"
    assert (outdir / "options.yaml").exists()
    results = outdir / "test" / "0results_colmap.txt"
    assert results.exists(), list(outdir.rglob("*"))
    txt = results.read_text()
    assert "PSNR" in txt and "COLMAP" in txt
    # rendered side-by-side image saved
    assert any(f.suffix == ".png" for f in (outdir / "test" / "colmap").iterdir())
