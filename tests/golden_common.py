"""Shared golden-image rendering: the production eval stack on tiny synthetic
scenes at each reference eval aspect.

Used by tests/test_golden_images.py (the regression guard) and
tools/make_goldens.py (the refresh tool). The render is the REAL production
path — `Renderer.forward(mode="test")` with configs/test.yaml's precision
stack (bf16 encoder, int8/uint8 tables, block + color + decoder megakernels,
lane-major cond) — on deterministic PRNG(0)-initialized weights, so any
change to kernel semantics shifts the image and trips the PSNR bar. Real
pretrained assets stay unavailable in-container (BASELINE.md), which makes
this the standing guard that kernel work cannot silently rot parity.

Counterpart practice in the reference: golden-number eval against shipped
weights (/root/reference/README.md:134).
"""
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(REPO, "tests", "goldens")

# (name, H, W, setbg_opaque) — one per reference eval aspect
# (configs/test.yaml data_test block), shrunk to fast-loop size; H and W
# must be multiples of 16 (1/8-scale features + attn split 2)
PRESETS = [
    ("dtu", 48, 64, False),
    ("llff", 48, 96, False),
    ("blender", 48, 48, True),
]


def golden_cfg():
    from matchnerf_tpu.config import load_options

    cfg = load_options(os.path.join(REPO, "configs", "test.yaml"))
    cfg.nerf.rand_rays_test = 1024          # tiny images -> small slices
    cfg.load = None                          # PRNG(0) weights, no .pth
    return cfg


def render_preset(name, H, W, setbg):
    """Returns (rgb uint8 [H,W,3], depth float32 [H,W])."""
    import jax
    import jax.numpy as jnp

    from matchnerf_tpu.data.synth import make_scene_views
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    from matchnerf_tpu.renderer import Renderer

    cfg = golden_cfg()
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    v = make_scene_views(W, H)
    batch = {
        "images": jnp.asarray(v["images"][None]),            # [1,4,H,W,3]
        "extrinsics": jnp.asarray(v["w2cs"][None]),
        "intrinsics": jnp.asarray(v["intrinsics"][None]),
        "near_fars": jnp.asarray(v["near_fars"][None]),
    }
    r = Renderer(cfg, setbg_opaque=setbg)
    out = r.forward(params, batch, mode="test")
    rgb = np.asarray(out["rgb"][0], np.float32).reshape(H, W, 3)
    depth = np.asarray(out["depth"][0], np.float32).reshape(H, W)
    return np.round(np.clip(rgb, 0.0, 1.0) * 255.0).astype(np.uint8), depth


def psnr_vs_golden(img_u8, golden_u8):
    a = img_u8.astype(np.float64) / 255.0
    b = golden_u8.astype(np.float64) / 255.0
    mse = float(np.mean((a - b) ** 2))
    return -10.0 * np.log10(max(mse, 1e-20))


def load_golden(name):
    import cv2

    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    bgr = cv2.imread(path, cv2.IMREAD_COLOR)
    if bgr is None:
        raise FileNotFoundError(path)
    return bgr[..., ::-1].copy()

def save_golden(name, img_u8):
    import cv2

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    assert cv2.imwrite(path, img_u8[..., ::-1]), path
    return path
