"""Golden-image regression: the production eval stack must keep rendering
the committed goldens.

Three tiny synthetic scenes — one per reference eval aspect — rendered
through `Renderer.forward(mode="test")` with the full configs/test.yaml
precision stack on PRNG(0) weights (see tests/golden_common.py). The bar is
PSNR >= 45 dB against the committed PNG: u8 quantization alone caps the
comparison near 59 dB, cross-version XLA:CPU drift measures far above 45,
and any semantic change to a kernel lands far below it. Refresh procedure
(intentional numerics changes only): `python tools/make_goldens.py`, commit
the new PNGs + goldens.json with the cause in the message.

Stands in for the reference's golden-number practice against shipped
weights (/root/reference/README.md:134), which stays asset-blocked here.
"""
import hashlib
import json
import os

import pytest

from golden_common import (GOLDEN_DIR, PRESETS, load_golden, psnr_vs_golden,
                           render_preset)


@pytest.mark.parametrize("name,H,W,setbg", PRESETS,
                         ids=[p[0] for p in PRESETS])
def test_production_render_matches_golden(name, H, W, setbg):
    golden = load_golden(name)
    img, depth = render_preset(name, H, W, setbg)
    assert img.shape == golden.shape
    psnr = psnr_vs_golden(img, golden)
    print(f"{name}: production render vs golden {psnr:.1f} dB")
    assert psnr >= 45.0, (
        f"{name}: {psnr:.1f} dB vs committed golden — the production eval "
        "stack's output shifted; if intentional, refresh via "
        "tools/make_goldens.py and record why")
    assert float(depth.min()) > 0.0


def test_golden_manifest_matches_files():
    """goldens.json sha256 entries must match the committed PNG bytes —
    catches a stale manifest or a hand-edited golden."""
    with open(os.path.join(GOLDEN_DIR, "goldens.json")) as f:
        meta = json.load(f)
    assert set(meta) == {p[0] for p in PRESETS}
    for name, m in meta.items():
        with open(os.path.join(GOLDEN_DIR, f"{name}.png"), "rb") as f:
            assert hashlib.sha256(f.read()).hexdigest() == m["sha256"], name
