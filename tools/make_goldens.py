"""Refresh the golden-image regression artifacts (tests/goldens/*.png).

Run ONLY when an intentional numerics change shifts the production render
(document the cause in the commit message):

    python tools/make_goldens.py            # writes PNGs + goldens.json

Renders on the virtual-CPU backend exactly as the test does, prints the PSNR
of the new render against any existing golden so the size of the shift is on
record, and refreshes tests/goldens/goldens.json (sha256 + metadata).
"""
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

from golden_common import (GOLDEN_DIR, PRESETS, load_golden,  # noqa: E402
                           psnr_vs_golden, render_preset, save_golden)


def main():
    meta = {}
    for name, H, W, setbg in PRESETS:
        img, _ = render_preset(name, H, W, setbg)
        try:
            prev = load_golden(name)
            print(f"{name}: new render vs previous golden "
                  f"{psnr_vs_golden(img, prev):.1f} dB")
        except FileNotFoundError:
            print(f"{name}: no previous golden")
        path = save_golden(name, img)
        with open(path, "rb") as f:
            sha = hashlib.sha256(f.read()).hexdigest()
        meta[name] = {"H": H, "W": W, "setbg": setbg, "sha256": sha,
                      "jax": jax.__version__}
        print(f"wrote {path} sha256={sha[:16]}…")
    with open(os.path.join(GOLDEN_DIR, "goldens.json"), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
