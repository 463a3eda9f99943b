"""Generate the self-contained demo scene at docs/demo_data/printer.

An original synthetic 3-view LLFF-style scene (a printer-ish box on a desk,
rendered by the tiny numpy raytracer in `matchnerf_tpu.data.synth`) +
poses_bounds.npy in the format `data/common.py::load_llff_poses` expects, so
`--yaml=demo_own` and the own-data (COLMAP) tests run without any external
assets. The reference ships a captured photo scene for the same purpose
(/root/reference/configs/demo_own.yaml:28-37); ours is generated so the repo
carries no third-party imagery.

Regenerate with:  python tools/make_demo_scene.py  (deterministic)
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from matchnerf_tpu.data.synth import look_at_opencv, render_scene  # noqa: E402

W, H = 504, 378
FOCAL = 420.0


def main(out_root=None):
    out_root = out_root or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "demo_data", "printer")
    img_dir = os.path.join(out_root, "images")
    os.makedirs(img_dir, exist_ok=True)

    eyes = [[-1.3, -0.9, -3.6], [0.0, -1.05, -3.8], [1.3, -0.85, -3.55]]
    rows = []
    import cv2
    for vid, eye in enumerate(eyes):
        c2w = look_at_opencv(eye, [0.0, 0.1, 0.0])
        img, t_hit = render_scene(c2w, W, H, FOCAL)
        cv2.imwrite(os.path.join(img_dir, f"{vid}.jpeg"),
                    img[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, 92])
        # invert load_llff_poses: opencv cols [x,y,z|t] -> raw [y, x, -z | t]
        x, y, z, t = c2w[:, 0], c2w[:, 1], c2w[:, 2], c2w[:, 3]
        raw = np.stack([y, x, -z, t, [H, W, FOCAL]], axis=1)  # [3,5]
        # exclude horizon-distance ground hits from the far bound: the scene
        # content lives within ~3x the camera distance
        finite = t_hit[np.isfinite(t_hit) & (t_hit < 12.0)]
        near = max(np.percentile(finite, 0.5) * 0.9, 1e-2)
        far = np.percentile(finite, 99.5) * 1.1
        rows.append(np.concatenate([raw.reshape(-1), [near, far]]))
    np.save(os.path.join(out_root, "poses_bounds.npy"),
            np.stack(rows).astype(np.float64))
    print(f"wrote {out_root}: 3 views {W}x{H}, poses_bounds.npy")


if __name__ == "__main__":
    main()
