"""Image/video output helpers (visualize_depth, save_image, write_video).

Counterparts of misc/utils.py:316-343. Depth colormap uses cv2 COLORMAP_JET;
video writing prefers imageio's ffmpeg backend and degrades to per-frame
PNGs when no ffmpeg is available (zero-egress containers).
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from .logging import log


def visualize_depth(depth: np.ndarray, minmax: Optional[List[float]] = None) -> np.ndarray:
    """depth [H,W] -> JET colormap uint8 [H,W,3] (misc/utils.py:323-342)."""
    import cv2
    x = np.nan_to_num(np.asarray(depth))
    if minmax is None:
        positive = x[x > 0]
        mi = np.min(positive) if positive.size else 0.0
        ma = np.max(x)
    else:
        mi, ma = minmax
    x = (x - mi) / (ma - mi + 1e-8)
    x = (255 * np.clip(x, 0, 1)).astype(np.uint8)
    im = cv2.applyColorMap(x, cv2.COLORMAP_JET)
    return cv2.cvtColor(im, cv2.COLOR_BGR2RGB)


def save_image(path: str, img: np.ndarray):
    import imageio
    imageio.imwrite(path, img)


def write_video(out_path: str, frames: List[np.ndarray], pts_rate: float = 2.0):
    """Write an mp4 (misc/utils.py:316-320). Falls back to frame dumps when
    no ffmpeg backend exists."""
    fps = max(1.0, 24.0 / pts_rate)
    try:
        import imageio
        with imageio.get_writer(out_path, fps=fps, codec="libx264",
                                pixelformat="yuv420p", quality=8) as w:
            for frame in frames:
                w.append_data(frame)
        return
    except Exception as e:
        base = os.path.splitext(out_path)[0]
        log.warn(f"ffmpeg video writer unavailable ({type(e).__name__}); "
                 f"writing {base}.gif instead")
        import imageio
        imageio.mimsave(f"{base}.gif", frames, fps=min(fps, 24), loop=0)
