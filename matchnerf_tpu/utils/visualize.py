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


def write_video(out_path: str, frames: List[np.ndarray], pts_rate: float = 2.0) -> str:
    """Write an mp4 (misc/utils.py:316-320). Prefers imageio/ffmpeg (x264),
    then cv2's bundled mp4v codec (no system ffmpeg needed), then a GIF as
    the last resort. Returns the path actually written."""
    fps = max(1.0, 24.0 / pts_rate)
    try:
        import imageio
        with imageio.get_writer(out_path, fps=fps, codec="libx264",
                                pixelformat="yuv420p", quality=8) as w:
            for frame in frames:
                w.append_data(frame)
        return out_path
    except Exception as e:
        log.info(f"imageio/ffmpeg writer unavailable ({type(e).__name__}); "
                 "trying cv2 mp4v")
    try:
        import cv2
        h, w_px = frames[0].shape[:2]
        vw = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w_px, h))
        if not vw.isOpened():
            raise RuntimeError("cv2.VideoWriter failed to open mp4v stream")
        for frame in frames:
            vw.write(cv2.cvtColor(np.ascontiguousarray(frame), cv2.COLOR_RGB2BGR))
        vw.release()
        return out_path
    except Exception as e:
        base = os.path.splitext(out_path)[0]
        log.warn(f"no mp4 writer available ({type(e).__name__}); "
                 f"writing {base}.gif instead")
        import imageio
        imageio.mimsave(f"{base}.gif", frames, fps=min(fps, 24), loop=0)
        return f"{base}.gif"
