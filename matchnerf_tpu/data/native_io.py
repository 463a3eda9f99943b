"""ctypes bindings for the native C++ host-IO kernels (native/io_kernels.cpp).

Auto-builds `native/libmatchnerf_io.so` with the in-image g++ on first use
and degrades gracefully to the numpy implementations when no compiler is
available. The loaders call these through `read_pfm_native` /
`resize_bilinear_native` when `is_available()`.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmatchnerf_io.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.isfile(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.isfile(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.pfm_dims.argtypes = [ctypes.c_char_p] + [ctypes.POINTER(ctypes.c_int)] * 4
    lib.pfm_dims.restype = ctypes.c_int
    lib.read_pfm.argtypes = [ctypes.c_char_p,
                             np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")]
    lib.read_pfm.restype = ctypes.c_int
    lib.resize_bilinear_f32.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.resize_nearest_f32.argtypes = lib.resize_bilinear_f32.argtypes[:-1]
    lib.u8_to_f32.argtypes = [
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_long,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")]
    lib.normalize_imagenet.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"), ctypes.c_long]
    _lib = lib
    return _lib


def is_available() -> bool:
    return _load() is not None


def read_pfm_native(path: str) -> Tuple[np.ndarray, float]:
    lib = _load()
    assert lib is not None
    h, w, c, little = (ctypes.c_int() for _ in range(4))
    rc = lib.pfm_dims(path.encode(), ctypes.byref(h), ctypes.byref(w),
                      ctypes.byref(c), ctypes.byref(little))
    if rc != 0:
        raise IOError(f"pfm_dims failed ({rc}) for {path}")
    shape = (h.value, w.value, 3) if c.value == 3 else (h.value, w.value)
    out = np.empty((h.value, w.value * c.value), np.float32)
    rc = lib.read_pfm(path.encode(), out)
    if rc != 0:
        raise IOError(f"read_pfm failed ({rc}) for {path}")
    return out.reshape(shape), 1.0


def resize_bilinear_native(img: np.ndarray, dh: int, dw: int,
                           align_corners: bool = False) -> np.ndarray:
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    sh, sw, c = img.shape
    out = np.empty((dh, dw, c), np.float32)
    lib.resize_bilinear_f32(img, sh, sw, c, out, dh, dw, int(align_corners))
    return out


def resize_nearest_native(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.float32)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    sh, sw, c = img.shape
    out = np.empty((dh, dw, c), np.float32)
    lib.resize_nearest_f32(img, sh, sw, c, out, dh, dw)
    return out[..., 0] if squeeze else out


def u8_to_f32_native(img: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty(img.shape, np.float32)
    lib.u8_to_f32(img, img.size, out.reshape(-1))
    return out


def normalize_imagenet_native(img: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.float32)
    assert img.shape[-1] == 3
    lib.normalize_imagenet(img.reshape(-1), img.size // 3)
    return img
