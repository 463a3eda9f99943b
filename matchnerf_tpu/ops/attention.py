"""Swin-style split-window attention (single-head) in pure XLA.

The reference's encoder bounds attention cost by splitting the H*W token map
into K^2 windows attended independently, with alternating half-window shifts
and an additive mask for the shifted layers
(models/gmflow/transformer.py:8-105, models/gmflow/utils.py:7-54).

This implementation keeps features in [B,H,W,C] (NHWC) and expresses the
window split as reshape/transpose so XLA lowers everything to batched MXU
matmuls; `jnp.roll` handles the cyclic shift. Shapes are static under jit.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def split_feature(x, num_splits: int):
    """[B,H,W,C] -> [B*K*K, H/K, W/K, C], row-major over (row-block, col-block)."""
    b, h, w, c = x.shape
    assert h % num_splits == 0 and w % num_splits == 0
    hs, ws = h // num_splits, w // num_splits
    x = x.reshape(b, num_splits, hs, num_splits, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * num_splits * num_splits, hs, ws, c)


def merge_splits(x, num_splits: int):
    """Inverse of `split_feature`."""
    bkk, hs, ws, c = x.shape
    b = bkk // (num_splits * num_splits)
    x = x.reshape(b, num_splits, num_splits, hs, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, num_splits * hs, num_splits * ws, c)


def window_region_ids(h: int, w: int, window_size_h: int, window_size_w: int,
                      shift_size_h: int, shift_size_w: int) -> np.ndarray:
    """Per-token region ids [K*K, win] for the shifted-window mask.

    Tokens in different regions of the same (rolled) window must not attend
    to each other (transformer.py:19-43). Pure numpy — static shapes."""
    img_mask = np.zeros((h, w), np.float32)
    h_slices = (slice(0, -window_size_h), slice(-window_size_h, -shift_size_h),
                slice(-shift_size_h, None))
    w_slices = (slice(0, -window_size_w), slice(-window_size_w, -shift_size_w),
                slice(-shift_size_w, None))
    cnt = 0
    for hs in h_slices:
        for ws in w_slices:
            img_mask[hs, ws] = cnt
            cnt += 1

    num_splits = w // window_size_w
    m = img_mask.reshape(1, num_splits, window_size_h, num_splits, window_size_w, 1)
    m = m.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size_h * window_size_w)
    return m


def generate_shift_window_attn_mask(h: int, w: int, window_size_h: int, window_size_w: int,
                                    shift_size_h: int, shift_size_w: int) -> jnp.ndarray:
    """Additive [K*K, win, win] mask for shifted windows (transformer.py:19-43).

    Pure-numpy (static shapes) so it constant-folds; -100 blocks cross-region
    attention exactly as the swin reference does."""
    m = window_region_ids(h, w, window_size_h, window_size_w,
                          shift_size_h, shift_size_w)
    attn_mask = m[:, None, :] - m[:, :, None]
    attn_mask = np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)
    return jnp.asarray(attn_mask)


def full_attention(q, k, v):
    """Single-head softmax attention over full token maps.

    q,k,v: [B,L,C] -> [B,L,C] (transformer.py:8-16)."""
    c = q.shape[-1]
    # scores/softmax always f32 (bf16 compute policy keeps qk^T stable)
    scores = jnp.einsum("blc,bmc->blm", q, k,
                        preferred_element_type=jnp.float32) / jnp.sqrt(jnp.float32(c))
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("blm,bmc->blc", attn, v)


def split_window_attention(q, k, v, num_splits: int, with_shift: bool, attn_mask=None):
    """Window attention over [B,H,W,C] maps (transformer.py:46-105).

    Rolls by half a window when `with_shift`, splits into K^2 windows, runs
    dense attention per window (+ additive mask for shifted layers), merges
    and rolls back. Returns [B,H,W,C]."""
    b, h, w, c = q.shape
    ws_h, ws_w = h // num_splits, w // num_splits
    b_new = b * num_splits * num_splits

    if with_shift:
        assert attn_mask is not None
        sh, sw = ws_h // 2, ws_w // 2
        q = jnp.roll(q, shift=(-sh, -sw), axis=(1, 2))
        k = jnp.roll(k, shift=(-sh, -sw), axis=(1, 2))
        v = jnp.roll(v, shift=(-sh, -sw), axis=(1, 2))

    q = split_feature(q, num_splits).reshape(b_new, -1, c)
    k = split_feature(k, num_splits).reshape(b_new, -1, c)
    v = split_feature(v, num_splits).reshape(b_new, -1, c)

    scores = jnp.einsum("blc,bmc->blm", q, k,
                        preferred_element_type=jnp.float32) / jnp.sqrt(jnp.float32(c))
    if with_shift:
        scores = scores + jnp.tile(attn_mask, (b, 1, 1))
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("blm,bmc->blc", attn, v)

    out = merge_splits(out.reshape(b_new, ws_h, ws_w, c), num_splits)
    if with_shift:
        out = jnp.roll(out, shift=(sh, sw), axis=(1, 2))
    return out
