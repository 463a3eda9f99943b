"""Fused (flash) window attention for the GMFlow encoder on TPU.

The XLA path (`ops.attention.split_window_attention`) materializes the
[windows, L, L] score matrix in HBM for every attention layer — with DTU
shapes that's ~150MB written+read per layer x 12 layers per encode. This
wrapper routes each window through the Pallas flash-attention kernel
(jax.experimental.pallas.ops.tpu.flash_attention: online softmax, scores
never leave VMEM, custom VJP so it also trains), preserving the reference's
swin shift/mask semantics (transformer.py:46-105) via the additive-bias input.

Numerics: identical math to the unfused path modulo the usual online-softmax
reassociation (~1e-6 drift).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from .attention import merge_splits, split_feature


@functools.lru_cache(maxsize=None)
def _block_sizes(L: int):
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    def pick(target):
        b = min(target, L)
        while L % b:
            b //= 2
        return max(b, 128) if L % max(b, 128) == 0 else b

    bq = pick(512)
    bk = pick(512)
    return BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )


def flash_window_attention(q, k, v, num_splits: int, with_shift: bool,
                           attn_mask=None, interpret: bool = False):
    """Drop-in replacement for `split_window_attention` ([B,H,W,C] -> same).

    attn_mask: [K*K, L, L] additive mask for shifted layers (tiled across the
    batch as the reference does, transformer.py:90)."""
    b, h, w, c = q.shape
    ws_h, ws_w = h // num_splits, w // num_splits
    L = ws_h * ws_w
    if L < 128 or c % 128:
        # below the flash kernel's minimum tile (the stock kernel asserts /
        # miscomputes on sub-lane windows — seen as a broadcast TypeError at
        # L=6 on device, 2026-08-20); tiny windows are XLA-cheap anyway
        from .attention import split_window_attention
        return split_window_attention(q, k, v, num_splits, with_shift,
                                      attn_mask)
    b_new = b * num_splits * num_splits

    if with_shift:
        assert attn_mask is not None
        sh, sw = ws_h // 2, ws_w // 2
        q = jnp.roll(q, shift=(-sh, -sw), axis=(1, 2))
        k = jnp.roll(k, shift=(-sh, -sw), axis=(1, 2))
        v = jnp.roll(v, shift=(-sh, -sw), axis=(1, 2))

    qs = split_feature(q, num_splits).reshape(b_new, 1, L, c)   # heads=1
    ks = split_feature(k, num_splits).reshape(b_new, 1, L, c)
    vs = split_feature(v, num_splits).reshape(b_new, 1, L, c)

    ab = None
    if with_shift:
        # the kernel adds ab BEFORE multiplying by sm_scale; the reference
        # adds the mask to already-scaled scores (transformer.py:86-90), so
        # pre-scale the mask by sqrt(c)
        ab = jnp.tile(attn_mask[:, None], (b, 1, 1, 1)) * math.sqrt(c)

    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    run = functools.partial(
        fa.flash_attention, causal=False, sm_scale=1.0 / math.sqrt(c),
        block_sizes=_block_sizes(L))
    if interpret:
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            out = run(qs, ks, vs, ab=ab)
    else:
        out = run(qs, ks, vs, ab=ab)

    out = merge_splits(out.reshape(b_new, ws_h, ws_w, c), num_splits)
    if with_shift:
        out = jnp.roll(out, shift=(sh, sw), axis=(1, 2))
    return out
