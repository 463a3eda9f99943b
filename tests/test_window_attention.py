"""Fused exact-softmax window attention (pallas_window_attention) vs XLA.

Forward + gradient parity against `ops.attention.split_window_attention`
(interpret mode on CPU), the fallback gate, and the transformer-level wiring
of the "fused" backend.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matchnerf_tpu.ops import attention as attn_ops
from matchnerf_tpu.ops.pallas_window_attention import fused_window_attention


def _qkv(rng, B, H, W, C, dtype=np.float32):
    q = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(dtype))
    k = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(dtype))
    v = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(dtype))
    return q, k, v


def _mask(H, W):
    return attn_ops.generate_shift_window_attn_mask(H, W, H // 2, W // 2,
                                                    H // 4, W // 4)


@pytest.mark.parametrize("with_shift", [False, True])
@pytest.mark.parametrize("hw", [(32, 16), (32, 32)])  # L=128 (NQ=1), L=256 (NQ=2)
def test_fused_window_matches_xla(with_shift, hw):
    rng = np.random.default_rng(0)
    B, C = 2, 128
    H, W = hw
    q, k, v = _qkv(rng, B, H, W, C)
    mask = _mask(H, W)
    ref = attn_ops.split_window_attention(q, k, v, num_splits=2,
                                          with_shift=with_shift,
                                          attn_mask=mask)
    out = fused_window_attention(q, k, v, num_splits=2, with_shift=with_shift,
                                 attn_mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("with_shift", [False, True])
def test_fused_window_grad_parity(with_shift):
    rng = np.random.default_rng(1)
    B, H, W, C = 1, 32, 32, 128        # L=256 -> BQ=128, NQ=2 (accumulation)
    q, k, v = _qkv(rng, B, H, W, C)
    mask = _mask(H, W)
    cot = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))

    def loss(fn):
        def f(q, k, v):
            out = fn(q, k, v, num_splits=2, with_shift=with_shift,
                     attn_mask=mask)
            return jnp.sum(out * cot)
        return f

    g_ref = jax.grad(loss(attn_ops.split_window_attention),
                     argnums=(0, 1, 2))(q, k, v)
    fused = lambda *a, **kw: fused_window_attention(*a, interpret=True, **kw)
    g_out = jax.grad(loss(fused), argnums=(0, 1, 2))(q, k, v)
    for go, gr, name in zip(g_out, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(go), np.asarray(gr),
                                   atol=3e-5, rtol=2e-4, err_msg=f"d{name}")


def test_fused_window_fallback_gate():
    # 8x8 windows (L=64, not lane-aligned) must route through the XLA path
    rng = np.random.default_rng(2)
    B, H, W, C = 2, 16, 16, 128
    q, k, v = _qkv(rng, B, H, W, C)
    mask = _mask(H, W)
    ref = attn_ops.split_window_attention(q, k, v, num_splits=2,
                                          with_shift=True, attn_mask=mask)
    out = fused_window_attention(q, k, v, num_splits=2, with_shift=True,
                                 attn_mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_fused_backend_transformer_parity():
    """apply_feature_transformer(backend='fused') == backend='xla'."""
    from matchnerf_tpu.models.gmflow.transformer import (
        apply_feature_transformer, init_feature_transformer)
    rng = np.random.default_rng(3)
    # lane-aligned window: splits=2 over 32x16 -> 16x8 = 128 tokens
    B, H, W, C = 1, 32, 16, 128
    p = init_feature_transformer(jax.random.PRNGKey(0), num_layers=2,
                                 d_model=C)
    f0 = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    f1 = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    a0, a1 = apply_feature_transformer(p, f0, f1, attn_num_splits=2,
                                       backend="xla")
    b0, b1 = apply_feature_transformer(p, f0, f1, attn_num_splits=2,
                                       backend="fused")
    np.testing.assert_allclose(np.asarray(b0), np.asarray(a0), atol=3e-5)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(a1), atol=3e-5)


def test_fused_window_bf16_runs():
    rng = np.random.default_rng(4)
    B, H, W, C = 1, 32, 16, 128
    q, k, v = _qkv(rng, B, H, W, C)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    mask = _mask(H, W)
    ref = attn_ops.split_window_attention(q, k, v, num_splits=2,
                                          with_shift=True, attn_mask=mask)
    out = fused_window_attention(q, k, v, num_splits=2, with_shift=True,
                                 attn_mask=mask, interpret=True)
    assert out.dtype == ref.dtype
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)
