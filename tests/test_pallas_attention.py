"""Fused Pallas window attention vs the XLA reference path (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matchnerf_tpu.ops import attention as attn_ops
from matchnerf_tpu.ops.pallas_attention import flash_window_attention


@pytest.mark.parametrize("with_shift", [False, True])
def test_flash_window_matches_xla(with_shift):
    rng = np.random.default_rng(0)
    B, H, W, C = 2, 16, 16, 128          # windows of 8x8 = 64 tokens
    q = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    mask = attn_ops.generate_shift_window_attn_mask(H, W, H // 2, W // 2,
                                                    H // 4, W // 4)
    ref = attn_ops.split_window_attention(q, k, v, num_splits=2,
                                          with_shift=with_shift, attn_mask=mask)
    out = flash_window_attention(q, k, v, num_splits=2, with_shift=with_shift,
                                 attn_mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_window_grads_flow():
    # window length >=256 tokens: the backward kernel needs MXU-tileable blocks
    rng = np.random.default_rng(1)
    B, H, W, C = 1, 32, 32, 128
    q = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))

    def f(q):
        return flash_window_attention(q, q, q, num_splits=2, with_shift=False).sum()

    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():   # must cover bwd tracing too
        g = jax.grad(f)(q)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_flash_tiny_window_falls_back_to_xla():
    """Sub-lane windows (L<128) must route to the XLA path instead of the
    stock flash kernel (which breaks on degenerate shapes — device-seen
    TypeError at L=6, 2026-08-20)."""
    import numpy as np

    from matchnerf_tpu.ops import attention as attn_ops
    from matchnerf_tpu.ops.pallas_attention import flash_window_attention

    rng = np.random.default_rng(0)
    B, H, W, C = 2, 4, 6, 128                  # splits=2 -> window 2x3, L=6
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
               for _ in range(3))
    mask = attn_ops.generate_shift_window_attn_mask(H, W, H // 2, W // 2,
                                                    H // 4, W // 4)
    ref = attn_ops.split_window_attention(q, k, v, num_splits=2,
                                          with_shift=True, attn_mask=mask)
    out = flash_window_attention(q, k, v, num_splits=2, with_shift=True,
                                 attn_mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6,
                               atol=1e-6)
