"""Two-branch feature upsampler (functional JAX, NHWC).

Matches the reference `UpSampler` (models/gmflow/superres.py:5-38): a left
branch of nearest-x2 upsample + 3x3 conv + LeakyReLU(0.2) feeding residual
corrections into a right branch of bilinear-x2 upsamples. log2(upsample_factor)
blocks; NOT covered by the pretrained GMFlow weights (misc/utils.py:178), so
it always trains from scratch.
"""
from __future__ import annotations

import math

import jax

from ...ops.nn import conv2d, init_conv2d, leaky_relu
from ...ops.resize import upsample_bilinear_x2, upsample_nearest_x2


def init_upsampler(key, n_feat: int = 128, upsample_factor: int = 2):
    n_blocks = int(math.log2(upsample_factor))
    ks = jax.random.split(key, 2 * n_blocks + 1)
    return {
        "conv_ls": [init_conv2d(ks[i], 3, n_feat, n_feat, bias=True)
                    for i in range(n_blocks)],
        "conv_l2rs": [init_conv2d(ks[n_blocks + i], 3, n_feat, n_feat, bias=True)
                      for i in range(n_blocks + 1)],
    }


def apply_upsampler(p, x):
    """x: [B,H,W,C] -> [B, H*2^n, W*2^n, C]."""
    right_x = conv2d(p["conv_l2rs"][0], x, stride=1, padding=1)
    left_x = x
    for idx in range(len(p["conv_ls"])):
        left_x = leaky_relu(conv2d(p["conv_ls"][idx], upsample_nearest_x2(left_x),
                                   stride=1, padding=1), 0.2)
        mid_x = conv2d(p["conv_l2rs"][idx + 1], left_x, stride=1, padding=1)
        right_x = upsample_bilinear_x2(right_x) + mid_x
    return right_x
