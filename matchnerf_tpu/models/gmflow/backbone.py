"""GMFlow CNN backbone (functional JAX, NHWC).

Re-implements the 6-residual-block encoder of the reference
(models/gmflow/backbone.py:6-122): stride-2 7x7 stem -> three stages of two
residual blocks (64, 96, 128 channels) -> 1x1 projection, InstanceNorm
everywhere (affine-free). Default single-scale output at 1/8 resolution.

The optional multi-branch trident path (num_output_scales>1,
backbone.py:66-81 + trident_conv.py) is implemented as shared-weight strided
convs, matching `MultiScaleTridentConv` with num_branch parallel strides.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.nn import conv2d, init_conv2d, relu
from ...ops.norm import instance_norm_2d


def _init_block(key, c_in, c_out, stride):
    ks = jax.random.split(key, 3)
    p = {
        "conv1": init_conv2d(ks[0], 3, c_in, c_out, bias=False),
        "conv2": init_conv2d(ks[1], 3, c_out, c_out, bias=False),
    }
    if stride != 1 or c_in != c_out:
        p["downsample"] = init_conv2d(ks[2], 1, c_in, c_out, bias=True)
    return p


def _apply_block(p, x, stride, dilation=1, data_format="NHWC"):
    axes = (1, 2) if data_format == "NHWC" else (2, 3)
    y = relu(instance_norm_2d(conv2d(p["conv1"], x, stride=stride,
                                     padding=dilation, dilation=dilation,
                                     data_format=data_format), axes=axes))
    y = relu(instance_norm_2d(conv2d(p["conv2"], y, stride=1,
                                     padding=dilation, dilation=dilation,
                                     data_format=data_format), axes=axes))
    if "downsample" in p:
        x = instance_norm_2d(conv2d(p["downsample"], x, stride=stride,
                                    padding=0, data_format=data_format),
                             axes=axes)
    return relu(x + y)


def init_cnn_encoder(key, output_dim: int = 128, num_output_scales: int = 1):
    dims = [64, 96, 128]
    ks = jax.random.split(key, 10)
    stride3 = 2 if num_output_scales == 1 else 1
    p = {
        "conv1": init_conv2d(ks[0], 7, 3, dims[0], bias=False),
        "layer1": [_init_block(ks[1], dims[0], dims[0], 1),
                   _init_block(ks[2], dims[0], dims[0], 1)],
        "layer2": [_init_block(ks[3], dims[0], dims[1], 2),
                   _init_block(ks[4], dims[1], dims[1], 1)],
        "layer3": [_init_block(ks[5], dims[1], dims[2], stride3),
                   _init_block(ks[6], dims[2], dims[2], 1)],
        "conv2": init_conv2d(ks[7], 1, dims[2], output_dim, bias=True),
    }
    if num_output_scales > 1:
        p["trident_conv"] = init_conv2d(ks[8], 3, output_dim, output_dim, bias=False)
    return p


def apply_cnn_encoder(p, x, num_output_scales: int = 1,
                      data_format: str = "NHWC"):
    """x: [B,H,W,3] -> list of [B,h,w,C] feature maps, high-to-low resolution.

    Single-scale (default): one 1/8-res map. Multi-scale: trident branches at
    strides (1,2,...) of the 1/4-res trunk.

    data_format='NCHW' (encoder.conv_data_format knob) runs the trunk
    channels-second: at C=64/96 the NHWC elementwise/IN ops tile the 128
    vector lanes on the channel axis and waste half of them, while NCHW puts
    the wide W axis minor. Transposes happen only at entry/exit; weights and
    results are layout-invariant (same math, reductions reassociate)."""
    stride3 = 2 if num_output_scales == 1 else 1
    axes = (1, 2) if data_format == "NHWC" else (2, 3)
    if data_format == "NCHW":
        x = jnp.transpose(x, (0, 3, 1, 2))
    x = relu(instance_norm_2d(conv2d(p["conv1"], x, stride=2, padding=3,
                                     data_format=data_format), axes=axes))
    x = _apply_block(p["layer1"][0], x, 1, data_format=data_format)
    x = _apply_block(p["layer1"][1], x, 1, data_format=data_format)
    x = _apply_block(p["layer2"][0], x, 2, data_format=data_format)
    x = _apply_block(p["layer2"][1], x, 1, data_format=data_format)
    x = _apply_block(p["layer3"][0], x, stride3, data_format=data_format)
    x = _apply_block(p["layer3"][1], x, 1, data_format=data_format)
    x = conv2d(p["conv2"], x, stride=1, padding=0, data_format=data_format)

    def out(t):
        return jnp.transpose(t, (0, 2, 3, 1)) if data_format == "NCHW" else t

    if num_output_scales > 1:
        strides = {2: (1, 2), 3: (1, 2, 4), 4: (1, 2, 4, 8)}[num_output_scales]
        return [out(conv2d(p["trident_conv"], x, stride=s, padding=1,
                           data_format=data_format)) for s in strides]
    return [out(x)]
