"""Minimal functional NN primitives over plain-dict parameter pytrees.

Parameters are nested dicts of jnp arrays; layouts are JAX/TPU-native:
linear weights are [in, out], conv kernels are HWIO, activations NHWC. The
torch-checkpoint importer (`matchnerf_tpu/import_torch.py`) transposes the
reference's [out,in] / OIHW tensors into these layouts.

Initializers mirror the reference's choices where training-from-scratch
parity matters: kaiming-normal fan_out/relu for backbone convs
(models/gmflow/backbone.py:83-90), xavier-uniform for transformer matrices
(models/gmflow/transformer.py:275-277), kaiming-normal fan_in for decoder
linears (models/rfdecoder/cond_nerf.py:102-106).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


# ----------------------------- apply functions -----------------------------


def linear(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def conv2d(p, x, stride=1, padding="SAME", dilation=1,
           data_format: str = "NHWC"):
    """x: [B,H,W,C_in] (or [B,C_in,H,W] with data_format='NCHW');
    p['w']: [kH,kW,C_in,C_out] either way (weights stay layout-invariant)."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=stride, padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=(data_format, "HWIO", data_format))
    if "b" in p:
        y = y + (p["b"] if data_format == "NHWC" else p["b"][:, None, None])
    return y


def relu(x):
    return jnp.maximum(x, 0.0)


def leaky_relu(x, negative_slope=0.2):
    return jnp.where(x >= 0, x, x * negative_slope)


def gelu(x):
    # torch.nn.GELU default = exact erf formulation
    return 0.5 * x * (1.0 + jax.lax.erf(x / jnp.sqrt(2.0).astype(x.dtype)))


def sigmoid(x):
    return jax.nn.sigmoid(x)


# ------------------------------ initializers -------------------------------


def kaiming_normal(key, shape, fan, gain=math.sqrt(2.0), dtype=jnp.float32):
    std = gain / math.sqrt(fan)
    return jax.random.normal(key, shape, dtype) * std


def xavier_uniform(key, shape, fan_in, fan_out, dtype=jnp.float32):
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def init_linear(key, d_in, d_out, bias=True, init="kaiming_fan_in"):
    kw, _ = jax.random.split(key)
    if init == "kaiming_fan_in":
        w = kaiming_normal(kw, (d_in, d_out), fan=d_in)
    elif init == "xavier":
        w = xavier_uniform(kw, (d_in, d_out), d_in, d_out)
    else:
        raise ValueError(init)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def init_conv2d(key, k, c_in, c_out, bias=True, init="kaiming_fan_out"):
    kw, _ = jax.random.split(key)
    if init == "kaiming_fan_out":
        fan = c_out * k * k
        w = kaiming_normal(kw, (k, k, c_in, c_out), fan=fan)
    elif init == "kaiming_fan_in":
        fan = c_in * k * k
        w = kaiming_normal(kw, (k, k, c_in, c_out), fan=fan)
    else:
        raise ValueError(init)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((c_out,), jnp.float32)
    return p


def init_layer_norm(dim):
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}
