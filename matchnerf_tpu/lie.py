"""SO(3)/SE(3) Lie-algebra exp/log maps and quaternion ops (pure JAX).

Functional counterpart of the reference's `Lie` and `Quaternion` classes
(misc/camera.py:62-196). Unused by the MatchNeRF runtime path in the
reference (BARF heritage) but part of the geometry library surface; kept for
pose-refinement extensions. Taylor-series forms keep everything smooth and
jit/grad-safe near theta=0.
"""
from __future__ import annotations

import jax.numpy as jnp


def skew_symmetric(w):
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    O = jnp.zeros_like(w0)
    return jnp.stack([
        jnp.stack([O, -w2, w1], axis=-1),
        jnp.stack([w2, O, -w0], axis=-1),
        jnp.stack([-w1, w0, O], axis=-1),
    ], axis=-2)


def _taylor_A(x, nth=10):
    # sin(x)/x
    ans = jnp.zeros_like(x)
    denom = 1.0
    for i in range(nth + 1):
        if i > 0:
            denom *= (2 * i) * (2 * i + 1)
        ans = ans + (-1) ** i * x ** (2 * i) / denom
    return ans


def _taylor_B(x, nth=10):
    # (1-cos(x))/x^2
    ans = jnp.zeros_like(x)
    denom = 1.0
    for i in range(nth + 1):
        denom *= (2 * i + 1) * (2 * i + 2)
        ans = ans + (-1) ** i * x ** (2 * i) / denom
    return ans


def _taylor_C(x, nth=10):
    # (x-sin(x))/x^3
    ans = jnp.zeros_like(x)
    denom = 1.0
    for i in range(nth + 1):
        denom *= (2 * i + 2) * (2 * i + 3)
        ans = ans + (-1) ** i * x ** (2 * i) / denom
    return ans


def so3_to_SO3(w):
    wx = skew_symmetric(w)
    theta = jnp.linalg.norm(w, axis=-1)[..., None, None]
    I = jnp.eye(3, dtype=w.dtype)
    return I + _taylor_A(theta) * wx + _taylor_B(theta) * (wx @ wx)


def SO3_to_so3(R, eps=1e-7):
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    theta = jnp.arccos(jnp.clip((trace - 1) / 2, -1 + eps, 1 - eps))[..., None, None] % jnp.pi
    lnR = 1 / (2 * _taylor_A(theta) + 1e-8) * (R - jnp.swapaxes(R, -2, -1))
    return jnp.stack([lnR[..., 2, 1], lnR[..., 0, 2], lnR[..., 1, 0]], axis=-1)


def se3_to_SE3(wu):
    w, u = wu[..., :3], wu[..., 3:]
    wx = skew_symmetric(w)
    theta = jnp.linalg.norm(w, axis=-1)[..., None, None]
    I = jnp.eye(3, dtype=wu.dtype)
    R = I + _taylor_A(theta) * wx + _taylor_B(theta) * (wx @ wx)
    V = I + _taylor_B(theta) * wx + _taylor_C(theta) * (wx @ wx)
    return jnp.concatenate([R, V @ u[..., None]], axis=-1)


def SE3_to_se3(Rt, eps=1e-8):
    R, t = Rt[..., :3], Rt[..., 3:]
    w = SO3_to_so3(R)
    wx = skew_symmetric(w)
    theta = jnp.linalg.norm(w, axis=-1)[..., None, None]
    I = jnp.eye(3, dtype=Rt.dtype)
    A, B = _taylor_A(theta), _taylor_B(theta)
    invV = I - 0.5 * wx + (1 - A / (2 * B)) / (theta ** 2 + eps) * (wx @ wx)
    u = (invV @ t)[..., 0]
    return jnp.concatenate([w, u], axis=-1)


# quaternions -----------------------------------------------------------------


def q_to_R(q):
    qa, qb, qc, qd = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (qc ** 2 + qd ** 2), 2 * (qb * qc - qa * qd), 2 * (qa * qc + qb * qd)], axis=-1),
        jnp.stack([2 * (qb * qc + qa * qd), 1 - 2 * (qb ** 2 + qd ** 2), 2 * (qc * qd - qa * qb)], axis=-1),
        jnp.stack([2 * (qb * qd - qa * qc), 2 * (qa * qb + qc * qd), 1 - 2 * (qb ** 2 + qc ** 2)], axis=-1),
    ], axis=-2)


def R_to_q(R, eps=1e-8):
    t = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    r = jnp.sqrt(1 + t + eps)
    qa = 0.5 * r
    qb = jnp.sign(R[..., 2, 1] - R[..., 1, 2]) * 0.5 * jnp.sqrt(1 + R[..., 0, 0] - R[..., 1, 1] - R[..., 2, 2] + eps)
    qc = jnp.sign(R[..., 0, 2] - R[..., 2, 0]) * 0.5 * jnp.sqrt(1 - R[..., 0, 0] + R[..., 1, 1] - R[..., 2, 2] + eps)
    qd = jnp.sign(R[..., 1, 0] - R[..., 0, 1]) * 0.5 * jnp.sqrt(1 - R[..., 0, 0] - R[..., 1, 1] + R[..., 2, 2] + eps)
    return jnp.stack([qa, qb, qc, qd], axis=-1)


def q_invert(q):
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    conj = jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)
    return conj / norm ** 2


def q_product(q1, q2):
    a1, b1, c1, d1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    a2, b2, c2, d2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack([
        a1 * a2 - b1 * b2 - c1 * c2 - d1 * d2,
        a1 * b2 + b1 * a2 + c1 * d2 - d1 * c2,
        a1 * c2 - b1 * d2 + c1 * a2 + d1 * b2,
        a1 * d2 + b1 * c2 - c1 * b2 + d1 * a2,
    ], axis=-1)
