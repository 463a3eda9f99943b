"""Fused exact-softmax window attention with a VMEM-resident custom VJP.

The GMFlow encoder's swin window attention at training shapes (DTU 640x512:
24 windows of L=1280 tokens, C=128, single head) is small enough that a whole
window's score matrix fits in VMEM — no flash/online-softmax machinery is
needed. The XLA path (`ops.attention.split_window_attention`, reference
models/gmflow/transformer.py:46-105) round-trips the [win, L, L] scores and
attention through HBM in both passes (~19 ms/step of the measured train step,
2026-08-19 device trace); the stock Pallas flash kernel measured a wash
because its generic multi-pass backward re-pays the traffic.

This kernel:
- forward: per (window, query-chunk) grid step, computes scores, the shifted
  -window region mask (from [K^2, L] region ids — never materializes the
  [K^2, L, L] additive mask), the exact softmax, and attn @ V entirely in
  VMEM. The attention matrix is written out ONCE (in the compute dtype) as
  the backward residual.
- backward: re-reads the saved attention (no exp recompute, no QK^T
  recompute) and computes dV = A^T dO, dA = dO V^T, the softmax backward,
  dQ = dS K and dK = dS^T Q in VMEM, accumulating dK/dV across query chunks.

Numerics match the XLA path: f32 score accumulation and softmax, attention
cast to the value dtype before A@V, -100 additive mask semantics.

Shapes outside the gate (L or C not lane-aligned, oversized L) fall back to
the XLA path — e.g. LLFF/Blender eval windows; the encoder runs once per
scene there so only training shapes matter.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import merge_splits, split_feature, split_window_attention, \
    window_region_ids


def _supported(L: int, c: int, dtype) -> bool:
    return (L % 128 == 0 and c % 128 == 0 and L <= 4096
            and dtype in (jnp.float32, jnp.bfloat16))


@functools.lru_cache(maxsize=None)
def _make_core(L: int, C: int, BQ: int, K2: int, h: int, w: int,
               ws_h: int, ws_w: int, use_mask: bool, interpret: bool):
    """Build the custom-VJP attention core for one static window geometry.

    Returns fn(qs, ks, vs) over split windows [BW, L, C] -> [BW, L, C].
    Region ids are baked in as a tiny (K2, 1, L) constant.
    """
    NQ = L // BQ
    if use_mask:
        regions = window_region_ids(h, w, ws_h, ws_w, ws_h // 2, ws_w // 2)
        regions = np.asarray(regions, np.float32).reshape(K2, 1, L)
    else:
        regions = np.zeros((K2, 1, L), np.float32)
    sqrt_c = float(np.float32(np.sqrt(np.float32(C))))

    def fwd_kernel(q_ref, k_ref, v_ref, rq_ref, rk_ref, o_ref, a_ref):
        q = q_ref[0]                                        # (BQ, C)
        k = k_ref[0]                                        # (L, C)
        v = v_ref[0]                                        # (L, C)
        qT = jnp.swapaxes(q, 0, 1)                          # (C, BQ)
        kT = jnp.swapaxes(k, 0, 1)                          # (C, L)
        s = jax.lax.dot_general(qT, kT, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) / sqrt_c
        if use_mask:
            rq = jnp.swapaxes(rq_ref[0], 0, 1)              # (BQ, 1)
            rk = rk_ref[0]                                  # (1, L)
            s = jnp.where(rq != rk, s - 100.0, s)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        a = p / jnp.sum(p, axis=1, keepdims=True)
        a = a.astype(v.dtype)
        a_ref[0] = a
        o = jax.lax.dot_general(a, v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0] = o.astype(o_ref.dtype)

    def bwd_kernel(q_ref, k_ref, v_ref, a_ref, do_ref,
                   dq_ref, dk_ref, dv_ref):
        j = pl.program_id(1)
        q = q_ref[0]                                        # (BQ, C)
        k = k_ref[0]                                        # (L, C)
        v = v_ref[0]                                        # (L, C)
        a = a_ref[0]                                        # (BQ, L)
        do = do_ref[0].astype(a.dtype)                      # (BQ, C)
        doT = jnp.swapaxes(do, 0, 1)                        # (C, BQ)
        vT = jnp.swapaxes(v, 0, 1)                          # (C, L)
        da = jax.lax.dot_general(doT, vT, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (BQ,L)
        af = a.astype(jnp.float32)
        tot = jnp.sum(af * da, axis=1, keepdims=True)       # (BQ, 1)
        ds = (af * (da - tot) / sqrt_c).astype(a.dtype)     # (BQ, L)
        dqc = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dkc = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dvc = jax.lax.dot_general(a, do, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dq_ref[0] = dqc

        @pl.when(j == 0)
        def _():
            dk_ref[0] = dkc
            dv_ref[0] = dvc

        @pl.when(j > 0)
        def _():
            dk_ref[0] += dkc
            dv_ref[0] += dvc

    def run_fwd(qs, ks, vs):
        BW = qs.shape[0]
        rq_spec = pl.BlockSpec((1, 1, BQ), lambda i, j: (i % K2, 0, j),
                               memory_space=pltpu.VMEM)
        rk_spec = pl.BlockSpec((1, 1, L), lambda i, j: (i % K2, 0, 0),
                               memory_space=pltpu.VMEM)
        o, a = pl.pallas_call(
            fwd_kernel,
            grid=(BW, NQ),
            in_specs=[
                pl.BlockSpec((1, BQ, C), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, L, C), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, L, C), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                rq_spec, rk_spec,
            ],
            out_specs=[
                pl.BlockSpec((1, BQ, C), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BQ, L), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((BW, L, C), qs.dtype),
                jax.ShapeDtypeStruct((BW, L, L), vs.dtype),
            ],
            interpret=interpret,
        )(qs, ks, vs, jnp.asarray(regions), jnp.asarray(regions))
        return o, a

    def run_bwd(qs, ks, vs, a, do):
        BW = qs.shape[0]
        dq, dk, dv = pl.pallas_call(
            bwd_kernel,
            grid=(BW, NQ),
            in_specs=[
                pl.BlockSpec((1, BQ, C), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, L, C), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, L, C), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BQ, L), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BQ, C), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, BQ, C), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, L, C), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, L, C), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((BW, L, C), jnp.float32),
                jax.ShapeDtypeStruct((BW, L, C), jnp.float32),
                jax.ShapeDtypeStruct((BW, L, C), jnp.float32),
            ],
            interpret=interpret,
        )(qs, ks, vs, a, do)
        return dq, dk, dv

    @jax.custom_vjp
    def core(qs, ks, vs):
        o, _ = run_fwd(qs, ks, vs)
        return o

    def core_fwd(qs, ks, vs):
        o, a = run_fwd(qs, ks, vs)
        return o, (qs, ks, vs, a)

    def core_bwd(res, do):
        qs, ks, vs, a = res
        dq, dk, dv = run_bwd(qs, ks, vs, a, do)
        return (dq.astype(qs.dtype), dk.astype(ks.dtype),
                dv.astype(vs.dtype))

    core.defvjp(core_fwd, core_bwd)
    return core


def _run_sharded(core, qs, ks, vs, stream_sharding, K2: int):
    """Run the attention core under an explicit device mesh via shard_map.

    A bare `pallas_call` inside a GSPMD-partitioned jit has no partitioning
    rule — XLA would silently all-gather the batch-sharded operands onto
    every device (the classic Pallas-under-GSPMD footgun). Instead the core
    runs in shard_map over the stream axis: each device executes the kernel
    on its local [b_local*K2, L, C] block with zero communication (windows
    are batch-independent; split_feature is stream-major so K2-sized window
    groups never straddle shards). Streams not divisible by the mesh pad
    with zero windows (uniform softmax — finite everywhere) that are sliced
    off again; their cotangents drop in the pad's transpose.
    """
    import inspect

    try:
        from jax import shard_map
    except ImportError:                      # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = stream_sharding.mesh
    axis = stream_sharding.spec[0]
    n = int(mesh.shape[axis])
    b_new = qs.shape[0]
    b = b_new // K2
    pad = (-b) % n
    if pad:
        z = jnp.zeros((pad * K2,) + qs.shape[1:], qs.dtype)
        qs, ks, vs = (jnp.concatenate([x, z], axis=0) for x in (qs, ks, vs))
    rep_kw = ("check_vma"
              if "check_vma" in inspect.signature(shard_map).parameters
              else "check_rep")
    fn = shard_map(core, mesh=mesh,
                   in_specs=(P(axis), P(axis), P(axis)),
                   out_specs=P(axis), **{rep_kw: False})
    out = fn(qs, ks, vs)
    return out[:b_new] if pad else out


def fused_window_attention(q, k, v, num_splits: int, with_shift: bool,
                           attn_mask=None, interpret=None,
                           stream_sharding=None):
    """Drop-in replacement for `split_window_attention` ([B,H,W,C] -> same).

    attn_mask is accepted for interface parity; the kernel derives the
    shifted-window mask from region ids instead. Unsupported window shapes
    fall back to the XLA path (which is where attn_mask is consumed).
    stream_sharding: NamedSharding partitioning the leading (stream) axis —
    runs the kernel per-shard via shard_map (see `_run_sharded`).
    """
    b, h, w, c = q.shape
    ws_h, ws_w = h // num_splits, w // num_splits
    L = ws_h * ws_w
    if not _supported(L, c, q.dtype):
        return split_window_attention(q, k, v, num_splits, with_shift,
                                      attn_mask)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    K2 = num_splits * num_splits

    if with_shift:
        sh, sw = ws_h // 2, ws_w // 2
        q = jnp.roll(q, shift=(-sh, -sw), axis=(1, 2))
        k = jnp.roll(k, shift=(-sh, -sw), axis=(1, 2))
        v = jnp.roll(v, shift=(-sh, -sw), axis=(1, 2))

    b_new = b * K2
    qs = split_feature(q, num_splits).reshape(b_new, L, c)
    ks = split_feature(k, num_splits).reshape(b_new, L, c)
    vs = split_feature(v, num_splits).reshape(b_new, L, c)

    BQ = 256 if L % 256 == 0 else 128
    core = _make_core(L, c, BQ, K2, h, w, ws_h, ws_w, bool(with_shift),
                      bool(interpret))
    if stream_sharding is not None:
        out = _run_sharded(core, qs, ks, vs, stream_sharding, K2)
    else:
        out = core(qs, ks, vs)

    out = merge_splits(out.reshape(b_new, ws_h, ws_w, c), num_splits)
    if with_shift:
        out = jnp.roll(out, shift=(sh, sw), axis=(1, 2))
    return out
