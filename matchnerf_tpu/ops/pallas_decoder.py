"""Conditional-NeRF decoder Pallas megakernel (TPU, eval path).

The XLA decoder (models/decoder/cond_nerf.py::apply_cond_nerf, reference
models/rfdecoder/cond_nerf.py:52-127) evaluates ~10 width-128 matmuls over
[R*S, .] activations. Per 8192-ray slice that is only ~300 GFLOP, but every
inter-layer activation round-trips HBM (~6 GB of traffic) — the decoder is
memory-bound at ~30 ms/slice.

This kernel keeps the whole per-ray computation VMEM-resident: positional
encoding, the bias-conditioned MLP, the IBRNet ray transformer over the S
depth samples, the density/rgb heads. Layout is lane-major — channels ride
sublanes, the S sample axis rides the 128 lanes — so every matmul is an MXU
A^T B contraction over sublane dims and per-sample scalars broadcast free.

HBM traffic becomes inputs (ndc/ray dirs/conditioning, ~28 ch/point) plus
the [R,4,S] rgb+sigma output: ~150 MB/slice.

Exact semantics reproduced (numerics match apply_cond_nerf to f32 rounding):
- legacy pi-less frequency-major posenc (cond_nerf.py:108-116)
- h = relu(Linear(h) * pts_bias(cond)), skip-concat of the encoded input
- ray transformer: bias-free qkv/fc, softmax with the query-axis mask quirk
  (masked queries attend uniformly -> their outputs are mean-of-values),
  residual + LayerNorm(eps=1e-6)
- density head relu, optional maskfill; rgb head sigmoid

Forward-only; training keeps the differentiable XLA path.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _act(name):
    return {"ReLU": lambda x: jnp.maximum(x, 0.0),
            "ELU": jax.nn.elu, "GELU": jax.nn.gelu}[name or "ReLU"]


def _posenc_legacy_T(x, L: int):
    """x: (N,S) -> (N + 2NL, S), pi-less frequency-major (all sin, all cos),
    matching [x, ops/posenc.nerf_posenc_legacy(x)]'s [..., L*N] layout."""
    spec = jnp.concatenate([x * (2.0 ** l) for l in range(L)], axis=0)
    return jnp.concatenate([x, jnp.sin(spec), jnp.cos(spec)], axis=0)


def cond_nerf_decode(params, cfg, points_3d, ray_unit, cond_info,
                     block_rays: int = 8, group_rays: int = 4,
                     matmul_dtype=None,
                     interpret: Optional[bool] = None):
    """Pallas counterpart of apply_cond_nerf for the view_dep CondNeRF.

    points_3d: [B,R,S,3]; ray_unit: [B,R,S,3]; cond_info dict with feat_info
    [B,R,S,Gf], color_info [B,R,S,3V], mask_info [B,R,S,V].
    Returns (rgb [B,R,S,3], density [B,R,S]).

    matmul_dtype=jnp.bfloat16 rounds the OPERANDS of the wide pointwise
    matmuls (the MLP/heads, ~95% of the FLOPs) to bf16 with f32
    accumulation; activations, the 16-wide ray-attention, softmax/LayerNorm
    stats stay f32 (precision.decoder_matmul_dtype).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    assert cfg.nerf.view_dep, "pallas decoder covers the view_dep CondNeRF"
    B, R, S, _ = points_3d.shape
    Wd = int(cfg.decoder.net_width)
    skip = tuple(sorted(set(cfg.decoder.skip)))
    L3d = int(cfg.decoder.posenc.L_3D) if cfg.decoder.posenc else 0
    Lview = int(cfg.decoder.posenc.L_view) if cfg.decoder.posenc else 0
    use_posenc = bool(cfg.decoder.posenc)
    act_name = (cfg.decoder.get("raytrans_act", "ReLU")
                if hasattr(cfg.decoder, "get")
                else getattr(cfg.decoder, "raytrans_act", "ReLU")) or "ReLU"
    density_maskfill = bool(cfg.decoder.density_maskfill)
    raytrans_posenc = bool(cfg.decoder.raytrans_posenc)
    legacy = bool(cfg.nerf.legacy_coord)
    n_views = int(cfg.n_src_views)
    Gf = cond_info["feat_info"].shape[-1]

    p = params
    enc_dim = 3 + 6 * L3d if use_posenc else 3
    ray_dim = 3 + 6 * Lview if (use_posenc and Lview > 0) else 3

    # ---- flatten rays, transpose to lane-major [N, ch, S]
    N = B * R
    def T(x):                                                       # [B,R,S,c] -> [N,c,S]
        return jnp.swapaxes(x.reshape(N, S, -1), -1, -2)
    ndcT = T(points_3d)
    rayT = T(ray_unit)
    featT = T(cond_info["feat_info"])
    colT = T(cond_info["color_info"])
    maskT = T(cond_info["mask_info"])

    if raytrans_posenc:
        from .posenc import ray_sinusoid_table
        postab = jnp.swapaxes(ray_sinusoid_table(16, S)[0], 0, 1)   # (16,S)
    else:
        postab = jnp.zeros((16, S), jnp.float32)

    # ---- weights in A^T B orientation ([in,out] as stored; bias (out,1)).
    # With matmul_dtype=bf16 the wide-MLP weights are cast ONCE here (VMEM
    # halves too); in-kernel per-matmul operand casts measured a wash.
    md = matmul_dtype or jnp.float32
    wl = []
    def addw(w):
        wl.append(w.astype(jnp.float32))
    def addw_md(w):
        wl.append(w.astype(md))
    def addlin_md(lin):
        addw_md(lin["w"])
        addw(lin["b"][:, None])
    def addlin(lin):
        addw(lin["w"])
        addw(lin["b"][:, None])
    addlin_md(p["pts_bias"])
    for lp in p["pts_linears"]:
        addlin_md(lp)
    addlin_md(p["alpha_linear"])
    ra = p["ray_attention"]
    addw(ra["w_qs"]["w"])
    addw(ra["w_ks"]["w"])
    addw(ra["w_vs"]["w"])
    addw(ra["fc"]["w"])
    addw(ra["layer_norm"]["scale"][:, None])
    addw(ra["layer_norm"]["bias"][:, None])
    addlin(p["out_alpha_linear"][0])
    addlin(p["out_alpha_linear"][1])
    addlin_md(p["feature_linear"])
    addlin_md(p["views_linears"][0])
    addlin_md(p["rgb_linear"])

    n_layers = len(p["pts_linears"])
    act = _act(act_name)
    n_head, d_k = 4, 4
    group_rays = min(group_rays, block_rays)
    assert block_rays % group_rays == 0

    def kernel(ndc_ref, ray_ref, feat_ref, col_ref, mask_ref, postab_ref,
               *w_refs):
        out_ref = w_refs[-1]
        w_refs = w_refs[:-1]
        it = iter(range(len(w_refs)))
        def nxt():
            return w_refs[next(it)]
        pts_bias_w, pts_bias_b = nxt(), nxt()
        layer_w = [(nxt(), nxt()) for _ in range(n_layers)]
        alpha_w, alpha_b = nxt(), nxt()
        wq, wk, wv, fc = nxt(), nxt(), nxt(), nxt()
        ln_s, ln_b = nxt(), nxt()
        oa0_w, oa0_b = nxt(), nxt()
        oa1_w, oa1_b = nxt(), nxt()
        feat_w, feat_b = nxt(), nxt()
        view_w, view_b = nxt(), nxt()
        rgb_w, rgb_b = nxt(), nxt()

        md = matmul_dtype or jnp.float32

        def mm(w_ref, x, b_ref=None, wide=False):
            w = w_ref[:]
            if wide and md != jnp.float32:
                x = x.astype(md)          # weights already stored in md
            y = jax.lax.dot_general(w, x, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if b_ref is not None:
                y = y + b_ref[:]
            return y

        # rays are grouped along the lane axis: the pointwise MLP runs on
        # (ch, GR*S) operands (better MXU shapes than per-ray (ch, S));
        # only the ray transformer, whose attention mixes samples within a
        # ray, drops back to per-ray (16,S) slices
        GR = group_rays
        for g in range(block_rays // GR):
            bs = [g * GR + j for j in range(GR)]
            pts = jnp.concatenate([ndc_ref[b] for b in bs], axis=1)  # (3,GS)
            enc = _posenc_legacy_T(pts, L3d) if use_posenc else pts
            rayc = jnp.concatenate([ray_ref[b] for b in bs], axis=1)
            ray_enc = _posenc_legacy_T(rayc, Lview) \
                if (use_posenc and Lview > 0) else rayc
            mask = jnp.concatenate([mask_ref[b] for b in bs], axis=1)
            in_feats = jnp.concatenate(
                [jnp.concatenate([feat_ref[b] for b in bs], axis=1),
                 jnp.concatenate([col_ref[b] for b in bs], axis=1),
                 mask], axis=0)                                      # (22,GS)
            bias = mm(pts_bias_w, in_feats, pts_bias_b, wide=True)   # (W,GS)

            h = enc
            for i, (w, bb) in enumerate(layer_w):
                h = jnp.maximum(mm(w, h, bb, wide=True) * bias, 0.0)
                if i in skip:
                    h = jnp.concatenate([enc, h], axis=0)

            # ----- density branch: the ray transformer. Everything pointwise
            # (qkv projections, fc, LayerNorm, the two output linears) runs
            # ray-grouped on (ch, GS); only scores/attn-output drop to
            # per-ray, and there the 4 heads fold into ONE pair of matmuls
            # each via a block-masked query (head h's q occupies rows
            # 4h..4h+4 of columns hS..(h+1)S; rows outside a head are zero,
            # so the 16-deep contraction computes all 4 head scores at once).
            # 8 small matmuls/ray -> 2: the kernel was matmul-issue-bound
            # (measured: attention 9ms of 14, softmax only 1.4ms).
            tokg = act(mm(alpha_w, h, alpha_b, wide=True))           # (16,GS)
            tokg = tokg + jnp.concatenate([postab_ref[:]] * GR, axis=1)
            nvg = jnp.sum(mask, axis=0, keepdims=True)               # (1,GS)
            inv = 1.0 / jnp.sqrt(jnp.float32(d_k))
            wqkv = jnp.concatenate([wq[:], wk[:], wv[:]], axis=1)    # (16,48)
            qkv = jax.lax.dot_general(wqkv, tokg, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            # static head masks
            c16 = jax.lax.broadcasted_iota(jnp.int32, (16, n_head * S), 0)
            hS = jax.lax.broadcasted_iota(jnp.int32, (16, n_head * S), 1) // S
            headmask = (c16 // d_k == hS).astype(jnp.float32)        # (16,4S)
            outs_j = []
            for j in range(GR):
                q = qkv[0:16, j * S:(j + 1) * S] * inv               # (16,S)
                k = qkv[16:32, j * S:(j + 1) * S]
                v = qkv[32:48, j * S:(j + 1) * S]
                qp = jnp.concatenate([q] * n_head, axis=1) * headmask
                scoresT = jax.lax.dot_general(
                    k, qp, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)              # (S,4S)
                attnT = jax.nn.softmax(scoresT, axis=0)
                out_all = jax.lax.dot_general(
                    v, attnT, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)              # (16,4S)
                cat = sum(out_all[:, hh * S:(hh + 1) * S]
                          * headmask[:, hh * S:hh * S + 1]
                          for hh in range(n_head))                   # (16,S)
                vmean = jnp.mean(v, axis=1, keepdims=True)           # (16,1)
                maskq = nvg[:, j * S:(j + 1) * S] > 1.0              # (1,S)
                outs_j.append(jnp.where(maskq, cat, vmean))
            o = mm(fc, jnp.concatenate(outs_j, axis=1)) + tokg       # (16,GS)
            mu = jnp.mean(o, axis=0, keepdims=True)
            var = jnp.mean((o - mu) * (o - mu), axis=0, keepdims=True)
            o = (o - mu) / jnp.sqrt(var + 1e-6) * ln_s[:] + ln_b[:]
            o = act(mm(oa0_w, o, oa0_b))
            alphag = jnp.maximum(mm(oa1_w, o, oa1_b), 0.0)           # (1,GS)
            if density_maskfill:
                alphag = jnp.where(nvg < 1.0, 0.0, alphag)
            alphas = [alphag[:, j * S:(j + 1) * S] for j in range(GR)]

            # ----- rgb branch (pointwise — stays ray-grouped)
            feature = mm(feat_w, h, feat_b, wide=True)               # (W,GS)
            hv = jnp.concatenate([feature, ray_enc], axis=0)         # (W+3,GS)
            hv = jnp.maximum(mm(view_w, hv, view_b, wide=True), 0.0) # (W/2,GS)
            rgb = jax.nn.sigmoid(mm(rgb_w, hv, rgb_b, wide=True))    # (3,GS)

            for j, b in enumerate(bs):
                out_ref[b] = jnp.concatenate(
                    [rgb[:, j * S:(j + 1) * S], alphas[j]], axis=0)  # (4,S)

    pad = (-N) % block_rays
    ins = [ndcT, rayT, featT, colT, maskT]
    if pad:
        ins = [jnp.pad(x, ((0, pad), (0, 0), (0, 0))) for x in ins]
    Np = N + pad

    in_specs = []
    for x in ins:
        c = x.shape[1]
        in_specs.append(pl.BlockSpec((block_rays, c, S), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((16, S), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))
    for w in wl:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Np, 4, S), jnp.float32),
        grid=(Np // block_rays,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_rays, 4, S), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*ins, postab, *wl)

    out = out[:N]                                                   # [N,4,S]
    rgb = jnp.swapaxes(out[:, :3, :], -1, -2).reshape(B, R, S, 3)
    density = out[:, 3, :].reshape(B, R, S)
    return rgb, density
