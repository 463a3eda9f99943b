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


def _elu(x):
    # expm1-free ELU: Mosaic has no expm1 lowering (jax.nn.elu fails to
    # compile for TPU inside a kernel). exp(min(x,0))-1 loses expm1's
    # cancellation guard only for |x| < ~1e-7, irrelevant at f32 activation
    # scales; min() keeps exp() from overflowing on the positive branch.
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _act(name):
    return {"ReLU": lambda x: jnp.maximum(x, 0.0),
            "ELU": _elu, "GELU": jax.nn.gelu}[name or "ReLU"]


def _posenc_legacy_T(x, L: int):
    """x: (N,S) -> (N + 2NL, S), pi-less frequency-major (all sin, all cos),
    matching [x, ops/posenc.nerf_posenc_legacy(x)]'s [..., L*N] layout."""
    spec = jnp.concatenate([x * (2.0 ** l) for l in range(L)], axis=0)
    return jnp.concatenate([x, jnp.sin(spec), jnp.cos(spec)], axis=0)


def cond_nerf_decode(params, cfg, points_3d, ray_unit, cond_info,
                     block_rays: int = 8, group_rays: int = 4,
                     matmul_dtype=None,
                     interpret: Optional[bool] = None,
                     fold_composite: bool = False,
                     depth_samples=None, ray=None,
                     setbg_opaque: bool = False,
                     extract_batched: bool = False):
    """Pallas counterpart of apply_cond_nerf for the view_dep CondNeRF.

    points_3d: [B,R,S,3]; ray_unit: [B,R,S,3]; cond_info dict with feat_info
    [B,R,S,Gf], color_info [B,R,S,3V], mask_info [B,R,S,V].
    Returns (rgb [B,R,S,3], density [B,R,S]).

    matmul_dtype=jnp.bfloat16 rounds the OPERANDS of the wide pointwise
    matmuls (the MLP/heads, ~95% of the FLOPs) to bf16 with f32
    accumulation; activations, the 16-wide ray-attention, softmax/LayerNorm
    stats stay f32 (precision.decoder_matmul_dtype).

    fold_composite=True additionally runs the emission-absorption quadrature
    (cond_nerf.composite / reference nerf.py:101-124) INSIDE the kernel —
    the exclusive transmittance cumsum becomes one block-diagonal
    strictly-lower-triangular matmul over the lane (sample) axis, the
    rgb/depth/opacity integrals one segment-sum matmul — so the [N,4,S]
    activation never round-trips HBM; the kernel then writes 8 floats per
    ray and returns (rgb [B,R,3], depth [B,R,1], opacity [B,R,1]).
    Requires depth_samples [B,R,S,1]; `ray` [B,R,3] (unnormalized) is only
    read when nerf.wo_render_interval is false.

    extract_batched=True replaces the per-ray attention-output extraction
    loop (GR iterations of (16,4S) slices + head-fold sums + vmean/where)
    with three fat constant matmuls over the whole group — a row-fold
    F^T (out ⊙ M), a per-head lane-segment sum, and a segment-mean matmul
    for the masked-query fallback — plus ONE (16,GS) where. Query columns
    switch to head-major order so the head fold is 4 static lane slices.
    Numerically equivalent up to f32 summation order (the vmean reduction
    becomes a matmul).
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
    lane = bool(cond_info.get("lane_major", False)) \
        if hasattr(cond_info, "get") else False
    Gf = cond_info["feat_info"].shape[1 if lane else -1]

    p = params
    enc_dim = 3 + 6 * L3d if use_posenc else 3
    ray_dim = 3 + 6 * Lview if (use_posenc and Lview > 0) else 3

    # ---- flatten rays, transpose to lane-major [N, ch, S]
    N = B * R
    def T(x):                                                       # [B,R,S,c] -> [N,c,S]
        return jnp.swapaxes(x.reshape(N, S, -1), -1, -2)
    ndcT = T(points_3d)
    rayT = T(ray_unit)
    if lane:
        # already lane-major from the block/color kernels (no XLA transpose;
        # precision.lanemajor_cond). colT may carry 16 padded channels —
        # the kernel slices the first 3V sublanes in VMEM.
        featT = cond_info["feat_info"]                              # [N,Gf,S]
        colT = cond_info["color_info"]                              # [N,>=3V,S]
        maskT = cond_info["mask_info"]                              # [N,V,S]
        assert featT.shape == (N, Gf, S) and maskT.shape == (N, n_views, S) \
            and colT.shape[0] == N and colT.shape[2] == S, \
            (featT.shape, colT.shape, maskT.shape, N, S)
    else:
        featT = T(cond_info["feat_info"])
        colT = T(cond_info["color_info"])
        maskT = T(cond_info["mask_info"])

    wo_render_interval = bool(cfg.nerf.wo_render_interval)
    if fold_composite:
        assert depth_samples is not None
        depth = depth_samples[..., 0]                               # [B,R,S]
        if wo_render_interval:
            dfac = jnp.ones_like(depth)        # sigma_delta = raw sigma
        else:
            ray_length = jnp.linalg.norm(ray, axis=-1, keepdims=True)
            intv = depth[..., 1:] - depth[..., :-1]
            intv = jnp.concatenate(
                [intv, jnp.full_like(intv[..., :1], 1e10)], axis=-1)
            dfac = intv * ray_length
        ctxT = T(jnp.stack([depth, dfac], axis=-1))                 # (N,2,S)

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

    def kernel(ndc_ref, ray_ref, feat_ref, col_ref, mask_ref, *rest):
        if fold_composite:
            ctx_ref, rest = rest[0], rest[1:]
        postab_ref = rest[0]
        w_refs = rest[1:]
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

        # ---- constant selector tensors, hoisted OUT of the per-group loop:
        # they depend only on static shapes, and rebuilding the (16GR,Mw)
        # and (GS,GS) iota+compare masks once per group (4x per grid step)
        # is pure VPU waste if Mosaic doesn't CSE the unrolled copies.
        GR = group_rays
        Mw = GR * n_head * S
        GSg = GR * S
        inv = 1.0 / jnp.sqrt(jnp.float32(d_k))
        cb = jax.lax.broadcasted_iota(jnp.int32, (16 * GR, Mw), 0)
        mb = jax.lax.broadcasted_iota(jnp.int32, (16 * GR, Mw), 1)
        if extract_batched:
            # head-major query columns: m = hh*GR*S + j*S + s. The block-
            # diagonal ray select M2 and the head-row select factor apart;
            # Fw folds the 16GR attention-output rows back to 16.
            sel = ((cb // 16 == (mb % GSg) // S)
                   & ((cb % 16) // d_k == mb // GSg))
            m2 = (cb // 16 == (mb % GSg) // S).astype(jnp.float32)
            fw = (jax.lax.broadcasted_iota(jnp.int32, (16 * GR, 16), 0) % 16
                  == jax.lax.broadcasted_iota(jnp.int32, (16 * GR, 16), 1)
                  ).astype(jnp.float32)                              # (16GR,16)
            vr1 = jax.lax.broadcasted_iota(jnp.int32, (GSg, GSg), 0)
            vr2 = jax.lax.broadcasted_iota(jnp.int32, (GSg, GSg), 1)
            vseg = (vr1 // S == vr2 // S).astype(jnp.float32) / S    # (GS,GS)
            hrow = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0) // d_k
        else:
            sel = ((cb // 16 == mb // (n_head * S))
                   & ((cb % 16) // d_k == (mb % (n_head * S)) // S))
            c16 = jax.lax.broadcasted_iota(jnp.int32, (16, n_head * S), 0)
            hS = jax.lax.broadcasted_iota(jnp.int32, (16, n_head * S), 1) // S
            headmask = (c16 // d_k == hS).astype(jnp.float32)        # (16,4S)
        if fold_composite:
            GS = GR * S
            r1 = jax.lax.broadcasted_iota(jnp.int32, (GS, GS), 0)
            r2 = jax.lax.broadcasted_iota(jnp.int32, (GS, GS), 1)
            ubig = ((r1 // S == r2 // S) & (r1 % S < r2 % S)) \
                .astype(jnp.float32)                                 # (GS,GS)
            seg = (jax.lax.broadcasted_iota(jnp.int32, (GS, GR), 0) // S
                   == jax.lax.broadcasted_iota(jnp.int32, (GS, GR), 1)) \
                .astype(jnp.float32)                                 # (GS,GR)

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
                 # [:3V] drops the lane-major color pad rows (no-op at 3V ch)
                 jnp.concatenate([col_ref[b][0:3 * n_views] for b in bs],
                                 axis=1),
                 mask], axis=0)                                      # (22,GS)
            bias = mm(pts_bias_w, in_feats, pts_bias_b, wide=True)   # (W,GS)

            h = enc
            for i, (w, bb) in enumerate(layer_w):
                h = jnp.maximum(mm(w, h, bb, wide=True) * bias, 0.0)
                if i in skip:
                    h = jnp.concatenate([enc, h], axis=0)

            # ----- density branch: the ray transformer. Everything pointwise
            # (qkv projections, fc, LayerNorm, the two output linears) runs
            # ray-grouped on (ch, GS). The attention itself is batched over
            # BOTH heads and rays with one pair of block-masked matmuls per
            # GROUP (round 2 folded the 4 heads per ray, 8 matmuls/ray -> 2;
            # round 3 folds the GR rays too, 2*GR -> 2 per group): K/V stack
            # the rays on the contraction (sublane) axis, the query is tiled
            # to (ray, head)-major columns and masked so column block (j,h)
            # contracts exactly ray j's head-h rows — the kernel was
            # matmul-ISSUE-bound, so fewer, fatter matmuls win despite the
            # masked-out FLOPs (contraction depth 16 -> 16*GR also feeds the
            # 128-deep MXU better).
            tokg = act(mm(alpha_w, h, alpha_b, wide=True))           # (16,GS)
            tokg = tokg + jnp.concatenate([postab_ref[:]] * GR, axis=1)
            nvg = jnp.sum(mask, axis=0, keepdims=True)               # (1,GS)
            wqkv = jnp.concatenate([wq[:], wk[:], wv[:]], axis=1)    # (16,48)
            qkv = jax.lax.dot_general(wqkv, tokg, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            q_all = qkv[0:16] * inv                                  # (16,GS)
            k_all = qkv[16:32]
            v_all = qkv[32:48]
            k_big = jnp.concatenate(
                [k_all[:, j * S:(j + 1) * S] for j in range(GR)], axis=0)
            v_big = jnp.concatenate(
                [v_all[:, j * S:(j + 1) * S] for j in range(GR)], axis=0)
            if extract_batched:
                # head-major columns: per-ray slices concatenated over j for
                # fixed head == q_all itself, repeated per head
                q_tiled = jnp.concatenate([q_all] * n_head, axis=1)  # (16,Mw)
            else:
                q_tiled = jnp.concatenate(
                    [q_all[:, j * S:(j + 1) * S]
                     for j in range(GR) for _ in range(n_head)], axis=1)
            q_big = jnp.where(sel, jnp.concatenate([q_tiled] * GR, axis=0),
                              0.0)                                   # (16GR,Mw)
            scoresT = jax.lax.dot_general(
                k_big, q_big, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)                  # (S,Mw)
            attnT = jax.nn.softmax(scoresT, axis=0)
            out_all = jax.lax.dot_general(
                v_big, attnT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)                  # (16GR,Mw)
            if extract_batched:
                # fold the 16GR rows to 16 (block-diagonal select + row sum
                # as one matmul), then the 4 heads as static lane slices
                folded = jax.lax.dot_general(
                    fw, out_all * m2, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)              # (16,Mw)
                cat_all = sum(
                    folded[:, hh * GSg:(hh + 1) * GSg]
                    * (hrow == hh).astype(jnp.float32)
                    for hh in range(n_head))                         # (16,GS)
                vmean_big = jax.lax.dot_general(
                    v_all, vseg, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)              # (16,GS)
                o_in = jnp.where(nvg > 1.0, cat_all, vmean_big)
            else:
                # per-ray extraction: GR iterations of (16,4S) slices with
                # the static head-fold mask (hoisted above)
                outs_j = []
                for j in range(GR):
                    blk = out_all[16 * j:16 * (j + 1),
                                  j * n_head * S:(j + 1) * n_head * S]
                    cat = sum(blk[:, hh * S:(hh + 1) * S]
                              * headmask[:, hh * S:hh * S + 1]
                              for hh in range(n_head))               # (16,S)
                    vmean = jnp.mean(v_all[:, j * S:(j + 1) * S], axis=1,
                                     keepdims=True)                  # (16,1)
                    maskq = nvg[:, j * S:(j + 1) * S] > 1.0          # (1,S)
                    outs_j.append(jnp.where(maskq, cat, vmean))
                o_in = jnp.concatenate(outs_j, axis=1)
            o = mm(fc, o_in) + tokg                                  # (16,GS)
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

            if fold_composite:
                # ----- emission-absorption quadrature, in (1,GS) layout.
                # Exclusive cumsum along each ray's S-lane segment is one
                # block-diagonal strictly-lower-triangular matmul; the
                # rgb/depth/opacity integrals one segment-sum matmul
                # (ubig/seg masks hoisted above — loop-invariant).
                dep = jnp.concatenate([ctx_ref[b, 0:1] for b in bs], axis=1)
                dfa = jnp.concatenate([ctx_ref[b, 1:2] for b in bs], axis=1)
                sd = alphag * dfa                                    # (1,GS)
                cum = jax.lax.dot_general(
                    sd, ubig, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)              # (1,GS)
                prob = jnp.exp(-cum) * (1.0 - jnp.exp(-sd))          # (1,GS)

                def segsum(x):                                       # (c,GS)->(c,GR)
                    return jax.lax.dot_general(
                        x, seg, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                rgb_out = segsum(rgb * prob)                         # (3,GR)
                depth_out = segsum(dep * prob)                       # (1,GR)
                opac = segsum(prob)                                  # (1,GR)
                if setbg_opaque:
                    rgb_out = rgb_out + (1.0 - opac)
                out_ref[0, 0:3, g * GR:(g + 1) * GR] = rgb_out
                out_ref[0, 3:4, g * GR:(g + 1) * GR] = depth_out
                out_ref[0, 4:5, g * GR:(g + 1) * GR] = opac
                out_ref[0, 5:8, g * GR:(g + 1) * GR] = jnp.zeros(
                    (3, GR), jnp.float32)
            else:
                for j, b in enumerate(bs):
                    out_ref[b] = jnp.concatenate(
                        [rgb[:, j * S:(j + 1) * S], alphas[j]], axis=0)  # (4,S)

    pad = (-N) % block_rays
    ins = [ndcT, rayT, featT, colT, maskT]
    if fold_composite:
        ins.append(ctxT)
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

    if fold_composite:
        # Mosaic requires the trailing block dims be (8,128)-aligned or
        # equal to the array dims; a (nblocks, 8, block_rays) layout keeps
        # the per-step block equal to the full trailing dims.
        out_shape = jax.ShapeDtypeStruct((Np // block_rays, 8, block_rays),
                                         jnp.float32)
        out_specs = pl.BlockSpec((1, 8, block_rays), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((Np, 4, S), jnp.float32)
        out_specs = pl.BlockSpec((block_rays, 4, S), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(Np // block_rays,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(*ins, postab, *wl)

    if fold_composite:
        out = jnp.swapaxes(out, 1, 2).reshape(Np, 8)[:N]            # [N,8]
        rgb = out[:, 0:3].reshape(B, R, 3)
        depth = out[:, 3:4].reshape(B, R, 1)
        opacity = out[:, 4:5].reshape(B, R, 1)
        return rgb, depth, opacity

    out = out[:N]                                                   # [N,4,S]
    rgb = jnp.swapaxes(out[:, :3, :], -1, -2).reshape(B, R, S, 3)
    density = out[:, 3, :].reshape(B, R, S)
    return rgb, density
