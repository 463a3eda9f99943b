"""Banded-gather + interpolation + grouped-cosine Pallas megakernel (TPU).

The conditional-feature query (reference: models/matchnerf.py:209-293, 48x
`F.grid_sample`) is the render bottleneck: per (ray, sample, view, scale) it
gathers a 4C-channel packed row — ~6 GB of HBM reads per 8192-ray slice, at
the TPU's random-gather rate (~40-70 GB/s effective, tools/bench_gather.py).

Along a ray, consecutive depth samples project onto a monotone epipolar
segment, so the ≤S gathered cells collapse to ≤Kt distinct runs (Kt ~ 16-64
at DTU shapes vs S=128). `ops/banded_gather.py` exploits that in pure XLA but
measured a wash: the one-hot run→sample expansion materializes [R,S,4C]
intermediates (~2 GB/view/scale) in HBM, refunding the gather savings.

This kernel keeps the expansion in VMEM:

  XLA:    dedup cells -> taps[R,Kt], coherent gather rows[R,4Kt,C] (3-4x
          faster than the random gather: tools/bench_gather.py sweep D/G)
  Pallas: one-hot-with-folded-bilinear-weights matmul  W[S,4Kt] @ rows[4Kt,C]
          on the MXU (exact: each output row is a convex combo of exactly the
          four taps the direct path uses), int8 dequant, grouped cosine —
          all VMEM-resident; only the [R,S,G] cosine leaves the chip memory.

Numerics: the tap selection is exact (single-1 one-hot). The bilinear weights
are folded as w00=(1-wx)(1-wy) etc. — algebraically equal to the direct
path's nested form, within float rounding. With bf16/int8 tables the matmul
runs in bf16 (weights rounded to bf16, ~2^-9 relative — below the table
quantization error); with f32 tables it runs in f32.

Forward-only: the renderer's eval/video paths use it; training keeps the
differentiable XLA path.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .grid_sample import _unnormalize

# Table-gradient scatter implementation for the trainable banded backward:
# "add"    — one scatter-add per view (XLA serializes duplicate-index rows;
#            measured ~10 ms/step at DTU train shapes)
# "segsum" — sort rows by cell, inclusive cumsum, then TWO unique-index
#            overwrite scatters (run end minus previous run end). Same sum
#            up to f32 reassociation; every op is vectorized. MEASURED DEAD
#            END (2026-08-19 device A/B at production settings): 127.1 vs
#            96.0 ms/step — the [R*kt, C4] sort+permute+cumsum costs ~3x
#            the serialized scatter it replaces. Kept for documentation.
SCATTER_IMPL = "add"


def scatter_rows_sum(taps, rows, HW: int):
    """Sum `rows` [N,C] into a [HW,C] table at `taps` [N] via sorted
    segment-cumsum-diff — a vectorized replacement for `.at[taps].add(rows)`
    (which serializes on duplicate indices on TPU)."""
    N, C = rows.shape
    iota = jnp.arange(N, dtype=jnp.int32)
    sk, sv = jax.lax.sort((taps.astype(jnp.int32), iota), num_keys=1)
    srows = jnp.take_along_axis(rows, sv[:, None], axis=0,
                                mode="promise_in_bounds")
    cs = jnp.cumsum(srows.astype(jnp.float32), axis=0)
    nxt = jnp.concatenate([sk[1:], jnp.full((1,), HW, sk.dtype)])
    is_end = sk != nxt
    # run-end rows scatter their inclusive cumsum to the cell; every other
    # row targets a unique trash slot so both scatters are pure writes
    trash = HW + iota
    idx_end = jnp.where(is_end, sk, trash)
    out = jnp.zeros((HW + N, C), jnp.float32).at[idx_end].set(
        cs, mode="promise_in_bounds", unique_indices=True)
    # each run end also seeds the NEXT run's prefix (cumsum before its start)
    idx_pre = jnp.where(is_end & (nxt < HW), nxt, trash)
    pre = jnp.zeros((HW + N, C), jnp.float32).at[idx_pre].set(
        cs, mode="promise_in_bounds", unique_indices=True)
    return (out - pre)[:HW]


def _cells_ranks_weights(grid, H: int, W: int, kt: int,
                         align_corners: bool = True):
    """Per-view cell dedup (same math as banded_gather._cells_and_weights /
    banded_sample_packed). grid: [R,S,2] -> (taps [R,kt] int32,
    rank [R,S] int32, wvals [R,S,4] f32)."""
    x = jnp.clip(_unnormalize(grid[..., 0], W, align_corners), 0.0, W - 1.0)
    y = jnp.clip(_unnormalize(grid[..., 1], H, align_corners), 0.0, H - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    cell = y0.astype(jnp.int32) * W + x0.astype(jnp.int32)        # [R,S]

    change = cell[:, 1:] != cell[:, :-1]
    rank = jnp.concatenate(
        [jnp.zeros((cell.shape[0], 1), jnp.int32),
         jnp.cumsum(change.astype(jnp.int32), axis=-1)], axis=-1)  # [R,S]
    rank = jnp.minimum(rank, kt - 1)

    # masked max-reduce instead of a scatter (TPU scatters serialize); cells
    # are >= 0 so empty slots reduce to row 0 (gathered but never selected)
    onehot_k = rank[:, :, None] == jnp.arange(kt)[None, None, :]   # [R,S,kt]
    taps = jnp.max(jnp.where(onehot_k, cell[:, :, None], 0), axis=1)  # [R,kt]
    wvals = jnp.stack([(1 - wx) * (1 - wy), wx * (1 - wy),
                       (1 - wx) * wy, wx * wy], axis=-1)           # [R,S,4]
    return taps, rank, wvals


def _banded_cosine_kernel(*refs, V: int, S: int, kt: int, Cc: int,
                          chunk_c: int, n_groups: int, pairs,
                          block_rays: int, compute_dtype, int4: bool = False):
    """Transposed layout: the sample axis S rides the 128-lane dimension
    everywhere, so per-sample scalars broadcast naturally and every matmul is
    MXU-shaped.

    refs: V per-view rows refs (BR,kt,4Cc) in the raw gathered layout
    (tap-major channel blocks), then rank_ref (V,BR,1,S) i32, wv_ref
    (V,BR,4,S), scale_ref (V,Cc,1) f32, out_ref (BR,G,S) f32.

    The interp is four A^T B matmuls (one per bilinear tap, contracting the
    kt sublane dim — native on the MXU) over 128-aligned channel slices of
    the gathered rows, so neither XLA nor the kernel ever re-tiles the 1GB
    rows array."""
    rows_refs = refs[:V]
    rank_ref, wv_ref, scale_ref, out_ref = refs[V:]
    Cg = chunk_c // n_groups
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (kt, S), 0)
    # group-selection matrix: (G, chunk_c) 0/1 — the (misaligned, Cg-wide)
    # per-group reductions become one aligned MXU matmul over sublanes
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (n_groups, chunk_c), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (n_groups, chunk_c), 1)
    sel = (c_iota // Cg == g_iota).astype(jnp.float32)             # (G,chunk)

    for b in range(block_rays):
        interp = []
        for v in range(V):
            rank_b = rank_ref[v, b]                                # (1,S) i32
            wv_b = wv_ref[v, b]                                    # (4,S) f32
            onehot = (k_iota == rank_b).astype(jnp.float32)        # (kt,S)
            if int4:
                # nibble-packed rows (kt, 4*Cc/2) uint8: per tap, the low
                # nibbles are channels [0,Cc/2) and the high nibbles
                # [Cc/2,Cc) (grid_sample.pack_int4_channels), so the two
                # half-interps concatenate on the sublane axis in original
                # channel order — no lane interleave needed.
                rows_b = rows_refs[v][b].astype(jnp.int32)         # (kt,2Cc)
                cch = Cc // 2
                acc_lo = acc_hi = None
                for t in range(4):
                    Wt = (onehot * wv_b[t:t + 1]).astype(compute_dtype)
                    blk = rows_b[:, t * cch:(t + 1) * cch]
                    lo = ((blk & 15) - 8).astype(compute_dtype)    # (kt,cch)
                    hi = ((blk >> 4) - 8).astype(compute_dtype)
                    p_lo = jax.lax.dot_general(
                        lo, Wt, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)        # (cch,S)
                    p_hi = jax.lax.dot_general(
                        hi, Wt, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc_lo = p_lo if acc_lo is None else acc_lo + p_lo
                    acc_hi = p_hi if acc_hi is None else acc_hi + p_hi
                acc = jnp.concatenate([acc_lo, acc_hi], axis=0)    # (Cc,S)
            else:
                rows_b = rows_refs[v][b].astype(compute_dtype)     # (kt,4Cc)
                acc = None
                for t in range(4):
                    Wt = (onehot * wv_b[t:t + 1]).astype(compute_dtype)  # (kt,S)
                    part = jax.lax.dot_general(
                        rows_b[:, t * Cc:(t + 1) * Cc], Wt,
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)        # (Cc,S)
                    acc = part if acc is None else acc + part
            acc = acc * scale_ref[v]
            interp.append(acc)

        acc_pairs = None
        for (i, j) in pairs:
            ca, cb = j - 1, i
            fa = interp[i][ca * chunk_c:(ca + 1) * chunk_c]        # (chunk,S)
            fb = interp[j][cb * chunk_c:(cb + 1) * chunk_c]
            dots = jnp.dot(sel, fa * fb, preferred_element_type=jnp.float32)
            na2 = jnp.dot(sel, fa * fa, preferred_element_type=jnp.float32)
            nb2 = jnp.dot(sel, fb * fb, preferred_element_type=jnp.float32)
            na = jnp.maximum(jnp.sqrt(na2), 1e-8)                  # (G,S)
            nb = jnp.maximum(jnp.sqrt(nb2), 1e-8)
            cosg = dots / (na * nb)
            acc_pairs = cosg if acc_pairs is None else acc_pairs + cosg
        out_ref[b] = acc_pairs / len(pairs)                        # (G,S)


def _fit_block_rays(preferred: int, per_ray_bytes: int,
                    budget: int = 10 << 20) -> int:
    """Halve the ray-block until its double-buffered VMEM windows fit.

    The row blocks scale as block_rays*kt*C4*dtype — at DTU train banding
    (kt<=48) 8-ray blocks fit, but the IBRNet recipe (1008x756, measured
    kt=(48,96), f32 tables) overflows the 16MB scoped-vmem limit (18.49M,
    2026-08-20 device compile). The budget leaves headroom for the kernel's
    compute temporaries (onehot, per-view interp accumulators)."""
    br = preferred
    while br > 1 and br * per_ray_bytes > budget:
        br //= 2
    return br


def banded_interp_cosine(rows_views, rank, wvals, scales, *, chunk_c: int,
                         n_groups: int, pairs: List[Tuple[int, int]],
                         block_rays: int = 8,
                         interpret: Optional[bool] = None):
    """rows_views: V-list of [R,kt,4Cc] tap rows in the raw gathered layout
    (int8/bf16/f32; kept as separate inputs so the per-view gathers feed the
    kernel without a stack copy); rank: [V,R,S] int32 run ranks; wvals:
    [V,R,S,4] f32 bilinear tap weights; scales: [V,Cc] f32 post-interp
    dequant (ones unless int8). Returns [R,S,G] f32 pair-mean grouped cosine
    (matchnerf.py:262-271)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    V = len(rows_views)
    R, kt, C4 = rows_views[0].shape
    int4 = rows_views[0].dtype == jnp.uint8        # nibble-packed marker
    Cc = (C4 // 4) * (2 if int4 else 1)
    S = rank.shape[-1]
    compute_dtype = jnp.float32 if rows_views[0].dtype == jnp.float32 \
        else jnp.bfloat16
    block_rays = _fit_block_rays(
        block_rays, 2 * V * kt * C4 * rows_views[0].dtype.itemsize)

    pad = (-R) % block_rays
    if pad:
        rows_views = [jnp.pad(r, ((0, pad), (0, 0), (0, 0)))
                      for r in rows_views]
        rank = jnp.pad(rank, ((0, 0), (0, pad), (0, 0)))
        wvals = jnp.pad(wvals, ((0, 0), (0, pad), (0, 0), (0, 0)))
    Rp = R + pad

    # lane-major staging: S on the last (lane) axis for per-sample data;
    # rows keep their gathered layout (the kernel contracts their sublane dim)
    rankT = rank[:, :, None, :]                                    # [V,Rp,1,S]
    wvT = jnp.swapaxes(wvals, -1, -2)                              # [V,Rp,4,S]

    kernel = functools.partial(
        _banded_cosine_kernel, V=V, S=S, kt=kt, Cc=Cc, chunk_c=chunk_c,
        n_groups=n_groups, pairs=pairs, block_rays=block_rays,
        compute_dtype=compute_dtype, int4=int4)

    rows_specs = [pl.BlockSpec((block_rays, kt, C4), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM) for _ in range(V)]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Rp, n_groups, S), jnp.float32),
        grid=(Rp // block_rays,),
        in_specs=rows_specs + [
            pl.BlockSpec((V, block_rays, 1, S), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V, block_rays, 4, S), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V, Cc, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rays, n_groups, S), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*rows_views, rankT, wvT, scales[:, :, None])
    return jnp.swapaxes(out[:R], -1, -2)                           # [R,S,G]


def banded_cosine_scale(vfeats, grids, kt: int, n_groups: int,
                        pairs: List[Tuple[int, int]],
                        dequant_scales=None, block_rays: int = 8,
                        interpret: Optional[bool] = None):
    """Full per-scale banded cosine query: dedup + coherent gather (XLA) then
    the VMEM interp+cosine kernel.

    vfeats: [1,V,h,w,4Cc] packed per-view tables (prepare_sampling_tables);
    grids: [V,1,R,S,2] normalized sample coords; dequant_scales: [1,V,Cc] or
    None. Returns [1,R,S,G] f32.
    """
    _, V, H, W, C4 = vfeats.shape
    Cc = (C4 // 4) * (2 if vfeats.dtype == jnp.uint8 else 1)
    chunk_c = Cc // (V - 1)
    _, _, R, S, _ = grids.shape

    taps_l, rank_l, wv_l = [], [], []
    for v in range(V):
        taps, rank, wvals = _cells_ranks_weights(grids[v, 0], H, W, kt)
        taps_l.append(taps)
        rank_l.append(rank)
        wv_l.append(wvals)
    taps = jnp.stack(taps_l)                                       # [V,R,kt]
    rank = jnp.stack(rank_l)                                       # [V,R,S]
    wvals = jnp.stack(wv_l)                                        # [V,R,S,4]

    # per-view gathers when a view's table fits the ~5MB VMEM-residency
    # window (4x faster, tools/bench_gather.py sweep H); one batched gather
    # otherwise (measured faster than 3 separate non-resident gathers). The
    # kernel takes a V-list, so neither path stacks/copies the rows, and the
    # [R*kt,C4] -> [R,kt,C4] split is layout-preserving.
    table_bytes = H * W * C4 * vfeats.dtype.itemsize
    if table_bytes <= 6 * 1024 * 1024:
        rows_views = [
            jnp.take_along_axis(vfeats[0, v].reshape(H * W, C4),
                                taps[v].reshape(R * kt)[:, None], axis=0,
                                mode="promise_in_bounds").reshape(R, kt, C4)
            for v in range(V)]
    else:
        flat = vfeats[0].reshape(V, H * W, C4)
        rows = jnp.take_along_axis(
            flat, taps.reshape(V, R * kt)[..., None], axis=1,
            mode="promise_in_bounds")                              # [V,R*kt,C4]
        rows_views = [rows[v].reshape(R, kt, C4) for v in range(V)]

    if dequant_scales is None:
        scales = jnp.ones((V, Cc), jnp.float32)
    else:
        scales = dequant_scales.reshape(V, Cc).astype(jnp.float32)

    out = banded_interp_cosine(rows_views, rank, wvals, scales,
                               chunk_c=chunk_c, n_groups=n_groups,
                               pairs=pairs, block_rays=block_rays,
                               interpret=interpret)
    return out[None]                                               # [1,R,S,G]


# --------------------------- trainable variant ------------------------------


def _grouped_cosine_bwd(interp, g, sel, selT, pairs, chunk_c, Cc, S, V,
                        eps=1e-8):
    """In-kernel analytic backward of the pair-mean grouped cosine.

    interp: V-list of (Cc,S) f32 per-view interpolations; g: (G,S) cotangent
    of the pair-mean output; sel/selT: the (G,chunk)/(chunk,G) group
    selection matmuls. Returns V-list of d_interp (Cc,S) f32. Shared by the
    per-ray banded VJP and the block-banded VJP."""
    dcos = g * (1.0 / len(pairs))                                  # (G,S)
    # per-chunk cotangent accumulators (python-level, concatenated once at
    # the end — avoids zero-width slices that Mosaic rejects)
    n_chunks = Cc // chunk_c
    d_chunks = [[jnp.zeros((chunk_c, S), jnp.float32)
                 for _ in range(n_chunks)] for _ in range(V)]
    for (i, j) in pairs:
        ca, cb = j - 1, i
        fa = interp[i][ca * chunk_c:(ca + 1) * chunk_c]            # (chunk,S)
        fb = interp[j][cb * chunk_c:(cb + 1) * chunk_c]
        dots = jnp.dot(sel, fa * fb, preferred_element_type=jnp.float32)
        na2 = jnp.dot(sel, fa * fa, preferred_element_type=jnp.float32)
        nb2 = jnp.dot(sel, fb * fb, preferred_element_type=jnp.float32)
        sna = jnp.sqrt(na2)
        snb = jnp.sqrt(nb2)
        na = jnp.maximum(sna, eps)                                 # (G,S)
        nb = jnp.maximum(snb, eps)
        inv_ab = 1.0 / (na * nb)
        d_dots = dcos * inv_ab                                     # (G,S)
        # d na = -dcos * dots / (na^2 nb); through max: only when sna>eps
        d_na2 = jnp.where(sna > eps,
                          -dcos * dots * inv_ab / na * (0.5 / na), 0.0)
        d_nb2 = jnp.where(snb > eps,
                          -dcos * dots * inv_ab / nb * (0.5 / nb), 0.0)
        d_dots_c = jnp.dot(selT, d_dots,
                           preferred_element_type=jnp.float32)     # (chunk,S)
        d_na2_c = jnp.dot(selT, d_na2,
                          preferred_element_type=jnp.float32)
        d_nb2_c = jnp.dot(selT, d_nb2,
                          preferred_element_type=jnp.float32)
        d_fa = d_dots_c * fb + 2.0 * d_na2_c * fa
        d_fb = d_dots_c * fa + 2.0 * d_nb2_c * fb
        d_chunks[i][ca] = d_chunks[i][ca] + d_fa
        d_chunks[j][cb] = d_chunks[j][cb] + d_fb
    return [jnp.concatenate(d_chunks[v], axis=0) for v in range(V)]


def _banded_cosine_bwd_kernel(*refs, V: int, S: int, kt: int, Cc: int,
                              chunk_c: int, n_groups: int, pairs,
                              block_rays: int):
    """Backward of the banded cosine query w.r.t. the gathered tap rows.

    refs: V rows refs (BR,kt,4Cc) f32, rank_ref (V,BR,1,S) i32, wv_ref
    (V,BR,4,S) f32, g_ref (BR,G,S) f32 cotangent of the pair-mean cosine,
    then V output refs d_rows (BR,kt,4Cc) f32.

    Recomputes the interpolation (cheaper than saving [R,S,Cc] residuals),
    applies the analytic grouped-cosine backward, and pushes d_interp back
    through the four tap matmuls (contracting the lane/sample dim — A B^T,
    also MXU-native)."""
    rows_refs = refs[:V]
    rank_ref, wv_ref, g_ref = refs[V:V + 3]
    out_refs = refs[V + 3:]
    Cg = chunk_c // n_groups
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (kt, S), 0)
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (n_groups, chunk_c), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (n_groups, chunk_c), 1)
    sel = (c_iota // Cg == g_iota).astype(jnp.float32)             # (G,chunk)
    selT = sel.T                                                   # (chunk,G)
    eps = 1e-8

    for b in range(block_rays):
        interp, Wts = [], []
        for v in range(V):
            rank_b = rank_ref[v, b]
            wv_b = wv_ref[v, b]
            onehot = (k_iota == rank_b).astype(jnp.float32)        # (kt,S)
            rows_b = rows_refs[v][b]                               # (kt,4Cc) f32
            acc = None
            Wv = []
            for t in range(4):
                Wt = onehot * wv_b[t:t + 1]                        # (kt,S)
                Wv.append(Wt)
                part = jax.lax.dot_general(
                    rows_b[:, t * Cc:(t + 1) * Cc], Wt,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)            # (Cc,S)
                acc = part if acc is None else acc + part
            interp.append(acc)
            Wts.append(Wv)

        d_interp = _grouped_cosine_bwd(interp, g_ref[b], sel, selT, pairs,
                                       chunk_c, Cc, S, V, eps)

        for v in range(V):
            parts = []
            for t in range(4):
                # d_rows_t[k,c] = sum_s Wt[k,s] d_interp[c,s]
                parts.append(jax.lax.dot_general(
                    Wts[v][t], d_interp[v], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))           # (kt,Cc)
            out_refs[v][b] = jnp.concatenate(parts, axis=1)        # (kt,4Cc)


def _banded_rows_bwd(rows_views, rank, wvals, g, *, chunk_c, n_groups, pairs,
                     block_rays=4, interpret=None):
    """g: [R,S,G] cotangent -> V-list of d_rows [R,kt,4Cc] f32.

    block_rays=4: the bwd holds f32 rows AND f32 d_rows per block (the fwd's
    int8/bf16 inputs are f32 here), so 8-ray blocks overflow the 16MB VMEM
    budget at kt=48."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    V = len(rows_views)
    R, kt, C4 = rows_views[0].shape
    Cc = C4 // 4
    S = rank.shape[-1]
    # f32 rows in AND f32 d_rows out, both double-buffered
    block_rays = _fit_block_rays(block_rays, 4 * V * kt * C4 * 4)

    pad = (-R) % block_rays
    if pad:
        rows_views = [jnp.pad(r, ((0, pad), (0, 0), (0, 0))) for r in rows_views]
        rank = jnp.pad(rank, ((0, 0), (0, pad), (0, 0)))
        wvals = jnp.pad(wvals, ((0, 0), (0, pad), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, pad), (0, 0), (0, 0)))
    Rp = R + pad
    rankT = rank[:, :, None, :]
    wvT = jnp.swapaxes(wvals, -1, -2)
    gT = jnp.swapaxes(g, -1, -2)                                   # [Rp,G,S]

    kernel = functools.partial(
        _banded_cosine_bwd_kernel, V=V, S=S, kt=kt, Cc=Cc, chunk_c=chunk_c,
        n_groups=n_groups, pairs=pairs, block_rays=block_rays)

    rows_specs = [pl.BlockSpec((block_rays, kt, C4), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM) for _ in range(V)]
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((Rp, kt, C4), jnp.float32)
                        for _ in range(V)),
        grid=(Rp // block_rays,),
        in_specs=rows_specs + [
            pl.BlockSpec((V, block_rays, 1, S), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V, block_rays, 4, S), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rays, n_groups, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((block_rays, kt, C4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM) for _ in range(V)),
        interpret=interpret,
    )(*rows_views, rankT, wvT, gT)
    return [o[:R] for o in outs]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def banded_cosine_scale_trainable(vfeats, grids, kt, n_groups, pairs,
                                  block_rays=8):
    """Differentiable banded cosine query for f32 training tables.

    Same primal as `banded_cosine_scale` (no dequant scales); the custom
    backward recomputes the gather + interpolation, runs the analytic
    grouped-cosine backward in VMEM, and scatter-adds only the <=kt deduped
    tap rows per ray into the table gradient (~2.7x fewer scattered rows
    than the direct path's backward). The sample grid is treated as
    non-differentiable (it depends only on camera data)."""
    return banded_cosine_scale(vfeats, grids, kt=kt, n_groups=n_groups,
                               pairs=pairs, block_rays=block_rays)


def _banded_trainable_fwd(vfeats, grids, kt, n_groups, pairs, block_rays):
    out = banded_cosine_scale(vfeats, grids, kt=kt, n_groups=n_groups,
                              pairs=pairs, block_rays=block_rays)
    return out, (vfeats, grids)


def _banded_trainable_bwd(kt, n_groups, pairs, block_rays, res, g):
    vfeats, grids = res
    _, V, H, W, C4 = vfeats.shape
    Cc = C4 // 4
    chunk_c = Cc // (V - 1)
    _, _, R, S, _ = grids.shape

    taps_l, rank_l, wv_l = [], [], []
    for v in range(V):
        taps, rank, wvals = _cells_ranks_weights(grids[v, 0], H, W, kt)
        taps_l.append(taps)
        rank_l.append(rank)
        wv_l.append(wvals)
    taps = jnp.stack(taps_l)
    rank = jnp.stack(rank_l)
    wvals = jnp.stack(wv_l)

    flat = vfeats[0].reshape(V, H * W, C4).astype(jnp.float32)
    rows_views = [jnp.take_along_axis(
        flat[v], taps[v].reshape(R * kt)[:, None], axis=0,
        mode="promise_in_bounds").reshape(R, kt, C4) for v in range(V)]

    d_rows = _banded_rows_bwd(rows_views, rank, wvals, g[0],
                              chunk_c=chunk_c, n_groups=n_groups, pairs=pairs)

    d_flat = []
    for v in range(V):
        if SCATTER_IMPL == "segsum":
            dv = scatter_rows_sum(taps[v].reshape(R * kt),
                                  d_rows[v].reshape(R * kt, C4), H * W)
        else:
            # plain scatter-add: pre-sorting the indices (argsort + row
            # permute for indices_are_sorted=True) measured WORSE
            # (+2ms/step) — the permute costs more than the sorted scatter
            # saves when duplicates remain
            dv = jnp.zeros((H * W, C4), jnp.float32).at[
                taps[v].reshape(R * kt)].add(d_rows[v].reshape(R * kt, C4),
                                             mode="promise_in_bounds")
        d_flat.append(dv)
    d_vfeats = jnp.stack(d_flat).reshape(1, V, H, W, C4).astype(vfeats.dtype)
    return d_vfeats, jnp.zeros_like(grids)


banded_cosine_scale_trainable.defvjp(_banded_trainable_fwd,
                                     _banded_trainable_bwd)
