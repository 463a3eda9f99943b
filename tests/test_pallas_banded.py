"""Parity tests for the banded interp+cosine Pallas megakernel
(ops/pallas_banded.py) against the direct packed-gather path.

Runs in interpreter mode on the CPU backend (conftest forces cpu); the
numerics it checks are the ones the TPU build uses, modulo MXU rounding.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matchnerf_tpu.models.gmflow.gmflow import pair_index_lists
from matchnerf_tpu.models.matchnerf import _grouped_cosine, query_cond_info
from matchnerf_tpu.ops.grid_sample import grid_sample_2d_packed, pack_2x2
from matchnerf_tpu.ops.pallas_banded import banded_cosine_scale


def _coherent_grids(rng, V, R, S):
    """Monotone straight segments per ray (the epipolar structure the banded
    path relies on)."""
    starts = rng.uniform(-0.9, 0.3, (V, R, 2))
    ends = starts + rng.uniform(0.05, 0.5, (V, R, 2))
    t = np.linspace(0, 1, S)[None, None, :, None]
    grids = starts[:, :, None, :] * (1 - t) + ends[:, :, None, :] * t
    return jnp.asarray(grids.astype(np.float32))[:, None]          # [V,1,R,S,2]


def _reference_cosine(vfeats, grids, C, G, pairs, scales=None):
    V = vfeats.shape[1]
    sampled = []
    for v in range(V):
        s = grid_sample_2d_packed(vfeats[:, v], grids[v]).astype(jnp.float32)
        if scales is not None:
            s = s * scales[:, v][:, None, None, :]
        sampled.append(s)
    per_pair = []
    for (i, j) in pairs:
        ca, cb = j - 1, i
        fa = sampled[i][..., ca * C:(ca + 1) * C]
        fb = sampled[j][..., cb * C:(cb + 1) * C]
        per_pair.append(_grouped_cosine(fa, fb, G))
    return jnp.stack(per_pair, 0).mean(0)


def test_banded_kernel_f32_matches_direct():
    rng = np.random.default_rng(0)
    V, H, W, C = 3, 32, 40, 16
    R, S, G = 24, 32, 4
    Cc = (V - 1) * C
    feat = rng.normal(0, 1, (V, H, W, Cc)).astype(np.float32)
    packed = jax.vmap(lambda f: pack_2x2(f[None])[0])(jnp.asarray(feat))[None]
    grids = _coherent_grids(rng, V, R, S)
    pairs = pair_index_lists(V)

    ref = _reference_cosine(packed, grids, C, G, pairs)
    out = banded_cosine_scale(packed, grids, kt=48, n_groups=G, pairs=pairs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_banded_kernel_int8_dequant():
    rng = np.random.default_rng(1)
    V, H, W, C = 3, 24, 24, 16
    R, S, G = 16, 32, 2
    Cc = (V - 1) * C
    feat = rng.normal(0, 1, (V, H, W, Cc)).astype(np.float32)
    amax = np.abs(feat).max(axis=(1, 2), keepdims=True)
    scale = np.maximum(amax, 1e-12) / 127.0
    q = np.clip(np.round(feat / scale), -127, 127).astype(np.int8)
    packed = jax.vmap(lambda f: pack_2x2(f[None])[0])(jnp.asarray(q))[None]
    scales = jnp.asarray(scale[:, 0, 0])[None]                      # [1,V,Cc]
    grids = _coherent_grids(rng, V, R, S)
    pairs = pair_index_lists(V)

    ref = _reference_cosine(packed, grids, C, G, pairs, scales=scales)
    out = banded_cosine_scale(packed, grids, kt=48, n_groups=G, pairs=pairs,
                              dequant_scales=scales)
    # bf16 matmul weights: ~2^-9 relative on the folded bilinear weights
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-2)


def _int4_quantize_pack(feat):
    """feat [V,H,W,Cc] f32 -> (nibble-packed pack_2x2 table [1,V,H,W,2*Cc],
    scales [1,V,Cc], quantized values [V,H,W,Cc] f32 in int units)."""
    from matchnerf_tpu.ops.grid_sample import pack_int4_channels

    amax = np.abs(feat).max(axis=(1, 2), keepdims=True)
    scale = np.maximum(amax, 1e-12) / 7.0
    q = np.clip(np.round(feat / scale), -8, 7).astype(np.int32)
    nib = pack_int4_channels(jnp.asarray(q + 8))                   # [V,H,W,Cc/2]
    packed = jax.vmap(lambda f: pack_2x2(f[None])[0])(nib)[None]
    return packed, jnp.asarray(scale[:, 0, 0])[None], q.astype(np.float32)


def test_grid_sample_packed_int4_matches_dequantized():
    from matchnerf_tpu.ops.grid_sample import grid_sample_2d_packed_int4

    rng = np.random.default_rng(7)
    V, H, W, Cc = 3, 20, 24, 32
    feat = rng.normal(0, 2, (V, H, W, Cc)).astype(np.float32)
    packed, scales, q = _int4_quantize_pack(feat)
    grids = _coherent_grids(rng, V, 8, 16)

    packed_q = jax.vmap(lambda f: pack_2x2(f[None])[0])(jnp.asarray(q))[None]
    for v in range(V):
        ref = grid_sample_2d_packed(packed_q[:, v], grids[v]) \
            * scales[:, v][:, None, None, :]
        out = grid_sample_2d_packed_int4(packed[:, v], grids[v]) \
            .astype(jnp.float32) * scales[:, v][:, None, None, :]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-2, atol=1e-3)


def test_banded_kernel_int4_matches_dequantized_direct():
    """int4 nibble-packed kernel == reference cosine on the dequantized
    quantized table (tap selection and interpolation are exact; bf16 matmul
    rounding only)."""
    rng = np.random.default_rng(8)
    V, H, W, C = 3, 24, 24, 16
    R, S, G = 16, 32, 2
    Cc = (V - 1) * C
    feat = rng.normal(0, 1, (V, H, W, Cc)).astype(np.float32)
    packed, scales, q = _int4_quantize_pack(feat)
    grids = _coherent_grids(rng, V, R, S)
    pairs = pair_index_lists(V)

    packed_q = jax.vmap(lambda f: pack_2x2(f[None])[0])(jnp.asarray(q))[None]
    ref = _reference_cosine(packed_q, grids, C, G, pairs, scales=scales)
    out = banded_cosine_scale(packed, grids, kt=48, n_groups=G, pairs=pairs,
                              dequant_scales=scales)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-2)


def test_prepare_tables_int4_query_paths_agree():
    """prepare_sampling_tables(feat_dtype='int4') end to end: the direct
    unpacking path and the banded Pallas kernel agree on the same table."""
    import __graft_entry__ as ge
    from matchnerf_tpu.models.matchnerf import (encode, init_matchnerf,
                                                prepare_sampling_tables)

    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=24)
    B, H, W, R = 1, 32, 32, 12
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    d = ge._synthetic_inputs(cfg, B, H, W, R)
    ref = jnp.asarray(d["images"][:, :3])
    feats = encode(params, cfg, ref)
    tables = prepare_sampling_tables(cfg, feats, ref, feat_dtype="int4")
    assert all(t.dtype == jnp.uint8 for t in tables["view_feats"])
    assert all(s is not None for s in tables["view_feat_scales"])

    # straight per-ray segments (epipolar-coherent, as real ray samples are)
    prng = np.random.default_rng(3)
    start = prng.normal(0, 0.3, (B, R, 1, 3))
    step = prng.normal(0, 0.02, (B, R, 1, 3))
    t = np.arange(24).reshape(1, 1, 24, 1)
    pts = jnp.asarray((start + step * t).astype(np.float32))
    kwargs = dict(
        ref_w2c=jnp.asarray(d["poses"][:, :-1, :3, :]),
        ref_intr=jnp.asarray(d["intr"][:, :-1]),
        ref_near_far=jnp.asarray(d["near_fars"][:, :-1]),
        ref_images=ref, pair_feats=feats, img_h=H, img_w=W, tables=tables)
    cond_direct, _ = query_cond_info(cfg, pts, **kwargs)
    cond_banded, _ = query_cond_info(cfg, pts, banded_kt=(16, 16),
                                     banded_impl="pallas", **kwargs)
    np.testing.assert_allclose(np.asarray(cond_banded["feat_info"]),
                               np.asarray(cond_direct["feat_info"]),
                               atol=2e-2)


def test_banded_kernel_ragged_ray_padding():
    """R not divisible by block_rays pads and truncates correctly."""
    rng = np.random.default_rng(2)
    V, H, W, C = 3, 16, 16, 8
    R, S, G = 11, 16, 2
    Cc = (V - 1) * C
    feat = rng.normal(0, 1, (V, H, W, Cc)).astype(np.float32)
    packed = jax.vmap(lambda f: pack_2x2(f[None])[0])(jnp.asarray(feat))[None]
    grids = _coherent_grids(rng, V, R, S)
    pairs = pair_index_lists(V)

    ref = _reference_cosine(packed, grids, C, G, pairs)
    out = banded_cosine_scale(packed, grids, kt=32, n_groups=G, pairs=pairs,
                              block_rays=8)
    assert out.shape == (1, R, S, G)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_banded_trainable_grads_match_direct():
    """Custom-VJP banded query: gradients w.r.t. the f32 tables match
    autodiff through the direct packed path."""
    from matchnerf_tpu.ops.pallas_banded import banded_cosine_scale_trainable

    rng = np.random.default_rng(4)
    V, H, W, C = 3, 24, 28, 16
    R, S, G = 12, 24, 4
    Cc = (V - 1) * C
    feat = rng.normal(0, 1, (V, H, W, Cc)).astype(np.float32)
    packed = jax.vmap(lambda f: pack_2x2(f[None])[0])(jnp.asarray(feat))[None]
    grids = _coherent_grids(rng, V, R, S)
    pairs = tuple(pair_index_lists(V))
    gcot = jnp.asarray(rng.normal(0, 1, (1, R, S, G)).astype(np.float32))

    def loss_direct(vf):
        out = _reference_cosine(vf, grids, C, G, pairs)
        return jnp.vdot(out, gcot)

    def loss_banded(vf):
        out = banded_cosine_scale_trainable(vf, grids, 48, G, pairs, 8)
        return jnp.vdot(out, gcot)

    v_d, g_d = jax.value_and_grad(loss_direct)(packed)
    v_b, g_b = jax.value_and_grad(loss_banded)(packed)
    np.testing.assert_allclose(float(v_b), float(v_d), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_d),
                               atol=1e-4, rtol=1e-3)


def test_sharded_eval_with_kernels_matches_single_device():
    """render_by_slices under an 8-device CPU mesh (shard_map over rays) with
    the banded + decoder megakernels equals the unsharded render."""
    import __graft_entry__ as ge
    from jax.sharding import Mesh
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    from matchnerf_tpu.renderer import Renderer, extract_poses
    from matchnerf_tpu.utils import DotDict

    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=48)
    cfg = DotDict(dict(cfg))
    cfg.precision = DotDict({"cond_sample_dtype": "float32",
                             "banded_kernel": True, "decoder_kernel": True})
    H, W = 32, 32
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    d = ge._synthetic_inputs(cfg, 1, H, W, R=16)
    poses = extract_poses({"extrinsics": d["poses"], "intrinsics": d["intr"],
                           "near_fars": d["near_fars"]})
    ref_images = jnp.asarray(d["images"][:, :3])

    def run(mesh):
        r = Renderer(cfg, mesh=mesh)
        feats = r.encode(params, ref_images)
        tables = r.build_tables(ref_images, feats)
        assert r._banded_kt(poses, poses["tgt"], tables, H, W) is not None
        return r.render_by_slices(params, poses, ref_images, feats, H, W,
                                  tables=tables)

    out_single = run(None)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    out_mesh = run(mesh)
    np.testing.assert_allclose(out_mesh["rgb"], out_single["rgb"],
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_banded_train_grads_through_render_rays():
    """End-to-end training gradients (encoder+decoder params) through
    render_rays with the banded kernel vs the direct packed path."""
    import __graft_entry__ as ge
    from matchnerf_tpu.models.matchnerf import (encode, init_matchnerf,
                                                prepare_sampling_tables,
                                                render_rays)

    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=32)
    B, H, W, R = 1, 48, 48, 24
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    d = ge._synthetic_inputs(cfg, B, H, W, R)
    ref = jnp.asarray(d["images"][:, :3])
    tgt = jnp.asarray(d["images"][:, 3, :R // 2, 0, :])          # fake target

    kwargs = dict(
        pix_xy=jnp.asarray(d["pix"][:, :R // 2]),
        tgt_intr=jnp.asarray(d["intr"][:, -1]),
        tgt_c2w=jnp.asarray(d["tgt_c2w"]),
        tgt_near_far=jnp.asarray(d["near_fars"][:, -1]),
        ref_w2c=jnp.asarray(d["poses"][:, :-1, :3, :]),
        ref_intr=jnp.asarray(d["intr"][:, :-1]),
        ref_near_far=jnp.asarray(d["near_fars"][:, :-1]),
        img_h=H, img_w=W)

    def loss(p, banded_kt, banded_impl):
        feats = encode(p, cfg, ref)
        tables = prepare_sampling_tables(cfg, feats, ref)
        out = render_rays(p, cfg, ref_images=ref, pair_feats=feats,
                          tables=tables, banded_kt=banded_kt,
                          banded_impl=banded_impl, **kwargs)
        return jnp.mean((out["rgb"] - tgt) ** 2)

    v_d, g_d = jax.value_and_grad(loss)(params, None, "xla")
    v_b, g_b = jax.value_and_grad(loss)(params, (16, 16), "pallas")
    np.testing.assert_allclose(float(v_b), float(v_d), rtol=1e-5)
    flat_d = jax.tree_util.tree_leaves(g_d)
    flat_b = jax.tree_util.tree_leaves(g_b)
    for a, b in zip(flat_d, flat_b):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-6, rtol=2e-3)


def test_render_by_slices_banded_kernel_matches_direct():
    """End-to-end: full-image eval with precision.banded_kernel vs direct."""
    import __graft_entry__ as ge
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    from matchnerf_tpu.renderer import Renderer, extract_poses
    from matchnerf_tpu.utils import DotDict

    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=48)
    H, W = 32, 32
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    d = ge._synthetic_inputs(cfg, 1, H, W, R=16)
    poses = extract_poses({"extrinsics": d["poses"], "intrinsics": d["intr"],
                           "near_fars": d["near_fars"]})
    ref_images = jnp.asarray(d["images"][:, :3])
    engaged = {}

    def run(banded_kernel):
        c = DotDict(dict(cfg))
        c.precision = DotDict({"cond_sample_dtype": "float32",
                               "banded_kernel": banded_kernel})
        r = Renderer(c)
        feats = r.encode(params, ref_images)
        tables = r.build_tables(ref_images, feats)
        if banded_kernel:
            engaged["kt"] = r._banded_kt(poses, poses["tgt"], tables, H, W)
        return r.render_by_slices(params, poses, ref_images, feats, H, W,
                                  tables=tables)

    out_direct = run(False)
    out_banded = run(True)
    assert engaged["kt"] is not None and any(k for k in engaged["kt"]), \
        f"banded path did not engage: {engaged}"
    np.testing.assert_allclose(out_banded["rgb"], out_direct["rgb"],
                               rtol=1e-4, atol=1e-5)


def test_scatter_rows_sum_matches_scatter_add():
    """segsum scatter (sorted cumsum-diff, unique-index writes) == .at[].add."""
    from matchnerf_tpu.ops.pallas_banded import scatter_rows_sum

    rng = np.random.default_rng(11)
    for N, HW, C in [(1000, 64, 8), (4096, 512, 16), (7, 3, 4), (128, 1, 2),
                     (64, 4096, 8)]:
        taps = rng.integers(0, HW, N).astype(np.int32)
        rows = rng.standard_normal((N, C)).astype(np.float32)
        want = np.zeros((HW, C), np.float32)
        np.add.at(want, taps, rows)
        got = np.asarray(scatter_rows_sum(jnp.asarray(taps),
                                          jnp.asarray(rows), HW))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


def test_banded_trainable_bwd_segsum_matches_add():
    """Full trainable-banded backward with SCATTER_IMPL=segsum == add."""
    from matchnerf_tpu.ops import pallas_banded as pb

    rng = np.random.default_rng(12)
    V, H, W, C = 3, 24, 28, 16
    R, S, G = 12, 24, 4
    Cc = (V - 1) * C
    feat = rng.normal(0, 1, (V, H, W, Cc)).astype(np.float32)
    packed = jax.vmap(lambda f: pack_2x2(f[None])[0])(jnp.asarray(feat))[None]
    grids = _coherent_grids(rng, V, R, S)
    pairs = tuple(pair_index_lists(V))

    def loss(vf):
        out = pb.banded_cosine_scale_trainable(vf, grids, 48, G, pairs, 8)
        return jnp.sum(out * out)

    g_add = jax.grad(loss)(packed)
    old = pb.SCATTER_IMPL
    try:
        pb.SCATTER_IMPL = "segsum"
        g_seg = jax.grad(loss)(packed)
    finally:
        pb.SCATTER_IMPL = old
    np.testing.assert_allclose(np.asarray(g_seg), np.asarray(g_add),
                               atol=2e-5, rtol=1e-4)


def test_fit_block_rays_vmem_budget():
    """IBRNet-scale banding (kt=96, f32 C4=1024) must shrink the ray block
    below the 16MB scoped-vmem limit; DTU shapes keep their defaults."""
    from matchnerf_tpu.ops.pallas_banded import _fit_block_rays

    # fwd: 2x double-buffered rows, V=3
    per_ray = lambda kt, c4, b: 2 * 3 * kt * c4 * b
    assert _fit_block_rays(8, per_ray(48, 1024, 4)) == 8     # DTU f32 train
    assert _fit_block_rays(8, per_ray(96, 1024, 4)) == 4     # IBRNet f32
    assert _fit_block_rays(8, per_ray(48, 256, 1)) == 8      # eval int8
    # bwd: rows in + d_rows out, both f32 double-buffered
    per_ray_bwd = lambda kt: 4 * 3 * kt * 1024 * 4
    assert _fit_block_rays(4, per_ray_bwd(48)) == 4
    assert _fit_block_rays(4, per_ray_bwd(96)) == 2
    assert _fit_block_rays(8, 11 << 20) == 1                 # never 0


def test_banded_kernel_small_block_rays_matches_default():
    """A clamped (non-default) ray block must be numerically identical."""
    from matchnerf_tpu.ops.pallas_banded import banded_cosine_scale

    rng = np.random.default_rng(11)
    V, H, W, Cc, R, S, kt = 3, 12, 12, 8, 10, 8, 6
    vfeats = jnp.asarray(rng.standard_normal((1, V, H, W, 4 * Cc)),
                         jnp.float32)
    grids = jnp.asarray(rng.uniform(-0.9, 0.9, (V, 1, R, S, 2)), jnp.float32)
    pairs = [(0, 1), (0, 2), (1, 2)]
    a = banded_cosine_scale(vfeats, grids, kt=kt, n_groups=4, pairs=pairs,
                            block_rays=8)
    b = banded_cosine_scale(vfeats, grids, kt=kt, n_groups=4, pairs=pairs,
                            block_rays=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                               atol=1e-6)
