"""Supercell block-union color kernel (ops/pallas_color.py): table build,
union measurement, kernel parity vs the packed-gather path, and the
renderer-level production-path equivalence with the fallback."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from matchnerf_tpu.ops.grid_sample import grid_sample_2d_packed, pack_2x2
from matchnerf_tpu.ops.pallas_color import (SC, WIN, ROW_CH, bucket_color_ut,
                                            build_supercell_colors,
                                            color_union_size,
                                            supercell_color_sample,
                                            _supercell_cells_weights)


def test_build_supercell_colors_layout():
    rng = np.random.default_rng(0)
    H, W = 37, 42                           # deliberately not SC multiples
    img = rng.integers(0, 256, (2, H, W, 3), dtype=np.uint8)
    tab = np.asarray(build_supercell_colors(jnp.asarray(img)))
    Hs, Ws = -(-H // SC), -(-W // SC)
    assert tab.shape == (2, Hs, Ws, ROW_CH)
    pad = np.pad(img, ((0, 0), (0, SC * Hs + 1 - H), (0, SC * Ws + 1 - W),
                       (0, 0)), mode="edge")
    for (n, sy, sx) in [(0, 0, 0), (1, Hs - 1, Ws - 1), (0, 3, 7),
                        (1, Hs - 1, 2), (0, 5, Ws - 1)]:
        for a in range(WIN):
            for b in range(WIN):
                got = tab[n, sy, sx, a * 16 + b * 3:a * 16 + b * 3 + 3]
                want = pad[n, SC * sy + a, SC * sx + b]
                np.testing.assert_array_equal(got, want)
        # the padding slot of each window row is zero
        assert (tab[n, sy, sx, np.arange(WIN) * 16 + 15] == 0).all()


def test_color_union_size_exact_vs_numpy():
    rng = np.random.default_rng(1)
    H, W = 64, 96
    R, S = 32, 16
    # smooth-ish grids so blocks share supercells, plus out-of-range tails
    base = rng.uniform(-1.2, 1.2, (R // 8, 1, S, 2)).astype(np.float32)
    drift = np.linspace(0, 0.05, 8, dtype=np.float32)[None, :, None, None]
    grids = (base + drift).reshape(R, S, 2)
    got = int(color_union_size(jnp.asarray(grids), H, W, block_rays=8))

    cell, _, _, _, _ = _supercell_cells_weights(jnp.asarray(grids), H, W)
    cell = np.asarray(cell).reshape(R // 8, 8 * S)
    want = max(len(np.unique(blk)) for blk in cell)
    assert got == want, (got, want)


def test_bucket_color_ut():
    assert bucket_color_ut(1) == 48
    assert bucket_color_ut(48) == 48
    assert bucket_color_ut(49) == 64
    assert bucket_color_ut(320) == 320
    assert bucket_color_ut(321) is None


@pytest.mark.parametrize("R", [64, 60])     # 60 exercises the ray padding
def test_supercell_sample_matches_packed(R):
    rng = np.random.default_rng(2)
    V, H, W, S = 3, 48, 80, 16
    img = rng.integers(0, 256, (V, H, W, 3), dtype=np.uint8)
    tab_sc = build_supercell_colors(jnp.asarray(img))[None]        # [1,V,...]
    packed = pack_2x2(jnp.asarray(img).astype(jnp.float32))        # [V,H,W,12]

    # block-coherent grids with border-clamp cases (|coord| slightly > 1)
    base = rng.uniform(-1.1, 1.1, (V, (R + 7) // 8, 1, S, 2)).astype(np.float32)
    drift = np.linspace(0, 0.03, 8, dtype=np.float32)[None, None, :, None, None]
    grids = (base[:, :, None] + drift).reshape(V, -1, S, 2)[:, :R]
    grids_k = jnp.asarray(grids)[:, None]                          # [V,1,R,S,2]

    # ut from the exact measurement (on the padded ray count)
    gp = jnp.asarray(np.pad(grids, ((0, 0), (0, (-R) % 8), (0, 0), (0, 0)),
                            mode="edge"))
    ut = bucket_color_ut(max(int(color_union_size(gp[v], H, W))
                             for v in range(V)))
    assert ut is not None

    got = supercell_color_sample(tab_sc, grids_k, H, W, ut=ut)     # [V,1,R,S,3]
    want = jnp.stack([grid_sample_2d_packed(packed[v:v + 1],
                                            grids_k[v])
                      for v in range(V)], axis=0)                  # [V,1,R,S,3]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=0)


def test_render_by_slices_color_kernel_matches_packed():
    """Production eval stack with the supercell color kernel vs the same
    stack with the packed color gather: near-identical images, and the
    per-pose prep must actually produce a color bucket (no silent
    fallback)."""
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

    def run(color_kernel):
        c = DotDict(dict(cfg))
        c.precision = DotDict({"cond_sample_dtype": "float32",
                               "color_sample_dtype": "uint8",
                               "banded_kernel": True, "block_kernel": True,
                               "decoder_kernel": True,
                               "color_block_kernel": color_kernel})
        r = Renderer(c)
        feats = r.encode(params, ref_images)
        tables = r.build_tables(ref_images, feats)
        if color_kernel:
            assert tables.get("colors_sc") is not None
            scale_hws = [(v.shape[2], v.shape[3])
                         for v in tables["view_feats"]]
            _, _, cut = r._pose_prep(poses, poses["tgt"], scale_hws, H, W,
                                     measure_color=True)
            assert cut is not None, "color union bucket unexpectedly overflowed"
        else:
            assert tables.get("colors_sc") is None
        return r.render_by_slices(params, poses, ref_images, feats, H, W,
                                  tables=tables)

    out_packed = run(False)
    out_sc = run(True)
    np.testing.assert_allclose(out_sc["rgb"], out_packed["rgb"],
                               atol=2e-3, rtol=0)
    np.testing.assert_allclose(out_sc["opacity"], out_packed["opacity"],
                               atol=2e-3, rtol=0)


def test_supercell_sample_tiny_union_bucket():
    """All rays in one supercell: the smallest bucket must work and unused
    union slots must contribute nothing."""
    rng = np.random.default_rng(3)
    V, H, W, R, S = 2, 32, 32, 8, 8
    img = rng.integers(0, 256, (V, H, W, 3), dtype=np.uint8)
    tab_sc = build_supercell_colors(jnp.asarray(img))[None]
    packed = pack_2x2(jnp.asarray(img).astype(jnp.float32))
    grids = rng.uniform(-0.02, 0.02, (V, 1, R, S, 2)).astype(np.float32)
    got = supercell_color_sample(jnp.asarray(tab_sc), jnp.asarray(grids),
                                 H, W, ut=48)
    want = jnp.stack([grid_sample_2d_packed(packed[v:v + 1],
                                            jnp.asarray(grids)[v])
                      for v in range(V)], axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=0)
