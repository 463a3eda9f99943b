"""Wall-clock full-image eval through the PRODUCTION Renderer.render_by_slices
at DTU shapes — includes encoder, table build, per-pose bucket measurement,
relay dispatch overhead, and host transfers (everything bench.py's marginal
device slope deliberately excludes).

Usage: python tools/bench_image.py [--rays 8192] [--dispatch 4] [--images 2]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--dispatch", type=int, default=4)
    ap.add_argument("--images", type=int, default=2)
    ap.add_argument("--block", type=int, default=1)
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    from matchnerf_tpu.renderer import Renderer, extract_poses
    from matchnerf_tpu.utils import DotDict

    cfg = ge._tiny_cfg(n_layers=6, sample_intvs=128)
    cfg = DotDict(dict(cfg))
    cfg.precision = DotDict({"cond_sample_dtype": "int8",
                             "color_sample_dtype": "uint8",
                             "encoder_compute_dtype": "bfloat16",
                             "banded_kernel": True,
                             "block_kernel": bool(args.block),
                             "decoder_kernel": True})
    cfg.nerf.rand_rays_test = args.rays
    cfg.nerf.max_rays_per_slice = args.rays
    cfg.nerf.slices_per_dispatch = args.dispatch
    B, H, W = 1, 512, 640

    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    d = ge._synthetic_inputs(cfg, B, H, W, R=16)
    poses = extract_poses({"extrinsics": d["poses"], "intrinsics": d["intr"],
                           "near_fars": d["near_fars"]})
    ref_images = jnp.asarray(d["images"][:, :3])

    r = Renderer(cfg)
    feats = r.encode(params, ref_images)
    tables = r.build_tables(ref_images, feats)

    # warm/compile
    out = r.render_by_slices(params, poses, ref_images, feats, H, W,
                             tables=tables)
    times = []
    stages_best = None
    for _ in range(args.images):
        t0 = time.perf_counter()
        feats = r.encode(params, ref_images)
        jax.block_until_ready(feats)
        t1 = time.perf_counter()
        tables = r.build_tables(ref_images, feats)
        jax.block_until_ready(tables["view_feats"])
        t2 = time.perf_counter()
        out = r.render_by_slices(params, poses, ref_images, feats, H, W,
                                 tables=tables)
        t3 = time.perf_counter()
        times.append(t3 - t0)
        if stages_best is None or t3 - t0 < min(times[:-1] or [1e9]):
            stages_best = (t1 - t0, t2 - t1, t3 - t2)
    t = min(times)
    print(f"rays/slice={args.rays} dispatch={args.dispatch} "
          f"block={args.block}: {t:.2f}s/image = {H*W/t/1000:.1f}k rays/s "
          f"(enc {stages_best[0]:.2f}s tables {stages_best[1]:.2f}s "
          f"render {stages_best[2]:.2f}s; min of {args.images})")
    assert np.isfinite(out["rgb"]).all()


if __name__ == "__main__":
    main()
