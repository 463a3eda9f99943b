"""On-hardware convergence run: overfit the in-repo synthetic scene on the
real TPU chip (the device-side counterpart of tests/test_convergence.py,
which pins the CPU numbers).

The full optimizer/schedule/clip stack (AdamW groups, OneCycleLR, encoder
grad clip) trains on-device and the production renderer scores a held-out
view. CPU reference points (seed 0, S=32): 22.7 dB @ 100 steps, 24.0 @ 150,
31.4 @ 200.

Usage: python tools/convergence_tpu.py [--steps 200] [--sample_intvs 32]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--sample_intvs", type=int, default=32)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from matchnerf_tpu.data.synth import make_scene_views
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    from matchnerf_tpu.renderer import Renderer
    from matchnerf_tpu.train_step import build_optimizer, make_train_step
    from matchnerf_tpu.utils import DotDict
    from matchnerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    H, W, N_RAYS = 32, 48, 256
    cfg = ge._tiny_cfg(n_layers=2, sample_intvs=args.sample_intvs)
    cfg = DotDict(dict(cfg))
    # 2x3-token windows: below every Pallas attention kernel's min shape
    # ('auto' would pick flash on TPU and trip on the degenerate window)
    cfg.encoder.attention_backend = "xla"
    cfg.nerf.rand_rays_train = N_RAYS
    cfg.optim = DotDict({
        "lr_enc": 2e-4, "lr_dec": 5e-3, "clip_enc": 1.0,
        "algo": DotDict({"type": "AdamW", "weight_decay": 0.0}),
        "sched": DotDict({"type": "OneCycleLR", "pct_start": 0.1})})

    print(f"# backend={jax.default_backend()} steps={args.steps} "
          f"S={args.sample_intvs}")
    v = make_scene_views(W, H)
    batch = {
        "images": jnp.asarray(v["images"][None]),
        "extrinsics": jnp.asarray(v["w2cs"][None]),
        "intrinsics": jnp.asarray(v["intrinsics"][None]),
        "near_fars": jnp.asarray(v["near_fars"][None]),
        "tgt_c2w": jnp.asarray(v["c2ws"][None, -1, :3, :]),
    }
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    tx, _ = build_optimizer(cfg, total_steps=args.steps)
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx, H, W, N_RAYS)

    rng = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for it in range(args.steps):
        rng, k = jax.random.split(rng)
        params, opt_state, losses = step(params, opt_state, batch, k)
        if it == 0 or (it + 1) % 50 == 0:
            print(f"# step {it + 1:4d}: loss {float(losses['all']):.5f}")
    wall = time.perf_counter() - t0
    print(f"# {args.steps} steps in {wall:.1f}s wall (incl. compile + relay "
          "dispatch; device step time is measured by trace_train, not here)")

    poses = {
        "tgt": {"extrinsics": np.asarray(v["w2cs"][None, -1, :3, :]),
                "intrinsics": np.asarray(v["intrinsics"][None, -1]),
                "near_fars": np.asarray(v["near_fars"][None, -1])},
        "ref": {"extrinsics": np.asarray(v["w2cs"][None, :3, :3, :]),
                "intrinsics": np.asarray(v["intrinsics"][None, :3]),
                "near_fars": np.asarray(v["near_fars"][None, :3])},
    }
    cfg.nerf.rand_rays_test = 1024
    r = Renderer(cfg)
    ref_images = jnp.asarray(v["images"][None, :3])
    feats = r.encode(params, ref_images)
    out = r.render_by_slices(params, poses, ref_images, feats, H, W)
    pred = np.asarray(out["rgb"][0]).reshape(H, W, 3)
    mse = float(np.mean((pred - v["images"][-1]) ** 2))
    psnr = -10 * np.log10(mse)
    print(f"CONVERGENCE_TPU: held-out view PSNR {psnr:.2f} dB "
          f"after {args.steps} steps")


if __name__ == "__main__":
    main()
