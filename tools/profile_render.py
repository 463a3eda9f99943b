"""Developer profiling tool: reliable on-device timing of render stages.

The axon relay makes per-dispatch host timing unreliable, so every variant is
wrapped in a `lax.scan` of K iterations inside ONE jitted call, with the ray
coordinates chained through the carry (non-foldable dependency) — wall time /
K is then true device time.

Usage: python tools/profile_render.py [--variant all] [--rays 8192]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--rays", type=int, default=8192)
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--stages", type=str, default="render,cond,dec,enc")
    parser.add_argument("--feat_dtype", type=str, default="float32")
    parser.add_argument("--packed", action="store_true",
                        help="use 2x2-packed sampling tables")
    parser.add_argument("--fused", action="store_true",
                        help="use the fused Pallas interp+cosine kernel")
    parser.add_argument("--enc_dtype", type=str, default="float32",
                        help="encoder compute dtype (mixed-precision policy)")
    parser.add_argument("--banded_kt", type=int, default=0,
                        help="banded-gather taps/ray for render/cond stages "
                             "(0 = direct gather; timing-only, skips the "
                             "host bound check)")
    parser.add_argument("--remat", action="store_true",
                        help="remat encoder transformer layers")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from matchnerf_tpu import camera
    from matchnerf_tpu.models.decoder.cond_nerf import apply_cond_nerf, composite
    from matchnerf_tpu.models.matchnerf import (encode, init_matchnerf,
                                                query_cond_info, render_rays,
                                                sample_depth)

    from matchnerf_tpu.utils import DotDict

    cfg = ge._tiny_cfg(n_layers=6, sample_intvs=128)
    cfg.precision = DotDict({
        "cond_sample_dtype": args.feat_dtype,
        "encoder_compute_dtype": args.enc_dtype,
        "remat_encoder": bool(args.remat),
        "fused_cosine": bool(args.fused),
    })
    B, H, W, R = 1, 512, 640, args.rays
    K = args.iters
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    d = ge._synthetic_inputs(cfg, B, H, W, R)
    images = jnp.asarray(d["images"])
    ref = images[:, :3]
    poses = jnp.asarray(d["poses"])
    intr = jnp.asarray(d["intr"])
    nf = jnp.asarray(d["near_fars"])
    tgt_c2w = jnp.asarray(d["tgt_c2w"])
    pix = jnp.asarray(d["pix"])

    feat_dtype = jnp.dtype(args.feat_dtype)
    enc_fn = jax.jit(lambda p, x: encode(p, cfg, x))
    feats_f32 = enc_fn(params, ref)
    feats = [f.astype(feat_dtype if feat_dtype != jnp.int8 else jnp.float32)
             for f in feats_f32]
    tables = None
    if args.packed:
        from matchnerf_tpu.models.matchnerf import prepare_sampling_tables
        tables = jax.jit(lambda fs, im: prepare_sampling_tables(
            cfg, fs, im, feat_dtype=feat_dtype))(feats_f32, ref)

    def scan_time(name, body):
        # feats/tables passed as explicit operands so they don't get baked
        # into the HLO as giant literals (the remote-compile payload limit)
        @jax.jit
        def run(pix0, params, feats, tables):
            def step(carry, _):
                out = body(carry, params, feats, tables)
                carry = pix + 1e-30 * out[0, :2].reshape(1, 1, 2)
                return carry, ()
            carry, _ = jax.lax.scan(step, pix0, None, length=K)
            return carry
        out = run(pix, params, feats, tables)   # compile
        np.asarray(out).sum()
        t0 = time.time()
        out = run(pix, params, feats, tables)
        np.asarray(out).sum()
        dt = (time.time() - t0) / K
        print(f"{name:12s} {dt*1000:8.1f} ms/iter   {R/dt:10.0f} rays/s", flush=True)
        return dt

    stages = args.stages.split(",")

    banded_kt = (args.banded_kt, args.banded_kt) if args.banded_kt else None

    def full_render(pix_xy, params, feats, tables):
        out = render_rays(params, cfg, pix_xy, tgt_intr=intr[:, -1], tgt_c2w=tgt_c2w,
                          tgt_near_far=nf[:, -1], ref_w2c=poses[:, :-1, :3, :],
                          ref_intr=intr[:, :-1], ref_near_far=nf[:, :-1],
                          ref_images=ref, pair_feats=feats, img_h=H, img_w=W,
                          tables=tables, fused_cosine=args.fused,
                          banded_kt=banded_kt)
        return out["rgb"].reshape(-1, 3)[:4]

    def pts_of(pix_xy):
        center, ray = camera.get_center_and_ray(pix_xy, intr[:, -1], tgt_c2w)
        depth = sample_depth(cfg, nf[:, -1], B, R)
        return camera.get_3d_points_from_depth(center, ray, depth, True), ray, depth

    def cond_stage(pix_xy, params, feats, tables):
        pts, _, _ = pts_of(pix_xy)
        cond, ndc0 = query_cond_info(cfg, pts, poses[:, :-1, :3, :], intr[:, :-1],
                                     nf[:, :-1], ref, feats, H, W, tables=tables,
                                     fused_cosine=args.fused,
                                     banded_kt=banded_kt)
        return (cond["feat_info"].sum() + cond["color_info"].sum()
                + ndc0.sum()).reshape(1, 1) * jnp.ones((4, 3))

    # decoder stage with precomputed cond (outside the loop)
    pts0, ray0, depth0 = jax.jit(pts_of)(pix)
    cond0, ndc00 = jax.jit(lambda p: query_cond_info(
        cfg, pts_of(p)[0], poses[:, :-1, :3, :], intr[:, :-1], nf[:, :-1],
        ref, feats, H, W))(pix)

    def dec_stage(pix_xy, params, feats, tables):
        scale = 1.0 + 1e-30 * pix_xy[0, 0, 0]
        ru = ray0 / jnp.linalg.norm(ray0, axis=-1, keepdims=True)
        ru = jnp.broadcast_to(
            (ru @ jnp.swapaxes(poses[:, 0, :3, :3], -1, -2))[:, :, None, :],
            (B, R, cfg.nerf.sample_intvs, 3))
        rgb, dens = apply_cond_nerf(params["nerf_dec"], cfg, ndc00 * scale,
                                    ray_unit=ru, cond_info=cond0)
        out = composite(cfg, ray0, rgb, dens, depth0)[0]
        return out.reshape(-1, 3)[:4]

    def enc_stage(pix_xy, params, feats, tables):
        scale = 1.0 + 1e-30 * pix_xy[0, 0, 0]
        fs = encode(params, cfg, ref * scale)
        return fs[0].reshape(-1)[:12].reshape(4, 3)

    if "train" in stages:
        import functools

        from matchnerf_tpu.train_step import build_optimizer, make_train_step

        tx, _ = build_optimizer(cfg, total_steps=1000)
        step = make_train_step(cfg, tx, H, W, n_rays=1024)
        opt0 = tx.init(params)
        batch = {"images": images, "extrinsics": poses, "intrinsics": intr,
                 "near_fars": nf, "tgt_c2w": tgt_c2w}
        rng0 = jax.random.PRNGKey(0)

        @functools.partial(jax.jit, static_argnums=0)
        def run_train(K, params0, opt_state0, batch):
            def body(carry, _):
                p, o = carry
                p, o, loss = step(p, o, batch, rng0)
                return (p, o), loss["all"]
            (_, _), losses = jax.lax.scan(body, (params0, opt_state0), None,
                                          length=K)
            return losses

        K1, K2 = 2, 5
        np.asarray(run_train(K1, params, opt0, batch))
        np.asarray(run_train(K2, params, opt0, batch))
        t0 = time.time(); np.asarray(run_train(K1, params, opt0, batch)); t1 = time.time()
        t2 = time.time(); np.asarray(run_train(K2, params, opt0, batch)); t3 = time.time()
        dt = ((t3 - t2) - (t1 - t0)) / (K2 - K1)
        print(f"{'train_step':12s} {dt*1000:8.1f} ms/iter   "
              f"(enc_dtype={args.enc_dtype}, remat={args.remat})", flush=True)

    if "render" in stages:
        scan_time("render", full_render)
    if "cond" in stages:
        scan_time("cond_query", cond_stage)
    if "dec" in stages:
        scan_time("decoder", dec_stage)
    if "enc" in stages:
        scan_time("encoder", enc_stage)


if __name__ == "__main__":
    main()
