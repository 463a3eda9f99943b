"""Capture an XLA device trace of the training step at DTU train shapes
(640x512, 1024 rays, batch 1) and print the per-op cost breakdown.

Usage: python tools/trace_train.py [--encoder_dtype bfloat16] [--remat]
       [--top 30] [--dump_hlo /tmp/train_hlo.txt]
"""
import argparse
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--encoder_dtype", type=str, default="float32")
    parser.add_argument("--decoder_dtype", type=str, default="float32",
                        help="decoder_compute_dtype (bfloat16 = opt-in "
                             "mixed-precision width-W MLP)")
    parser.add_argument("--banded_kt", type=str, default="0",
                        help="route the cond query through the custom-VJP "
                             "banded kernel; a single int applies to every "
                             "scale, 'a,b' sets per-scale buckets (production "
                             "DTU banding is '32,48' — match bench.py's "
                             "'# banded_kt=' line)")
    parser.add_argument("--remat", action="store_true")
    parser.add_argument("--attention_backend", type=str, default="auto")
    parser.add_argument("--block_ut", type=int, default=0,
                        help="with --banded_kt: patch-sampled rays + the "
                             "trainable BLOCK kernel at this union bucket")
    parser.add_argument("--top", type=int, default=35)
    parser.add_argument("--dump_hlo", type=str, default="")
    parser.add_argument("--scatter", type=str, default=None,
                        help="table-gradient scatter impl for the banded "
                             "backward: add | segsum "
                             "(pallas_banded.SCATTER_IMPL)")
    parser.add_argument("--img_wh", type=str, default="640x512",
                        help="training image size WxH (ibrnet recipe: "
                             "1008x756 — the encoder's 756x1008->768x1024 "
                             "resize hack engages automatically)")
    parser.add_argument("--ray_sampler", type=str, default="permutation",
                        choices=["permutation", "topk"],
                        help="nerf.train_ray_sampler A/B (the 327k-element "
                             "permutation sort measured 0.8-1.9 ms/step)")
    parser.add_argument("--conv_format", type=str, default="NHWC",
                        choices=["NHWC", "NCHW"],
                        help="backbone conv/IN data layout "
                             "(encoder.conv_data_format A/B)")
    parser.add_argument("--preset", type=str, default=None, choices=["ibrnet"],
                        help="ibrnet: attn_splits [4] + density_maskfill + "
                             "raytrans_posenc + ELU ray transformer "
                             "(reference configs/train_ibrnet.yaml:5-14)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    if args.scatter:
        from matchnerf_tpu.ops import pallas_banded
        pallas_banded.SCATTER_IMPL = args.scatter

    import __graft_entry__ as ge
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    from matchnerf_tpu.train_step import build_optimizer, make_train_step
    from matchnerf_tpu.utils import DotDict
    from trace_render import parse_xplane

    cfg = ge._tiny_cfg(n_layers=6, sample_intvs=128)
    cfg = DotDict(dict(cfg))
    cfg.encoder = DotDict(dict(cfg.encoder))
    cfg.encoder.attention_backend = args.attention_backend
    cfg.encoder.conv_data_format = args.conv_format
    cfg.nerf = DotDict(dict(cfg.nerf))
    cfg.nerf.train_ray_sampler = args.ray_sampler
    cfg.precision = DotDict({"encoder_compute_dtype": args.encoder_dtype,
                             "decoder_compute_dtype": args.decoder_dtype,
                             "remat_encoder": bool(args.remat)})
    cfg.optim = DotDict({
        "lr_enc": 5e-6, "lr_dec": 5e-4, "clip_enc": 1.0,
        "algo": DotDict({"type": "AdamW", "weight_decay": 1e-4}),
        "sched": None,
    })
    cfg.loss_weight = DotDict({"render": 1.0})
    if args.preset == "ibrnet":
        cfg.encoder.attn_splits_list = [4]
        cfg.decoder = DotDict(dict(cfg.decoder))
        cfg.decoder.density_maskfill = True
        cfg.decoder.raytrans_posenc = True
        cfg.decoder.raytrans_act = "ELU"
    wh = args.img_wh.lower().split("x")
    B, H, W, R = 1, int(wh[1]), int(wh[0]), 1024

    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    d = ge._synthetic_inputs(cfg, B, H, W, R)
    batch = {
        "images": jnp.asarray(d["images"]),
        "intrinsics": jnp.asarray(d["intr"]),
        "extrinsics": jnp.asarray(d["poses"]),
        "near_fars": jnp.asarray(d["near_fars"]),
        "tgt_c2w": jnp.asarray(d["tgt_c2w"]),
    }
    tx, _ = build_optimizer(cfg, total_steps=1000)
    opt_state = tx.init(params)
    if args.banded_kt == "auto":
        # per-pose run bound exactly as engine._train_banded_kt computes it
        from matchnerf_tpu.renderer import banded_kt_host
        up = int(cfg.encoder.get("upsample_factor", 2))
        # the encoder's ibrnet resize hack changes the feature-map sizes
        eh, ew = (768, 1024) if (H, W) == (756, 1008) else (H, W)
        scale_hws = [(eh // 8, ew // 8), (eh // 8 * up, ew // 8 * up)]
        kt = banded_kt_host(
            cfg, d["tgt_c2w"], d["intr"][0, -1], d["near_fars"][0, -1],
            d["poses"][0, :-1, :3, :], d["intr"][0, :-1], scale_hws, H, W)
        banded_kt = None if (kt is None or any(k is None for k in kt)) \
            else tuple(kt)
        print(f"# auto banded_kt={banded_kt}")
    else:
        kt_list = [int(v) for v in args.banded_kt.split(",")]
        if any(kt_list):
            banded_kt = tuple(kt_list) if len(kt_list) > 1 \
                else (kt_list[0], kt_list[0])
        else:
            banded_kt = None
    block_ut = (args.block_ut, args.block_ut) if args.block_ut else None
    if block_ut:
        cfg.nerf = DotDict(dict(cfg.nerf))
        cfg.nerf.train_ray_patches = True
    step = make_train_step(cfg, tx, H, W, R, banded_kt=banded_kt,
                           block_ut=block_ut)

    @jax.jit
    def run(params, opt_state, batch, rng):
        def body(carry, _):
            p, o, r = carry
            r, sub = jax.random.split(r)
            p, o, losses = step(p, o, batch, sub)
            return (p, o, r), losses["all"]
        carry, losses = jax.lax.scan(body, (params, opt_state, rng), None,
                                     length=4)
        return losses

    rng = jax.random.PRNGKey(0)
    if args.dump_hlo:
        txt = run.lower(params, opt_state, batch, rng).compile().as_text()
        with open(args.dump_hlo, "w") as f:
            f.write(txt)
        print("wrote HLO to", args.dump_hlo)
    np.asarray(run(params, opt_state, batch, rng))       # compile + warm

    import shutil
    logdir = "/tmp/xla_trace_train"
    shutil.rmtree(logdir, ignore_errors=True)
    jax.profiler.start_trace(logdir)
    np.asarray(run(params, opt_state, batch, rng))
    jax.profiler.stop_trace()

    from trace_render import report
    totals = parse_xplane(logdir)
    if totals is None:
        print("no trace produced")
        return
    report(totals, args.top, hlo_path=args.dump_hlo)


if __name__ == "__main__":
    main()
