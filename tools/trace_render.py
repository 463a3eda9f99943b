"""Capture an XLA device trace of one render slice and print the per-op cost
breakdown (ground truth for where the 200ms goes — relay host timing can't
attribute anything).

Usage: python tools/trace_render.py [--feat_dtype bfloat16] [--banded_kt 0]
       [--top 30]
"""
import argparse
import glob
import gzip
import json
import os
import shutil
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import numpy as np


def parse_xplane(logdir):
    """Extract (op_name -> total_ns) from the trace's trace.json.gz if
    present, else from xplane.pb via tensorflow (unavailable) — fall back to
    perfetto json."""
    files = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        return None
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    totals = defaultdict(float)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        # device lanes only (TensorCore); skip host threads
        name = ev.get("name", "")
        dur = ev.get("dur", 0)  # microseconds
        pid_name = ev.get("pid")
        totals[name] += dur
    return totals


def hlo_op_lookup(hlo_path):
    """Map HLO instruction names -> (op_name, source) from a dumped HLO text,
    so trace rows like 'fusion.374' become attributable."""
    import re
    look = {}
    if not hlo_path or not os.path.exists(hlo_path):
        return look
    pat = re.compile(r"%([\w.\-]+) = .*?op_name=\"([^\"]+)\""
                     r"(?:.*?source_file=\"([^\"]+)\" source_line=(\d+))?")
    with open(hlo_path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                src = f"{m.group(3)}:{m.group(4)}" if m.group(3) else ""
                look[m.group(1)] = (m.group(2), src)
    return look


def report(totals, top, hlo_path=""):
    look = hlo_op_lookup(hlo_path)
    items = sorted(totals.items(), key=lambda kv: -kv[1])
    grand = sum(v for _, v in items)
    print(f"total traced op-time: {grand/1000:.1f} ms")
    for name, us in items[:top]:
        opn, src = look.get(name, ("", ""))
        extra = f"  [{opn.split('/')[-1]} @ {src.split('/')[-1]}]" if opn else ""
        print(f"{us/1000:9.2f} ms  {100*us/grand:5.1f}%  {name[:60]}{extra}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--feat_dtype", type=str, default="bfloat16")
    parser.add_argument("--banded_kt", type=str, default="0",
                        help="band width; a single int applies to every "
                             "scale, 'a,b' sets per-scale widths (match "
                             "bench.py's '# banded_kt=' line for production "
                             "banding)")
    parser.add_argument("--banded_impl", type=str, default="xla",
                        choices=["xla", "pallas", "block"])
    parser.add_argument("--decoder_impl", type=str, default="xla",
                        choices=["xla", "pallas"])
    parser.add_argument("--color_dtype", type=str, default="float32")
    parser.add_argument("--no_color_kernel", action="store_true",
                        help="packed color gather even when the supercell "
                             "table is available (A/B the color kernel)")
    parser.add_argument("--decoder_matmul_dtype", type=str, default="float32")
    parser.add_argument("--lanemajor", dest="lanemajor", action="store_true",
                        default=True,
                        help="precision.lanemajor_cond: feed the decoder "
                             "kernel lane-major cond straight from the "
                             "block/color kernels (production default: ON)")
    parser.add_argument("--no_lanemajor", dest="lanemajor",
                        action="store_false",
                        help="A/B: disable the lane-major cond layout")
    parser.add_argument("--decoder_group_rays", type=int, default=4)
    parser.add_argument("--decoder_block_rays", type=int, default=16,
                        help="production default 16 (models/matchnerf.py)")
    parser.add_argument("--extract_batched", action="store_true",
                        help="A/B: decoder kernel's batched attention-output "
                             "extraction (3 fat matmuls instead of the "
                             "per-ray slice loop)")
    parser.add_argument("--top", type=int, default=40)
    parser.add_argument("--rays", type=int, default=8192)
    parser.add_argument("--pix", type=str, default="random",
                        choices=["random", "contiguous"],
                        help="contiguous = production render_by_slices ray "
                             "order (required for --banded_impl block)")
    parser.add_argument("--dump_hlo", type=str, default="",
                        help="write compiled HLO text here (to look up "
                             "fusion.N names from the trace)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from matchnerf_tpu.models.matchnerf import (encode, init_matchnerf,
                                                prepare_sampling_tables,
                                                render_rays)

    from matchnerf_tpu.utils import DotDict
    cfg = ge._tiny_cfg(n_layers=6, sample_intvs=128)
    cfg = DotDict(dict(cfg))
    cfg.precision = DotDict({
        "decoder_matmul_dtype": args.decoder_matmul_dtype,
        "decoder_group_rays": args.decoder_group_rays,
        "decoder_block_rays": args.decoder_block_rays,
        "lanemajor_cond": bool(args.lanemajor),
        "decoder_extract_batched": bool(args.extract_batched),
    })
    B, H, W, R = 1, 512, 640, args.rays
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    d = ge._synthetic_inputs(cfg, B, H, W, R)
    images = jnp.asarray(d["images"])
    ref = images[:, :3]
    poses = jnp.asarray(d["poses"])
    intr = jnp.asarray(d["intr"])
    nf = jnp.asarray(d["near_fars"])
    tgt_c2w = jnp.asarray(d["tgt_c2w"])
    if args.pix == "contiguous":
        from matchnerf_tpu import camera
        grid = np.asarray(camera.pixel_grid(H, W, legacy=cfg.nerf.legacy_coord))
        off = (H * W - R) // 2
        pix = jnp.asarray(grid[off:off + R][None])
    else:
        pix = jnp.asarray(d["pix"])

    feat_dtype = jnp.dtype(args.feat_dtype)
    color_dtype = jnp.dtype(args.color_dtype) \
        if args.color_dtype in ("uint8",) else None
    feats = jax.jit(lambda p, x: encode(p, cfg, x))(params, ref)
    keep_unpacked = args.banded_impl == "block"
    tables = jax.jit(lambda fs, im: prepare_sampling_tables(
        cfg, fs, im, feat_dtype=feat_dtype, color_dtype=color_dtype,
        keep_unpacked=keep_unpacked))(feats, ref)
    kt_list = [int(v) for v in args.banded_kt.split(",")]
    if any(kt_list):
        banded_kt = tuple(kt_list) if len(kt_list) > 1 \
            else (kt_list[0], kt_list[0])
    else:
        banded_kt = None

    block_ut = None
    if keep_unpacked and banded_kt:
        from matchnerf_tpu.models.matchnerf import (query_cond_info,  # noqa
                                                    sample_depth)
        from matchnerf_tpu import camera
        from matchnerf_tpu.ops.pallas_block_banded import (
            block_union_size_raw, bucket_ut)
        # grids for the measurement: project the trace's own ray points
        center, ray = camera.get_center_and_ray(pix, intr[:, -1], tgt_c2w)
        depth = sample_depth(cfg, nf[:, -1], 1, pix.shape[1])
        pts = camera.get_3d_points_from_depth(center, ray, depth, True)
        inv_scale = jnp.tile(jnp.array([[W - 1, H - 1]], jnp.float32), (1, 1))
        ndc_all = jax.vmap(
            lambda e, i, n: camera.get_coord_ref_ndc(e, i, pts, inv_scale, n),
            in_axes=(1, 1, 1))(poses[:, :-1, :3, :], intr[:, :-1], nf[:, :-1])
        grids = ndc_all[..., :2] * 2.0 - 1.0
        uts = []
        for si, vf in enumerate(tables["view_feats_unpacked"]):
            h, w = vf.shape[2], vf.shape[3]
            n = int(block_union_size_raw(grids[:, 0], h, w))
            uts.append(bucket_ut(n))
        block_ut = tuple(uts)
        print("block_ut =", block_ut, file=sys.stderr)

    color_ut = None
    if (keep_unpacked and banded_kt and not args.no_color_kernel
            and tables.get("colors_sc") is not None):
        from matchnerf_tpu.ops.pallas_color import (bucket_color_ut,
                                                    color_union_size)
        n = max(int(color_union_size(grids[v, 0], H, W))
                for v in range(grids.shape[0]))
        color_ut = bucket_color_ut(n)
        print(f"color_ut = {color_ut} (measured {n})", file=sys.stderr)

    @jax.jit
    def run(pix_xy, params, tables):
        def step(carry, _):
            out = render_rays(params, cfg, carry, tgt_intr=intr[:, -1],
                              tgt_c2w=tgt_c2w, tgt_near_far=nf[:, -1],
                              ref_w2c=poses[:, :-1, :3, :], ref_intr=intr[:, :-1],
                              ref_near_far=nf[:, :-1], ref_images=ref,
                              pair_feats=None, tables=tables,
                              img_h=H, img_w=W, banded_kt=banded_kt,
                              banded_impl=args.banded_impl,
                              decoder_impl=args.decoder_impl,
                              block_ut=block_ut, color_ut=color_ut)["rgb"]
            return pix + 1e-30 * out[0, :1, :2].reshape(1, 1, 2), ()
        carry, _ = jax.lax.scan(step, pix_xy, None, length=4)
        return carry

    if args.dump_hlo:
        txt = run.lower(pix, params, tables).compile().as_text()
        with open(args.dump_hlo, "w") as f:
            f.write(txt)
        print("wrote HLO to", args.dump_hlo)

    np.asarray(run(pix, params, tables))     # compile + warm

    logdir = "/tmp/xla_trace_render"
    shutil.rmtree(logdir, ignore_errors=True)
    jax.profiler.start_trace(logdir)
    np.asarray(run(pix, params, tables))
    jax.profiler.stop_trace()

    totals = parse_xplane(logdir)
    if totals is None:
        print("no trace.json.gz produced; files:",
              glob.glob(os.path.join(logdir, "**", "*"), recursive=True))
        return
    report(totals, args.top, hlo_path=args.dump_hlo)


if __name__ == "__main__":
    main()
