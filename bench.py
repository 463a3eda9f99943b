"""Benchmark: MatchNeRF rendering throughput (rays/sec/chip) on real hardware.

Measures the steady-state full eval pipeline at DTU test shapes (3 source
views at 640x512, 128 depth samples/ray, 20480-ray slices — configs/test.yaml
in the reference): per-slice ray cast -> 3-view projection + bilinear feature
gather -> grouped cosine matching prior -> conditional-NeRF MLP + ray
transformer -> compositing. Encoder cost is amortized once per image set,
exactly as in evaluation.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md); we
normalize against an estimated reference-implementation A100 rate of 15k
rays/s (a 20480-ray slice in ~1.4s, typical for the torch implementation at
these shapes). The north-star is >=10x (BASELINE.json).
"""
import json
import sys
import threading
import time

import numpy as np

A100_REFERENCE_RAYS_PER_SEC = 15_000.0

# v5e single-chip peaks (public TPU v5e specs)
V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_HBM_BYTES = 819e9


def analytic_costs(cfg, S, V, block_ut, color_ut):
    """Model FLOPs/ray and HBM bytes/ray for the production eval stack.

    FLOPs count the MODEL's math (the same numbers the direct XLA path
    executes), not implementation tricks — e.g. the block kernel's one-hot
    gather-as-matmul expansion is deliberately excluded from the numerator,
    exactly as attention MFU excludes recompute. MACs count as 2 FLOPs.

    Bytes count the per-ray HBM traffic of the quantized-table render path:
    the block/color union gathers (sized by the MEASURED per-pose buckets)
    plus the [R,S,ch]-shaped activation streams that cross Pallas kernel
    boundaries (f32). Fused elementwise traffic inside XLA fusions is not
    modeled — the figure is a lower bound, good to ~2x.
    """
    W = int(cfg.decoder.net_width)
    D = int(cfg.decoder.net_depth)
    skip = set(cfg.decoder.skip)
    G = [int(g) for g in cfg.encoder.cos_n_group]
    C = 128                                    # GMFlow feature channels
    cond_ch = sum(G) + V * 4                   # cond_nerf.cond_feat_dim
    in3d = 3 + 6 * int(cfg.decoder.posenc.L_3D)
    inview = 3                                 # L_view = 0

    # decoder MLP MACs per sample (cond_nerf.init_cond_nerf layer dims)
    macs = in3d * W                            # pts_linears[0]
    for i in range(D - 1):
        macs += (W + in3d if i in skip else W) * W
    macs += cond_ch * W                        # pts_bias
    macs += (inview + W) * (W // 2)            # views_linears
    macs += W * 16 + 16 * 16 + 16 * 1          # alpha path
    macs += W * W + (W // 2) * 3               # feature + rgb heads
    flops_decoder = 2 * macs * S
    # ray transformer over S samples: 4 q/k/v/out projections on d_model=16
    # tokens + scores/attn@v at 4 heads x d_k=4 (ray_transformer.py:18-51)
    flops_attn = 2 * (4 * S * 16 * 16 + 2 * S * S * 16)
    # grouped cosine (2 sides x C MACs + norms ~ 3C) x pairs x scales
    n_pairs = V * (V - 1) // 2
    flops_cos = 2 * 3 * C * len(G) * n_pairs * S
    # bilinear interp of features (4 taps x C x V x scales) + colors
    flops_interp = 2 * 4 * (C * len(G) + 3) * V * S
    flops_per_ray = flops_decoder + flops_attn + flops_cos + flops_interp

    # HBM bytes/ray: union gathers amortize over 8-ray blocks
    ut_rows = sum(int(u) for u in (block_ut or [])) * V * C          # int8
    color_rows = int(color_ut or 0) * V * 4                          # uint8 rgba
    bytes_gather = (ut_rows + color_rows) / 8.0
    # f32 streams crossing kernel boundaries: cond in (G+4V ch) + ndc/dirs
    # (6) + decoder out rgb/sigma (4), all [S]-deep
    bytes_streams = 4.0 * S * (cond_ch + 6 + 4)
    bytes_per_ray = bytes_gather + bytes_streams
    return flops_per_ray, bytes_per_ray


def main():
    # The axon relay can be down for hours; device enumeration then blocks
    # forever and the driver's bench run would hang. Bound ONLY the
    # device-acquisition phase (compiles afterwards may legitimately take
    # longer than this) and emit an explicit error line instead.
    device_ready = threading.Event()
    import os
    timeout_s = float(os.environ.get("BENCH_DEVICE_TIMEOUT", "600"))

    def _watchdog():
        if not device_ready.wait(timeout_s):
            print(json.dumps({
                "metric": "rays_per_sec_per_chip_dtu_eval", "value": 0.0,
                "unit": "rays/s", "vs_baseline": 0.0,
                "error": f"TPU unreachable within {timeout_s:.0f}s "
                         "(relay down?)",
            }), flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax

    # persistent compile cache: repeat runs (e.g. the driver's) skip the
    # multi-minute remote compiles
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from matchnerf_tpu.models.matchnerf import (encode, init_matchnerf,
                                                prepare_sampling_tables, render_rays)

    jax.devices()                              # blocks while the relay is down
    device_ready.set()

    cfg = ge._tiny_cfg(n_layers=6, sample_intvs=128)
    B, H, W = 1, 512, 640                      # DTU eval size (test.yaml:14)
    # 8192 rays/slice: largest slice fitting HBM with the packed gather
    # intermediates (the reference likewise drops its 20480 default on OOM,
    # README.md:132); throughput is flat in R beyond ~4k.
    R = 8192
    K = 8                                      # timed iterations per dispatch

    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    d = ge._synthetic_inputs(cfg, B, H, W, R)

    images = jnp.asarray(d["images"])
    poses = jnp.asarray(d["poses"])
    intr = jnp.asarray(d["intr"])
    nf = jnp.asarray(d["near_fars"])
    tgt_c2w = jnp.asarray(d["tgt_c2w"])
    ref_images = images[:, : cfg.n_src_views]
    # production ray order: render_by_slices walks contiguous pixel slices
    # (the block kernel's shared-band gather depends on this adjacency)
    from matchnerf_tpu import camera
    grid = np.asarray(camera.pixel_grid(H, W, legacy=cfg.nerf.legacy_coord))
    off = ((H * W - R) // 2 // 8) * 8
    pix = jnp.asarray(grid[off:off + R][None])

    # production eval precision (configs/test.yaml): int8 feature tables,
    # uint8 color tables, block-level shared dilated-union megakernel,
    # VMEM-resident decoder megakernel
    @jax.jit
    def enc(p, x):
        feats = encode(p, cfg, x)
        return prepare_sampling_tables(cfg, feats, x, feat_dtype=jnp.int8,
                                       color_dtype=jnp.uint8,
                                       keep_unpacked=True)

    tables = enc(params, ref_images)

    # per-pose banded run bound + block-union buckets, exactly as
    # Renderer.render_by_slices does
    from matchnerf_tpu.renderer import Renderer, extract_poses
    from matchnerf_tpu.utils import DotDict
    bcfg = DotDict(dict(cfg))
    bcfg.precision = DotDict({"cond_sample_dtype": "int8",
                              "color_sample_dtype": "uint8",
                              "banded_kernel": True, "block_kernel": True,
                              "decoder_kernel": True})
    pose_d = extract_poses({"extrinsics": d["poses"], "intrinsics": d["intr"],
                            "near_fars": d["near_fars"]})
    rend = Renderer(bcfg)
    scale_hws = [(v.shape[2], v.shape[3]) for v in tables["view_feats"]]
    banded_kt, block_ut, color_ut = rend._pose_prep(
        pose_d, pose_d["tgt"], scale_hws, H, W,
        measure_color=tables.get("colors_sc") is not None)
    print(f"# banded_kt={banded_kt} block_ut={block_ut} color_ut={color_ut}",
          file=sys.stderr)

    def render_slice(params, tables, pix_xy):
        return render_rays(
            params, cfg, pix_xy,
            tgt_intr=intr[:, -1], tgt_c2w=tgt_c2w, tgt_near_far=nf[:, -1],
            ref_w2c=poses[:, :-1, :3, :], ref_intr=intr[:, :-1],
            ref_near_far=nf[:, :-1], ref_images=ref_images,
            pair_feats=None, tables=tables, img_h=H, img_w=W,
            banded_kt=banded_kt, banded_impl="block", block_ut=block_ut,
            color_ut=color_ut, decoder_impl="pallas")["rgb"]

    # device-side timing: K chained render slices inside one dispatch
    # (host-side per-dispatch timing is unreliable through the TPU relay);
    # measure at two K values and take the marginal slope so the fixed
    # per-dispatch relay overhead (~30ms) cancels out
    def make_run(K):
        @jax.jit
        def run(pix0, params, tables):
            def step(carry, _):
                out = render_slice(params, tables, carry)
                return pix + 1e-30 * out[0, :1, :2].reshape(1, 1, 2), ()
            carry, _ = jax.lax.scan(step, pix0, None, length=K)
            return carry
        return run

    runs = {}

    def timed(K, pix_k):
        if K not in runs:
            runs[K] = make_run(K)              # trace+compile once per K
        run = runs[K]
        out = run(pix_k, params, tables)       # warm (compile on first attempt)
        np.asarray(out).sum()
        t0 = time.perf_counter()
        out = run(pix_k, params, tables)
        np.asarray(out).sum()
        return time.perf_counter() - t0

    # --- contention guard -------------------------------------------------
    # The marginal-slope measurement corrupts under host load (measured 208k
    # vs 243.7k rays/s with a concurrent CPU-heavy job): the relay dispatch
    # path runs on the host, so contention inflates t_hi - t_lo. Two
    # defenses: (1) refuse to start under heavy load; (2) repeat the slope
    # and require agreement — contention only ever ADDS time, so the MIN
    # slope across attempts is the cleanest one, and a spread > 10% between
    # the two best attempts flags a noisy measurement on stderr.
    import os
    try:
        load1 = os.getloadavg()[0]
        ncpu = os.cpu_count() or 1
        for _ in range(6):
            if load1 < 0.5 * ncpu:
                break
            print(f"# host loadavg {load1:.1f} (ncpu={ncpu}) — waiting for "
                  "quiet host (bench corrupts under contention)", file=sys.stderr)
            time.sleep(20)
            load1 = os.getloadavg()[0]
        else:
            print(f"# WARNING: still loaded (loadavg {load1:.1f}); measurement "
                  "may read low", file=sys.stderr)
    except OSError:
        pass

    K_lo, K_hi = 4, 12

    def slope_once(attempt):
        # shift the ray window per attempt: never re-issue a byte-identical
        # dispatch (the relay memoizes those and reports ~0 time)
        pix_k = jnp.asarray(grid[off + 8 * attempt:off + 8 * attempt + R][None])
        t_lo = timed(K_lo, pix_k)
        t_hi = timed(K_hi, pix_k)
        return max((t_hi - t_lo) / (K_hi - K_lo), 1e-6)

    slopes = sorted(slope_once(a) for a in range(3))
    spread = (slopes[1] - slopes[0]) / slopes[0]
    if spread > 0.10:
        print(f"# WARNING: slope spread {spread * 100:.0f}% across attempts "
              f"({[round(s * 1e3, 1) for s in slopes]} ms) — host contention "
              "suspected; reporting the fastest (least contaminated) attempt",
              file=sys.stderr)
    dt = slopes[0]

    # encoder share, amortized once per image: K chained encodes
    @jax.jit
    def run_enc(x0, params):
        def step(carry, _):
            t = enc(params, carry)
            return ref_images + 1e-30 * t["colors"].reshape(-1)[0], ()
        carry, _ = jax.lax.scan(step, x0, None, length=K)
        return carry
    o = run_enc(ref_images, params)
    np.asarray(o).sum()
    t0 = time.perf_counter()
    o = run_enc(ref_images, params)
    np.asarray(o).sum()
    enc_time = (time.perf_counter() - t0) / K

    slices_per_image = (H * W + R - 1) // R
    time_per_image = slices_per_image * dt + enc_time
    rays_per_sec = (H * W) / time_per_image

    # hardware-anchored accounting (VERDICT r4 #3): model FLOPs and HBM
    # traffic per ray -> achieved TFLOP/s + MFU vs the v5e bf16 peak and
    # achieved HBM GB/s. The eval stack sits far from BOTH classical
    # ceilings — device traces show it is kernel-issue/gather-latency
    # bound (see BASELINE.md "Roofline position").
    flops_per_ray, bytes_per_ray = analytic_costs(
        cfg, S=int(cfg.nerf.sample_intvs), V=cfg.n_src_views,
        block_ut=block_ut, color_ut=color_ut)
    achieved_flops = flops_per_ray * rays_per_sec
    hbm_bps = bytes_per_ray * rays_per_sec

    print(json.dumps({
        "metric": "rays_per_sec_per_chip_dtu_eval",
        "value": round(float(rays_per_sec), 1),
        "unit": "rays/s",
        "vs_baseline": round(float(rays_per_sec) / A100_REFERENCE_RAYS_PER_SEC, 3),
        # the reference publishes no throughput numbers; the denominator is
        # an ESTIMATED 15k rays/s torch-on-A100 rate (see module docstring)
        "baseline_is_estimate": True,
        "baseline_rays_per_sec_est": A100_REFERENCE_RAYS_PER_SEC,
        "flops_per_ray": round(float(flops_per_ray)),
        "achieved_tflops": round(achieved_flops / 1e12, 2),
        "mfu_vs_v5e_peak": round(achieved_flops / V5E_PEAK_BF16_FLOPS, 4),
        "hbm_gbps": round(hbm_bps / 1e9, 1),
        "hbm_frac_of_peak": round(hbm_bps / V5E_PEAK_HBM_BYTES, 4),
        "roofline": "issue/gather-latency bound (neither MXU nor HBM ceiling)",
    }))


if __name__ == "__main__":
    main()
