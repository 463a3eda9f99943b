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
import time

import numpy as np

A100_REFERENCE_RAYS_PER_SEC = 15_000.0


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from matchnerf_tpu.models.matchnerf import encode, init_matchnerf, render_rays
    from matchnerf_tpu.utils import DotDict

    cfg = ge._tiny_cfg(n_layers=6, sample_intvs=128)
    B, H, W = 1, 512, 640                      # DTU eval size (test.yaml:14)
    R = 20480                                  # rays per slice (test.yaml:8)

    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    d = ge._synthetic_inputs(cfg, B, H, W, R)

    images = jnp.asarray(d["images"])
    poses = jnp.asarray(d["poses"])
    intr = jnp.asarray(d["intr"])
    nf = jnp.asarray(d["near_fars"])
    tgt_c2w = jnp.asarray(d["tgt_c2w"])
    ref_images = images[:, : cfg.n_src_views]

    enc = jax.jit(lambda p, x: encode(p, cfg, x))
    pair_feats = jax.block_until_ready(enc(params, ref_images))

    @jax.jit
    def render_slice(params, pair_feats, pix):
        return render_rays(
            params, cfg, pix,
            tgt_intr=intr[:, -1], tgt_c2w=tgt_c2w, tgt_near_far=nf[:, -1],
            ref_w2c=poses[:, :-1, :3, :], ref_intr=intr[:, :-1],
            ref_near_far=nf[:, :-1], ref_images=ref_images,
            pair_feats=pair_feats, img_h=H, img_w=W)["rgb"]

    pix = jnp.asarray(d["pix"])
    out = jax.block_until_ready(render_slice(params, pair_feats, pix))  # compile
    assert np.isfinite(np.asarray(out)).all()

    # amortized encoder share: one encode per image (H*W rays)
    t0 = time.perf_counter()
    jax.block_until_ready(enc(params, ref_images))
    enc_time = time.perf_counter() - t0

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = render_slice(params, pair_feats, pix)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters

    slices_per_image = (H * W + R - 1) // R
    time_per_image = slices_per_image * dt + enc_time
    rays_per_sec = (H * W) / time_per_image

    print(json.dumps({
        "metric": "rays_per_sec_per_chip_dtu_eval",
        "value": round(float(rays_per_sec), 1),
        "unit": "rays/s",
        "vs_baseline": round(float(rays_per_sec) / A100_REFERENCE_RAYS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
