"""On-TPU serve smoke (VERDICT r4 #8): production configs/test.yaml stack on
the in-repo printer scene, through the real HTTP wire format.

Encodes the scene once (POST /scenes), renders the 3 capture views
(POST /render, float32) and an 8-frame spiral (POST /render_path), asserts
the HTTP renders are BIT-IDENTICAL to direct Renderer calls in the same
process, and logs the amortized timings to compare against
tools/bench_image.py. Random weights (no checkpoint in-repo) — this smokes
the serving machinery + production kernel stack, not quality.

Usage: python tools/serve_smoke.py [--img_wh 512x384] [--cpu]
"""
import argparse
import hashlib
import http.client
import json
import os
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def _call(port, method, path, obj=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=1800)
    body = None if obj is None else json.dumps(obj)
    conn.request(method, path, body=body,
                 headers={"Content-Type": "application/json"})
    r = conn.getresponse()
    data = json.loads(r.read().decode())
    conn.close()
    return r.status, data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img_wh", type=str, default="512x384")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n_frames", type=int, default=8)
    ap.add_argument("--tiny", action="store_true",
                    help="shrink the model (CPU logic validation only; the "
                         "real smoke runs the full test.yaml stack on TPU)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax

    from matchnerf_tpu import camera
    from matchnerf_tpu.config import load_options
    from matchnerf_tpu.data.llff import COLMAPDataset
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    from matchnerf_tpu.renderer import Renderer
    from matchnerf_tpu.serve import decode_array, encode_array, serve
    from matchnerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = load_options("test")
    if args.tiny:
        cfg.encoder.num_transformer_layers = 1
        cfg.nerf.sample_intvs = 16
        cfg.nerf.rand_rays_test = 512
    print(f"# backend={jax.default_backend()} precision="
          f"{dict(cfg.get('precision') or {})}")

    W, H = (int(x) for x in args.img_wh.lower().split("x"))
    ds = COLMAPDataset(os.path.join("docs", "demo_data"), "test",
                       n_views=cfg.n_src_views, img_wh=(W, H),
                       scene_list=["printer"])
    sample = ds[0]
    V = cfg.n_src_views
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)

    httpd = serve(cfg, params, port=0, max_scenes=2)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    code, health = _call(port, "GET", "/healthz")
    assert code == 200 and health["ok"], health
    print(f"# healthz: {health}")

    t0 = time.perf_counter()
    code, resp = _call(port, "POST", "/scenes", {
        "images": encode_array(sample["images"][:V]),
        "extrinsics": encode_array(sample["extrinsics"][:V]),
        "intrinsics": encode_array(sample["intrinsics"][:V]),
        "near_fars": encode_array(sample["near_fars"][:V]),
    })
    t_encode = time.perf_counter() - t0
    assert code == 200, resp
    sid = resp["scene_id"]
    print(f"# scene encoded in {t_encode:.2f}s (incl. first-use compiles)")

    # direct renderer with identical inputs (bit-identity oracle)
    rend = Renderer(cfg)
    ref_images = jax.numpy.asarray(sample["images"][None, :V])
    feats = rend.encode(params, ref_images)
    tables = rend.build_tables(ref_images, feats)
    ref_poses = {
        "extrinsics": sample["extrinsics"][None, :V, :3, :].astype(np.float32),
        "intrinsics": sample["intrinsics"][None, :V].astype(np.float32),
        "near_fars": sample["near_fars"][None, :V].astype(np.float32),
    }

    t_frames = []
    for v in range(V):
        tgt = {"scene_id": sid,
               "extrinsic": encode_array(sample["extrinsics"][v]),
               "intrinsic": encode_array(sample["intrinsics"][v]),
               "near_far": encode_array(sample["near_fars"][v]),
               "out_dtype": "float32"}
        t0 = time.perf_counter()
        code, resp = _call(port, "POST", "/render", tgt)
        t_frames.append(time.perf_counter() - t0)
        assert code == 200, resp
        rgb_http = decode_array(resp["rgb"])

        poses = {"tgt": {
            "extrinsics": sample["extrinsics"][None, v, :3, :].astype(np.float32),
            "intrinsics": sample["intrinsics"][None, v].astype(np.float32),
            "near_fars": sample["near_fars"][None, v].astype(np.float32)},
            "ref": ref_poses}
        out = rend.render_by_slices(params, poses, ref_images, feats, H, W,
                                    tables=tables)
        rgb_direct = np.asarray(out["rgb"]).reshape(H, W, 3)
        if not np.array_equal(rgb_http, rgb_direct):
            d = np.abs(rgb_http - rgb_direct).max()
            raise AssertionError(f"view {v}: HTTP render != direct "
                                 f"(max |d| = {d})")
        md5 = hashlib.md5(rgb_http.tobytes()).hexdigest()[:12]
        print(f"# view {v}: {t_frames[-1]:.2f}s  md5={md5}  BIT-IDENTICAL "
              "to direct renderer")

    t0 = time.perf_counter()
    code, resp = _call(port, "POST", "/render_path",
                       {"scene_id": sid, "n_frames": args.n_frames,
                        "mode": "spiral"})
    t_path = time.perf_counter() - t0
    assert code == 200, resp
    frames = decode_array(resp["frames"])
    assert frames.shape == (args.n_frames, H, W, 3) and frames.dtype == np.uint8
    assert int(frames.max()) > 0
    print(f"# spiral: {args.n_frames} frames in {t_path:.2f}s -> "
          f"{t_path / args.n_frames * 1e3:.0f} ms/frame amortized "
          f"({H}x{W}; bench_image reference is 640x512)")
    print(json.dumps({
        "scene_encode_s": round(t_encode, 2),
        "render_view_s": [round(t, 2) for t in t_frames],
        "spiral_ms_per_frame": round(t_path / args.n_frames * 1e3, 1),
        "img_wh": [W, H], "bit_identical_views": V,
    }))
    httpd.shutdown()


if __name__ == "__main__":
    main()
