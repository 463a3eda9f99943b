"""Production render server: keep the model warm, encode scenes once, serve
novel-view renders over HTTP.

The reference has no serving story — evaluation re-runs the whole pipeline
per image from the CLI (coach.py:369-453). On TPU the economics invert: the
jitted executables and the per-scene sampling tables are expensive to build
and cheap to reuse, so a long-lived server that caches both amortizes the
encoder + compile cost across every novel view of a scene (the per-frame
marginal cost is just the render slices — the same property the video path
exploits, models/matchnerf.py:42-72).

Design:
- stdlib ThreadingHTTPServer; a single device lock serializes TPU dispatch
  (the chip is serial anyway; concurrency buys request pipelining of the
  host-side JSON/PNG work only).
- scenes are encoded ONCE (POST /scenes): GMFlow features + packed/unpacked
  sampling tables stay on device, LRU-capped.
- renders (POST /render) reuse the Renderer's jit caches; any (H,W) seen
  before costs zero compiles.

Endpoints (JSON request/response; arrays as base64 of little-endian bytes
with explicit dtype/shape):
  GET  /healthz            -> {ok, backend, n_scenes, uptime_s}
  POST /scenes             -> {scene_id}
        {images: arr [V,H,W,3] float32 in [0,1] (or uint8),
         extrinsics: arr [V,3,4] or [V,4,4] world->cam,
         intrinsics: arr [V,3,3], near_fars: arr [V,2],
         c2ws_all?: arr [M,3,4] or [M,4,4] cam->world — all captured camera
         poses of the scene, enabling the LLFF-style spiral trajectory
         (coach.py:472-475 passes these via the dataset's c2ws_all)}
  POST /render             -> {rgb: arr [H,W,3] uint8 (or float32),
                               depth: arr [H,W] float32}
        {scene_id, extrinsic: arr [3,4] or [4,4] world->cam,
         intrinsic: arr [3,3], near_far: arr [2],
         out_dtype: "uint8"|"float32" (default uint8)}
  POST /render_path        -> {frames: arr [n,H,W,3] uint8}
        {scene_id, n_frames (default 8), mode: "interpolate"|"spiral",
         intrinsic?: arr [3,3], near_far?: arr [2] (default: ref view 0),
         c2ws_all?: arr [M,3,4|4,4] (spiral only; overrides the scene's;
         when neither exists, the spiral falls back to the scene's V
         source-camera poses)}
  DELETE /scenes/<id>      -> {ok}

CLI: python -m matchnerf_tpu.serve --yaml=test --load=<ckpt> --port=8000
"""
from __future__ import annotations

import argparse
import base64
import json
import threading
import time
from collections import OrderedDict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional

import numpy as np

from .utils import DotDict
from .utils.logging import log


def encode_array(a: np.ndarray) -> Dict:
    a = np.ascontiguousarray(a)
    return {"shape": list(a.shape), "dtype": str(a.dtype),
            "data": base64.b64encode(a.tobytes()).decode("ascii")}


def decode_array(d: Dict) -> np.ndarray:
    a = np.frombuffer(base64.b64decode(d["data"]), dtype=np.dtype(d["dtype"]))
    return a.reshape(d["shape"]).copy()


def _to34(e: np.ndarray) -> np.ndarray:
    """[...,4,4] or [...,3,4] -> [...,3,4] float32."""
    e = np.asarray(e, np.float32)
    return e[..., :3, :] if e.shape[-2] == 4 else e


def _to44(e: np.ndarray) -> np.ndarray:
    """[...,3,4] or [...,4,4] -> [...,4,4] float32 (homogeneous row added)."""
    e = np.asarray(e, np.float32)
    if e.shape[-2] == 4:
        return e
    sq = np.broadcast_to(np.eye(4, dtype=np.float32),
                         (*e.shape[:-2], 4, 4)).copy()
    sq[..., :3, :] = e
    return sq


class RenderService:
    """Model + scene cache + device lock. HTTP-free core (unit-testable)."""

    def __init__(self, cfg: DotDict, params, max_scenes: int = 8):
        from .renderer import Renderer
        self.cfg = cfg
        self.params = params
        self.renderer = Renderer(cfg)
        self.scenes: "OrderedDict[str, Dict]" = OrderedDict()
        self.max_scenes = max_scenes
        self.device_lock = threading.Lock()
        self.t0 = time.time()
        self._n = 0

    def health(self) -> Dict:
        import jax
        return {"ok": True, "backend": jax.default_backend(),
                "n_scenes": len(self.scenes),
                "uptime_s": round(time.time() - self.t0, 1)}

    def add_scene(self, images: np.ndarray, extrinsics: np.ndarray,
                  intrinsics: np.ndarray, near_fars: np.ndarray,
                  c2ws_all: Optional[np.ndarray] = None) -> str:
        import jax.numpy as jnp
        V = int(self.cfg.n_src_views)
        assert images.shape[0] == V, (images.shape, V)
        if images.dtype == np.uint8:
            images = images.astype(np.float32) / 255.0
        ref_images = jnp.asarray(images[None].astype(np.float32))  # [1,V,H,W,3]
        with self.device_lock:
            pair_feats = self.renderer.encode(self.params, ref_images)
            tables = self.renderer.build_tables(ref_images, pair_feats)
        self._n += 1
        sid = f"scene-{self._n:06d}"
        self.scenes[sid] = {
            "ref_images": ref_images,
            "pair_feats": pair_feats,
            "tables": tables,
            "H": images.shape[1], "W": images.shape[2],
            "ref": {
                "extrinsics": _to34(extrinsics)[None],        # [1,V,3,4]
                "intrinsics": np.asarray(intrinsics, np.float32)[None],
                "near_fars": np.asarray(near_fars, np.float32)[None],
            },
            "c2ws_all": None if c2ws_all is None else _to44(c2ws_all),
        }
        while len(self.scenes) > self.max_scenes:
            evicted, _ = self.scenes.popitem(last=False)
            log.info(f"serve: evicted {evicted} (LRU, cap {self.max_scenes})")
        return sid

    def drop_scene(self, sid: str) -> bool:
        return self.scenes.pop(sid, None) is not None

    def render_path(self, sid: str, n_frames: int = 8,
                    mode: str = "interpolate",
                    intrinsic: Optional[np.ndarray] = None,
                    near_far: Optional[np.ndarray] = None,
                    c2ws_all: Optional[np.ndarray] = None) -> np.ndarray:
        """Render a novel camera trajectory (the video path of
        models/matchnerf.py:42-72). 'interpolate' needs only the scene's
        source poses; 'spiral' (the LLFF default, coach.py:472-475) uses
        c2ws_all — request arg, else the scene's stored poses, else a
        documented fallback to the V source-camera poses (the spiral then
        orbits their average, with radii from their spread). Returns uint8
        frames [n,H,W,3]."""
        sc = self.scenes.get(sid)
        if sc is None:
            raise KeyError(sid)
        if mode not in ("interpolate", "spiral"):
            raise ValueError(f"render_path supports mode='interpolate' or "
                             f"'spiral' (got {mode!r})")
        self.scenes.move_to_end(sid)
        H, W = sc["H"], sc["W"]
        intr = (np.asarray(intrinsic, np.float32) if intrinsic is not None
                else sc["ref"]["intrinsics"][0, 0])
        nf = (np.asarray(near_far, np.float32) if near_far is not None
              else sc["ref"]["near_fars"][0, 0])
        poses = {"ref": sc["ref"],
                 "tgt": {"intrinsics": intr[None], "near_fars": nf[None]}}
        batch = None
        if mode == "spiral":
            c2a = c2ws_all if c2ws_all is not None else sc.get("c2ws_all")
            if c2a is None:
                from . import camera
                c2a = camera.pose_inverse_legacy_np(
                    sc["ref"]["extrinsics"][0])                 # [V,3,4] c2w
            batch = {"c2ws_all": _to44(c2a)[None]}              # [1,M,4,4]
        frame_poses = self.renderer.get_video_rendering_path(
            poses, mode, int(n_frames), batch=batch)
        frames = []
        with self.device_lock:
            for fp in frame_poses:
                out = self.renderer.render_by_slices(
                    self.params,
                    {"ref": sc["ref"],
                     "tgt": {"extrinsics": fp["extrinsics"],
                             "intrinsics": fp["intrinsics"],
                             "near_fars": fp["near_fars"]}},
                    sc["ref_images"], sc["pair_feats"], H, W,
                    tables=sc["tables"])
                rgb = np.asarray(out["rgb"]).reshape(H, W, 3)
                frames.append(
                    np.clip(rgb * 255.0 + 0.5, 0, 255).astype(np.uint8))
        return np.stack(frames)

    def render(self, sid: str, extrinsic: np.ndarray, intrinsic: np.ndarray,
               near_far: np.ndarray, out_dtype: str = "uint8") -> Dict:
        sc = self.scenes.get(sid)
        if sc is None:
            raise KeyError(sid)
        self.scenes.move_to_end(sid)                            # LRU touch
        H, W = sc["H"], sc["W"]
        poses = {
            "tgt": {
                "extrinsics": _to34(extrinsic)[None],           # [1,3,4]
                "intrinsics": np.asarray(intrinsic, np.float32)[None],
                "near_fars": np.asarray(near_far, np.float32)[None],
            },
            "ref": sc["ref"],
        }
        with self.device_lock:
            out = self.renderer.render_by_slices(
                self.params, poses, sc["ref_images"], sc["pair_feats"],
                H, W, tables=sc["tables"])
            rgb = np.asarray(out["rgb"]).reshape(H, W, 3)
            depth = np.asarray(out["depth"]).reshape(H, W)
        if out_dtype == "uint8":
            rgb_out = np.clip(rgb * 255.0 + 0.5, 0, 255).astype(np.uint8)
        else:
            rgb_out = rgb.astype(np.float32)
        return {"rgb": rgb_out, "depth": depth.astype(np.float32)}


def make_handler(svc: RenderService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):                      # quiet access log
            pass

        def _json(self, code: int, obj: Dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> Dict:
            n = int(self.headers.get("Content-Length", "0"))
            return json.loads(self.rfile.read(n) or b"{}")

        def do_GET(self):
            if self.path == "/healthz":
                return self._json(200, svc.health())
            return self._json(404, {"error": f"no route {self.path}"})

        def do_DELETE(self):
            if self.path.startswith("/scenes/"):
                sid = self.path[len("/scenes/"):]
                ok = svc.drop_scene(sid)
                return self._json(200 if ok else 404, {"ok": ok})
            return self._json(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            try:
                req = self._body()
                if self.path == "/scenes":
                    sid = svc.add_scene(
                        decode_array(req["images"]),
                        decode_array(req["extrinsics"]),
                        decode_array(req["intrinsics"]),
                        decode_array(req["near_fars"]),
                        c2ws_all=(decode_array(req["c2ws_all"])
                                  if "c2ws_all" in req else None))
                    return self._json(200, {"scene_id": sid})
                if self.path == "/render":
                    sid = req["scene_id"]
                    extr = decode_array(req["extrinsic"])
                    intr = decode_array(req["intrinsic"])
                    nf = decode_array(req["near_far"])
                    try:
                        out = svc.render(sid, extr, intr, nf,
                                         out_dtype=req.get("out_dtype",
                                                           "uint8"))
                    except KeyError as e:
                        return self._json(404, {"error": f"unknown scene {e}"})
                    return self._json(200, {
                        "rgb": encode_array(out["rgb"]),
                        "depth": encode_array(out["depth"])})
                if self.path == "/render_path":
                    sid = req["scene_id"]
                    intr = (decode_array(req["intrinsic"])
                            if "intrinsic" in req else None)
                    nf = (decode_array(req["near_far"])
                          if "near_far" in req else None)
                    try:
                        frames = svc.render_path(
                            sid, n_frames=int(req.get("n_frames", 8)),
                            mode=req.get("mode", "interpolate"),
                            intrinsic=intr, near_far=nf,
                            c2ws_all=(decode_array(req["c2ws_all"])
                                      if "c2ws_all" in req else None))
                    except KeyError as e:
                        return self._json(404, {"error": f"unknown scene {e}"})
                    return self._json(200, {"frames": encode_array(frames)})
                return self._json(404, {"error": f"no route {self.path}"})
            except Exception as e:                              # noqa: BLE001
                log.warn(f"serve: {type(e).__name__}: {e}")
                return self._json(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(cfg: DotDict, params, port: int = 8000, host: str = "127.0.0.1",
          max_scenes: int = 8) -> ThreadingHTTPServer:
    """Build the service and a ready-to-run server (caller calls
    serve_forever(), possibly on a thread — see tests/test_serve.py)."""
    svc = RenderService(cfg, params, max_scenes=max_scenes)
    httpd = ThreadingHTTPServer((host, port), make_handler(svc))
    httpd.service = svc                                          # test hook
    return httpd


def main(argv=None):
    from .config import parse_arguments, load_options, override_options
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--max_scenes", type=int, default=8)
    parser.add_argument("--random_init", action="store_true",
                        help="serve randomly-initialized weights (smoke runs)")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (env vars cannot once "
                             "jax is imported; see CLAUDE.md)")
    args, rest = parser.parse_known_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    opt_cmd = parse_arguments(rest)
    cfg = load_options(opt_cmd.get("yaml", "test"))
    cfg = override_options(cfg, opt_cmd, safe_check=False)

    import jax
    from .models.matchnerf import init_matchnerf
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    load = cfg.get("load", None)
    if load and not args.random_init:
        from .utils.checkpoint import restore_checkpoint
        params, _, _, _ = restore_checkpoint(params, load)
        log.info(f"serve: loaded weights from {load}")
    elif not args.random_init:
        log.warn("serve: no --load given — serving RANDOM weights")

    httpd = serve(cfg, params, port=args.port, host=args.host,
                  max_scenes=args.max_scenes)
    log.info(f"serve: listening on http://{args.host}:{args.port} "
             f"(backend={jax.default_backend()})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        httpd.shutdown()


if __name__ == "__main__":
    main()
