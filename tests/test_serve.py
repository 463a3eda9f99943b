"""Render-server tests: encode-once/render-many over HTTP matches the direct
renderer, scene LRU eviction, error handling. CPU backend, tiny shapes."""
import json
import threading
import urllib.request

import numpy as np
import pytest

import __graft_entry__ as ge
from matchnerf_tpu.serve import decode_array, encode_array, serve
from matchnerf_tpu.utils import DotDict


def _call(port, method, path, obj=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", method=method,
        data=None if obj is None else json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def server():
    import jax
    from matchnerf_tpu.models.matchnerf import init_matchnerf

    cfg = ge._tiny_cfg(n_layers=2, sample_intvs=8)
    cfg = DotDict(dict(cfg))
    cfg.nerf.rand_rays_test = 64
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    httpd = serve(cfg, params, port=0, max_scenes=2)   # port 0 = ephemeral
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd, cfg, params
    httpd.shutdown()


def _scene_payload(cfg, H=32, W=32, seed=0):
    d = ge._synthetic_inputs(cfg, 1, H, W, 8, seed=seed)
    V = cfg.n_src_views
    return {
        "images": encode_array(d["images"][0, :V]),
        "extrinsics": encode_array(d["poses"][0, :V]),
        "intrinsics": encode_array(d["intr"][0, :V]),
        "near_fars": encode_array(d["near_fars"][0, :V]),
    }, d


def test_serve_matches_direct_render(server):
    httpd, cfg, params = server
    port = httpd.server_address[1]

    code, health = _call(port, "GET", "/healthz")
    assert code == 200 and health["ok"] and health["backend"] == "cpu"

    payload, d = _scene_payload(cfg)
    code, resp = _call(port, "POST", "/scenes", payload)
    assert code == 200, resp
    sid = resp["scene_id"]

    tgt = {"scene_id": sid,
           "extrinsic": encode_array(d["poses"][0, -1]),
           "intrinsic": encode_array(d["intr"][0, -1]),
           "near_far": encode_array(d["near_fars"][0, -1]),
           "out_dtype": "float32"}
    code, resp = _call(port, "POST", "/render", tgt)
    assert code == 200, resp
    rgb = decode_array(resp["rgb"])
    depth = decode_array(resp["depth"])
    H, W = 32, 32
    assert rgb.shape == (H, W, 3) and depth.shape == (H, W)
    assert np.isfinite(rgb).all() and np.isfinite(depth).all()

    # must match a direct Renderer call through the same service object
    svc = httpd.service
    out = svc.renderer.render_by_slices(
        params,
        {"tgt": {"extrinsics": d["poses"][None, 0, -1, :3, :],
                 "intrinsics": d["intr"][None, 0, -1],
                 "near_fars": d["near_fars"][None, 0, -1]},
         "ref": svc.scenes[sid]["ref"]},
        svc.scenes[sid]["ref_images"], svc.scenes[sid]["pair_feats"],
        H, W, tables=svc.scenes[sid]["tables"])
    np.testing.assert_allclose(rgb, np.asarray(out["rgb"]).reshape(H, W, 3),
                               atol=1e-6)

    # uint8 output mode quantizes the same image
    tgt["out_dtype"] = "uint8"
    code, resp = _call(port, "POST", "/render", tgt)
    assert code == 200
    rgb8 = decode_array(resp["rgb"])
    assert rgb8.dtype == np.uint8
    np.testing.assert_array_equal(
        rgb8, np.clip(rgb * 255.0 + 0.5, 0, 255).astype(np.uint8))


def test_serve_lru_and_errors(server):
    httpd, cfg, _ = server
    port = httpd.server_address[1]

    sids = []
    for seed in (1, 2, 3):                       # cap is 2 -> first evicted
        payload, _ = _scene_payload(cfg, seed=seed)
        code, resp = _call(port, "POST", "/scenes", payload)
        assert code == 200
        sids.append(resp["scene_id"])
    assert len(httpd.service.scenes) == 2
    assert sids[0] not in httpd.service.scenes

    _, d = _scene_payload(cfg)
    tgt = {"scene_id": sids[0],
           "extrinsic": encode_array(d["poses"][0, -1]),
           "intrinsic": encode_array(d["intr"][0, -1]),
           "near_far": encode_array(d["near_fars"][0, -1])}
    code, resp = _call(port, "POST", "/render", tgt)
    assert code == 404 and "unknown scene" in resp["error"]

    code, resp = _call(port, "POST", "/render", {"bogus": 1})
    assert code == 400

    code, resp = _call(port, "DELETE", f"/scenes/{sids[1]}")
    assert code == 200 and resp["ok"]
    assert sids[1] not in httpd.service.scenes

    code, _ = _call(port, "GET", "/nope")
    assert code == 404


def test_serve_render_path(server):
    httpd, cfg, _ = server
    port = httpd.server_address[1]

    payload, d = _scene_payload(cfg, seed=7)
    code, resp = _call(port, "POST", "/scenes", payload)
    assert code == 200
    sid = resp["scene_id"]

    code, resp = _call(port, "POST", "/render_path",
                       {"scene_id": sid, "n_frames": 3})
    assert code == 200, resp
    frames = decode_array(resp["frames"])
    assert frames.shape == (3, 32, 32, 3) and frames.dtype == np.uint8
    # interpolate path starts at the first source pose; all frames rendered
    assert all(np.isfinite(frames[i]).all() for i in range(3))

    # the middle frame differs from the endpoints (camera actually moves)
    assert not np.array_equal(frames[0], frames[1])

    # spiral with no stored c2ws_all: falls back to the source-camera poses
    # (n_frames=2 would sample theta={0, 2pi} — identical poses by the
    # spiral's n_rots=2 construction; 3 frames give distinct cameras)
    code, resp = _call(port, "POST", "/render_path",
                       {"scene_id": sid, "mode": "spiral", "n_frames": 3})
    assert code == 200, resp
    sp = decode_array(resp["frames"])
    assert sp.shape == (3, 32, 32, 3) and sp.dtype == np.uint8
    assert not np.array_equal(sp[0], sp[1])      # camera actually moves

    # spiral with request-supplied c2ws_all (the LLFF coach.py:472-475 flow)
    from matchnerf_tpu import camera
    c2a = camera.pose_inverse_legacy_np(d["poses"][0, :, :3, :])  # all V+1
    code, resp = _call(port, "POST", "/render_path",
                       {"scene_id": sid, "mode": "spiral", "n_frames": 3,
                        "c2ws_all": encode_array(c2a)})
    assert code == 200, resp
    sp2 = decode_array(resp["frames"])
    assert sp2.shape == (3, 32, 32, 3)
    # a wider pose set changes the trajectory, hence the frames
    assert not np.array_equal(sp, sp2)

    # scene-stored c2ws_all: same trajectory as the request-supplied one
    payload2, _ = _scene_payload(cfg, seed=7)
    payload2["c2ws_all"] = encode_array(c2a)
    code, resp = _call(port, "POST", "/scenes", payload2)
    assert code == 200
    code, resp = _call(port, "POST", "/render_path",
                       {"scene_id": resp["scene_id"], "mode": "spiral",
                        "n_frames": 3})
    assert code == 200, resp
    np.testing.assert_array_equal(decode_array(resp["frames"]), sp2)

    code, resp = _call(port, "POST", "/render_path",
                       {"scene_id": sid, "mode": "figure8"})
    assert code == 400 and "figure8" in resp["error"]

    code, resp = _call(port, "POST", "/render_path",
                       {"scene_id": "scene-999999"})
    assert code == 404


def test_serve_concurrent_requests(server):
    """Concurrent renders of different scenes must all succeed and match
    their serial results (device dispatch is lock-serialized; HTTP handling
    is threaded)."""
    from concurrent.futures import ThreadPoolExecutor

    httpd, cfg, _ = server
    port = httpd.server_address[1]

    scenes = []
    for seed in (11, 12):
        payload, d = _scene_payload(cfg, seed=seed)
        code, resp = _call(port, "POST", "/scenes", payload)
        assert code == 200
        scenes.append((resp["scene_id"], d))

    def req(args):
        sid, d = args
        return _call(port, "POST", "/render",
                     {"scene_id": sid,
                      "extrinsic": encode_array(d["poses"][0, -1]),
                      "intrinsic": encode_array(d["intr"][0, -1]),
                      "near_far": encode_array(d["near_fars"][0, -1]),
                      "out_dtype": "float32"})

    serial = [req(s)[1] for s in scenes]
    jobs = [scenes[i % 2] for i in range(6)]
    with ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(req, jobs))
    for i, (code, resp) in enumerate(results):
        assert code == 200
        np.testing.assert_array_equal(decode_array(resp["rgb"]),
                                      decode_array(serial[i % 2]["rgb"]))
