"""Multi-host (multi-process) distributed training: a real 2-process CPU
cluster (gloo collectives, 4 virtual devices each = 8 global) must produce
the same global train-step losses as the single-process 8-device run.

This is the in-container stand-in for a multi-host TPU pod slice
(SURVEY.md §2.9: the reference's DataParallel row subsumed by
"jax.distributed + pjit"; /root/reference/coach.py:83-85): same code path,
same mesh size, only the process topology differs.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = "/root/repo"


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_reference():
    """Identical schedule on this process's 8 virtual devices."""
    import jax

    sys.path.insert(0, REPO)
    import __graft_entry__ as ge
    from matchnerf_tpu.data.loader import DataLoader
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    from matchnerf_tpu.parallel import make_mesh, replicate_tree
    from matchnerf_tpu.parallel.mesh import shard_batch_tree
    from matchnerf_tpu.train_step import build_optimizer, make_train_step

    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=4)
    B, H, W = 8, 16, 16
    d = ge._synthetic_inputs(cfg, B, H, W, R=16)

    class RowDataset:
        def __len__(self):
            return B

        def __getitem__(self, i):
            return {"images": d["images"][i], "extrinsics": d["poses"][i],
                    "intrinsics": d["intr"][i], "near_fars": d["near_fars"][i],
                    "tgt_c2w": d["tgt_c2w"][i]}

    loader = DataLoader(RowDataset(), batch_size=B, shuffle=False,
                        num_workers=1)
    (batch_h,) = list(loader)
    mesh = make_mesh(n_devices=8)
    params_h = init_matchnerf(jax.random.PRNGKey(0), cfg)
    tx, _ = build_optimizer(cfg, total_steps=100)
    opt_h = tx.init(params_h)
    params = replicate_tree(params_h, mesh)
    opt_state = replicate_tree(opt_h, mesh)
    batch = shard_batch_tree(batch_h, mesh)

    step = make_train_step(cfg, tx, H, W, n_rays=16)
    p1, o1, loss1 = step(params, opt_state, batch, jax.random.PRNGKey(1))
    p2, _, loss2 = step(p1, o1, batch, jax.random.PRNGKey(2))
    checksum = float(jax.jit(lambda p: sum(
        jax.numpy.sum(jax.numpy.abs(x))
        for x in jax.tree_util.tree_leaves(p)))(p2))

    d1 = ge._synthetic_inputs(cfg, 1, H, W, R=16)
    batch1 = shard_batch_tree({
        "images": d1["images"], "extrinsics": d1["poses"],
        "intrinsics": d1["intr"], "near_fars": d1["near_fars"],
        "tgt_c2w": d1["tgt_c2w"]}, mesh, mode="replicated")
    step_rays = make_train_step(cfg, tx, H, W, n_rays=16, mesh=mesh,
                                shard_rays=True)
    _, _, loss_r = step_rays(params, opt_state, batch1, jax.random.PRNGKey(3))

    return {"loss_dp": [float(loss1["all"]), float(loss2["all"])],
            "param_checksum_dp": checksum,
            "loss_rays": float(loss_r["all"])}


@pytest.mark.slow
def test_two_process_cluster_matches_single_process(tmp_path):
    port = _free_port()
    out = str(tmp_path / "result")
    procs = []
    logs = []
    for pid in range(2):
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["JAX_PLATFORMS"] = "cpu"
        env["MATCHNERF_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["MATCHNERF_NUM_PROCESSES"] = "2"
        env["MATCHNERF_PROCESS_ID"] = str(pid)
        log_f = open(tmp_path / f"worker{pid}.log", "w")
        logs.append(log_f)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
             out],
            env=env, cwd=REPO, stdout=log_f, stderr=subprocess.STDOUT))
    rcs = []
    try:
        for p in procs:
            rcs.append(p.wait(timeout=900))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for f in logs:
            f.close()
    for pid, rc in enumerate(rcs):
        if rc != 0:
            log_txt = (tmp_path / f"worker{pid}.log").read_text()
            raise AssertionError(f"worker {pid} rc={rc}\n{log_txt[-4000:]}")

    results = []
    for pid in range(2):
        with open(f"{out}.{pid}.json") as f:
            results.append(json.load(f))
    # both processes observe identical (replicated) losses
    np.testing.assert_allclose(results[0]["loss_dp"], results[1]["loss_dp"],
                               rtol=1e-6)
    assert results[0]["is_main"] and not results[1]["is_main"]

    ref = _single_process_reference()
    # 2x4-process topology must reproduce the 1x8 global math (reduction
    # order may differ at float32 leaf level -> loose-ish tolerances)
    np.testing.assert_allclose(results[0]["loss_dp"], ref["loss_dp"],
                               rtol=1e-4)
    np.testing.assert_allclose(results[0]["loss_rays"], ref["loss_rays"],
                               rtol=1e-4)
    np.testing.assert_allclose(results[0]["param_checksum_dp"],
                               ref["param_checksum_dp"], rtol=1e-3)


def test_maybe_initialize_noop_without_config():
    """Default single-process runs must not touch jax.distributed."""
    from matchnerf_tpu.parallel import distributed
    from matchnerf_tpu.utils import DotDict

    for key in ("MATCHNERF_COORDINATOR_ADDRESS", "MATCHNERF_MULTIHOST"):
        assert key not in os.environ
    assert distributed.maybe_initialize(None) is False
    assert distributed.maybe_initialize(DotDict({"parallel": {}})) is False
    assert distributed.maybe_initialize(
        DotDict({"parallel": {"multihost": False}})) is False
    assert distributed.is_main_process()


def test_loader_sharding_partitions_batches():
    """Shard-aware DataLoader: the per-process chunks are disjoint,
    contiguous in process order, and reassemble the global batch."""
    from matchnerf_tpu.data.loader import DataLoader

    class Nums:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.full((2,), float(i), np.float32)}

    full = [b["x"] for b in DataLoader(Nums(), batch_size=4, shuffle=True,
                                       seed=7, num_workers=1)]
    shards = [[b["x"] for b in DataLoader(Nums(), batch_size=4, shuffle=True,
                                          seed=7, num_workers=1,
                                          num_shards=2, shard_id=s)]
              for s in range(2)]
    # ALL partial tails drop when sharded (the tail of 2 could not shard
    # over a device mesh; a "replicated" tail of per-process different rows
    # would silently corrupt the global array): 10/4 -> 2 full batches
    assert len(shards[0]) == len(shards[1]) == 2
    for k in range(2):
        glob = np.concatenate([shards[0][k], shards[1][k]], axis=0)
        np.testing.assert_array_equal(glob, full[k])

    class Five(Nums):
        def __len__(self):
            return 5

    l0 = DataLoader(Five(), batch_size=2, shuffle=False, num_workers=1,
                    num_shards=2, shard_id=0)
    assert len(l0) == len(list(l0)) == 2


@pytest.mark.slow
def test_engine_two_process_training(tmp_path):
    """Full Coach lifecycle on a real 2-process cluster: shard-aware loader
    wiring, global-mesh dp training, and host-0-only file writes (each
    process trains into its OWN output dir; process 1's must stay empty)."""
    port = _free_port()
    out = str(tmp_path / "result")
    procs, logs = [], []
    for pid in range(2):
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["JAX_PLATFORMS"] = "cpu"
        env["MATCHNERF_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["MATCHNERF_NUM_PROCESSES"] = "2"
        env["MATCHNERF_PROCESS_ID"] = str(pid)
        log_f = open(tmp_path / f"eng{pid}.log", "w")
        logs.append(log_f)
        procs.append(subprocess.Popen(
            [sys.executable,
             os.path.join(REPO, "tests", "multihost_engine_worker.py"),
             out, str(tmp_path / "runs")],
            env=env, cwd=REPO, stdout=log_f, stderr=subprocess.STDOUT))
    rcs = []
    try:
        for p in procs:
            rcs.append(p.wait(timeout=900))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for f in logs:
            f.close()
    for pid, rc in enumerate(rcs):
        if rc != 0:
            raise AssertionError(
                f"engine worker {pid} rc={rc}\n"
                + (tmp_path / f"eng{pid}.log").read_text()[-4000:])

    results = []
    for pid in range(2):
        with open(f"{out}.{pid}.json") as f:
            results.append(json.load(f))
    # params stayed in lockstep (grad psum across the process boundary)
    np.testing.assert_allclose(results[0]["checksum"], results[1]["checksum"],
                               rtol=1e-6)
    assert results[0]["it"] == results[1]["it"] == 2  # 2 epochs x 1 batch
    # host-0-only writes
    assert results[0]["wrote_ckpt"] and results[0]["wrote_scalars"]
    assert not results[1]["wrote_ckpt"] and not results[1]["wrote_scalars"]
    # resume with per-host dirs (host 1 has no checkpoint): the host-0
    # broadcast must give BOTH hosts the trained params and progress
    for r in results:
        assert r["resume_epoch_start"] == 2 and r["resume_iter_start"] == 2, r
    np.testing.assert_allclose(results[0]["resume_checksum"],
                               results[1]["resume_checksum"], rtol=1e-6)
    np.testing.assert_allclose(results[0]["resume_checksum"],
                               results[0]["checksum"], rtol=1e-6)


@pytest.mark.slow
def test_eval_two_process_renders_match_single(tmp_path):
    """Production render_by_slices (shard_map ray sharding + full kernel
    stack, interpret mode) across a 2-process mesh == single-device pixels."""
    port = _free_port()
    out = str(tmp_path / "rgb")
    procs, logs = [], []
    for pid in range(2):
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["JAX_PLATFORMS"] = "cpu"
        env["MATCHNERF_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["MATCHNERF_NUM_PROCESSES"] = "2"
        env["MATCHNERF_PROCESS_ID"] = str(pid)
        log_f = open(tmp_path / f"ev{pid}.log", "w")
        logs.append(log_f)
        procs.append(subprocess.Popen(
            [sys.executable,
             os.path.join(REPO, "tests", "multihost_eval_worker.py"), out],
            env=env, cwd=REPO, stdout=log_f, stderr=subprocess.STDOUT))
    rcs = []
    try:
        for p in procs:
            rcs.append(p.wait(timeout=900))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for f in logs:
            f.close()
    for pid, rc in enumerate(rcs):
        if rc != 0:
            raise AssertionError(
                f"eval worker {pid} rc={rc}\n"
                + (tmp_path / f"ev{pid}.log").read_text()[-4000:])

    rgb0 = np.load(f"{out}.0.npy")
    rgb1 = np.load(f"{out}.1.npy")
    np.testing.assert_array_equal(rgb0, rgb1)

    # single-process reference on this process's 8 devices
    import jax

    import __graft_entry__ as ge
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    from matchnerf_tpu.renderer import Renderer, extract_poses
    from matchnerf_tpu.utils import DotDict

    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=8)
    cfg = DotDict(dict(cfg))
    cfg.precision = DotDict({"cond_sample_dtype": "int8",
                             "color_sample_dtype": "uint8",
                             "banded_kernel": True, "block_kernel": True,
                             "decoder_kernel": True,
                             "color_block_kernel": True})
    H, W = 16, 32
    params = init_matchnerf(jax.random.PRNGKey(0), cfg)
    d = ge._synthetic_inputs(cfg, 1, H, W, R=16)
    poses = extract_poses({"extrinsics": d["poses"], "intrinsics": d["intr"],
                           "near_fars": d["near_fars"]})
    r = Renderer(cfg)
    ref_images = jax.numpy.asarray(d["images"][:, : cfg.n_src_views])
    feats = r.encode(params, ref_images)
    tables = r.build_tables(ref_images, feats)
    ref_out = r.render_by_slices(params, poses, ref_images, feats, H, W,
                                 tables=tables)
    # cross-topology: the multi-process program's GSPMD partitioning
    # reassociates a few reductions (measured max |d| 3.2e-4) — hold it to
    # the same >=60 dB agreement budget as encoder stream sharding
    mse = float(np.mean((rgb0 - np.asarray(ref_out["rgb"])) ** 2))
    psnr = np.inf if mse == 0 else -10 * np.log10(mse)
    assert psnr >= 60.0, f"2-process eval agreement {psnr:.1f} dB"


def test_shard_batch_tree_modes():
    """mode='batch' vs 'replicated' placement on the single-process mesh
    (the multi-process raise path is exercised by construction: local-chunk
    vs full-copy ambiguity is a ValueError, not a silent guess)."""
    import jax
    from jax.sharding import PartitionSpec as P

    from matchnerf_tpu.parallel import make_mesh
    from matchnerf_tpu.parallel.mesh import shard_batch_tree

    mesh = make_mesh(n_devices=8)
    tree = {"a": np.zeros((8, 3), np.float32),     # divides the mesh
            "b": np.zeros((1, 5), np.float32)}     # does not
    out = shard_batch_tree(tree, mesh, mode="batch")
    assert out["a"].sharding.spec == P("data")
    assert out["b"].sharding.spec in (P(), P(None))
    out_r = shard_batch_tree(tree, mesh, mode="replicated")
    assert out_r["a"].sharding.spec in (P(), P(None))
    try:
        shard_batch_tree(tree, mesh, mode="bogus")
        raise AssertionError("bogus mode must be rejected")
    except AssertionError as e:
        if "bogus" not in str(e):
            raise
