"""Worker process for the 2-process CPU multi-host test (test_multihost.py).

Each process owns 4 virtual CPU devices (8 global) and cross-process
collectives ride gloo. The worker exercises the REAL multi-host seams the
engine uses: `parallel.distributed.maybe_initialize` (from MATCHNERF_* env),
the shard-aware `DataLoader` (each process decodes only its chunk of the
global batch), `replicate_tree`/`shard_batch_tree` global-array assembly,
and the unchanged jitted train step — first dp-batch mode, then the
flagship batch_size=1 ray-sharded mode. Writes its losses to
`<out>.<pid>.json`; the test compares them against a single-process
8-device run of the identical schedule.
"""
import json
import os
import sys


def main():
    out_path = sys.argv[1]
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    sys.path.insert(0, "/root/repo")

    import numpy as np

    from matchnerf_tpu.parallel import (distributed, make_mesh,
                                        replicate_tree)
    from matchnerf_tpu.parallel.mesh import shard_batch_tree

    assert distributed.maybe_initialize(None), "env-driven init must engage"
    n_proc = int(os.environ["MATCHNERF_NUM_PROCESSES"])
    assert jax.process_count() == n_proc, jax.process_count()
    assert len(jax.devices()) == 4 * n_proc, jax.devices()
    pid = jax.process_index()

    import __graft_entry__ as ge
    from matchnerf_tpu.data.loader import DataLoader
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    from matchnerf_tpu.train_step import build_optimizer, make_train_step

    cfg = ge._tiny_cfg(n_layers=1, sample_intvs=4)
    B, H, W = 8, 16, 16
    d = ge._synthetic_inputs(cfg, B, H, W, R=16)

    class RowDataset:
        """One sample per global-batch row (images differ per row, so any
        shard-placement error shows up in the loss)."""

        def __len__(self):
            return B

        def __getitem__(self, i):
            return {"images": d["images"][i], "extrinsics": d["poses"][i],
                    "intrinsics": d["intr"][i], "near_fars": d["near_fars"][i],
                    "tgt_c2w": d["tgt_c2w"][i]}

    loader = DataLoader(RowDataset(), batch_size=B, shuffle=False,
                        num_workers=1, num_shards=n_proc, shard_id=pid)
    (local_batch,) = list(loader)
    assert local_batch["images"].shape[0] == B // n_proc

    mesh = make_mesh()
    params_h = init_matchnerf(jax.random.PRNGKey(0), cfg)
    tx, _ = build_optimizer(cfg, total_steps=100)
    opt_h = tx.init(params_h)
    params = replicate_tree(params_h, mesh)
    opt_state = replicate_tree(opt_h, mesh)

    result = {"pid": pid}

    # (a) dp-batch mode: global batch sharded over all 8 devices
    step = make_train_step(cfg, tx, H, W, n_rays=16)
    batch = shard_batch_tree(local_batch, mesh)
    rng = jax.random.PRNGKey(1)
    p1, o1, loss1 = step(params, opt_state, batch, rng)
    p2, _, loss2 = step(p1, o1, batch, jax.random.PRNGKey(2))
    result["loss_dp"] = [float(loss1["all"]), float(loss2["all"])]
    checksum = jax.jit(lambda p: sum(
        jax.numpy.sum(jax.numpy.abs(x))
        for x in jax.tree_util.tree_leaves(p)))(p2)
    result["param_checksum_dp"] = float(checksum)

    # (b) ray-sharded mode at batch_size=1: data replicated on every host,
    # the 16-ray axis sharded over the global mesh
    d1 = ge._synthetic_inputs(cfg, 1, H, W, R=16)
    batch1 = shard_batch_tree({
        "images": d1["images"], "extrinsics": d1["poses"],
        "intrinsics": d1["intr"], "near_fars": d1["near_fars"],
        "tgt_c2w": d1["tgt_c2w"]}, mesh, mode="replicated")
    step_rays = make_train_step(cfg, tx, H, W, n_rays=16, mesh=mesh,
                                shard_rays=True)
    _, _, loss_r = step_rays(params, opt_state, batch1, jax.random.PRNGKey(3))
    result["loss_rays"] = float(loss_r["all"])

    result["is_main"] = distributed.is_main_process()
    with open(f"{out_path}.{pid}.json", "w") as f:
        json.dump(result, f)
    print(f"worker {pid}: OK {result}")


if __name__ == "__main__":
    main()
