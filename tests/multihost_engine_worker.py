"""Worker for the engine-level 2-process multi-host test.

Unlike multihost_worker.py (which exercises the parallel primitives), this
drives the REAL Coach lifecycle end-to-end on a 2-process CPU gloo cluster:
`load_dataset` (shard-aware loader wiring via `_parallel_plan`),
`setup_parallel` (global mesh + replicate_tree), `train_model` (jitted dp
steps over the cross-process mesh), and the host-0-only checkpoint/scalars
gating (each process gets its OWN output dir, so a gating bug shows up as
files in process 1's dir). Writes a result json per process.
"""
import json
import os
import sys


def main():
    out_path = sys.argv[1]
    outdir_base = sys.argv[2]
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    sys.path.insert(0, "/root/repo")

    import numpy as np

    from matchnerf_tpu.parallel import distributed

    assert distributed.maybe_initialize(None)
    pid = jax.process_index()
    n_proc = jax.process_count()

    import __graft_entry__ as ge
    from matchnerf_tpu.data import datas_dict
    from matchnerf_tpu.engine import Coach
    from matchnerf_tpu.utils import DotDict

    B_GLOBAL, H, W, N = 8, 32, 32, 8

    base_cfg = ge._tiny_cfg(n_layers=1, sample_intvs=4)

    class SynthDataset:
        """Deterministic per-index synthetic scenes (sample contract of
        data/common.py): every process sees identical scene data."""

        def __init__(self, root_dir, split, n_views=3, img_wh=(W, H),
                     max_len=-1, **kw):
            self.n_views = n_views
            self.max_len = max_len

        def get_name(self):
            return "synthetic"

        def __len__(self):
            return N

        def __getitem__(self, i):
            d = ge._synthetic_inputs(base_cfg, 1, H, W, R=4, seed=int(i))
            ext4 = np.repeat(np.eye(4, dtype=np.float32)[None],
                             self.n_views + 1, 0)
            ext4[:, :3, :] = d["poses"][0]
            return {"images": d["images"][0], "extrinsics": ext4,
                    "intrinsics": d["intr"][0], "near_fars": d["near_fars"][0],
                    "view_ids": np.arange(self.n_views + 1),
                    "scene": f"scene{i}", "img_wh": np.array([W, H])}

    datas_dict["synthetic"] = SynthDataset

    cfg = DotDict(dict(base_cfg))
    cfg.batch_size = B_GLOBAL
    cfg.max_epoch = 2
    cfg.seed = 0
    cfg.load = None
    cfg.resume = False
    cfg.tb = False
    cfg.sanity_check = False
    cfg.sync_loss_every_step = True
    cfg.output_path = os.path.join(outdir_base, f"proc{pid}")
    cfg.loss_weight = DotDict(render=1)
    cfg.freq = DotDict(scalar=1, log_ep=1, ckpt_ep=1, ckpt_it=-1, val_ep=-1,
                       val_it=-1, test_ep=-1, test_ep_start=0, test_it=-1)
    cfg.data_train = DotDict(root_dir="", dataset_name="synthetic",
                             img_wh=[W, H], num_workers=1)
    cfg.nerf = DotDict(dict(cfg.nerf))
    cfg.nerf.rand_rays_train = 64

    os.makedirs(cfg.output_path, exist_ok=True)
    coach = Coach(cfg)
    coach.load_dataset(["train"])
    # shard wiring decided by _parallel_plan: dp-batch over all 8 devices
    assert coach.train_loader.num_shards == n_proc, coach.train_loader.num_shards
    assert coach.train_loader.shard_id == pid
    coach.build_networks()
    coach.setup_optimizer()
    coach.restore_checkpoint_if_needed()
    coach.train_model()

    assert coach.parallel_mode == "batch", coach.parallel_mode
    checksum = float(jax.jit(lambda p: sum(
        jax.numpy.sum(jax.numpy.abs(x))
        for x in jax.tree_util.tree_leaves(p)))(coach.params))

    result = {"pid": pid, "it": coach.it, "checksum": checksum,
              "is_main": distributed.is_main_process(),
              "wrote_ckpt": os.path.exists(
                  os.path.join(cfg.output_path, "models", "latest.ckpt")),
              "wrote_scalars": os.path.exists(coach.scalars_path)}

    # resume on a "cluster without a shared filesystem": only host 0's
    # output dir has models/latest.ckpt; the other host hits the scratch
    # branch and must adopt host 0's params/progress via the broadcast
    # (engine._sync_state_from_host0)
    cfg2 = DotDict(dict(cfg))
    cfg2.resume = True
    coach2 = Coach(cfg2)
    coach2.load_dataset(["train"])
    coach2.build_networks()
    coach2.setup_optimizer()
    coach2.restore_checkpoint_if_needed()
    checksum2 = float(jax.jit(lambda p: sum(
        jax.numpy.sum(jax.numpy.abs(x))
        for x in jax.tree_util.tree_leaves(p)))(coach2.params))
    result["resume_epoch_start"] = coach2.epoch_start
    result["resume_iter_start"] = coach2.iter_start
    result["resume_checksum"] = checksum2
    with open(f"{out_path}.{pid}.json", "w") as f:
        json.dump(result, f)
    print(f"engine worker {pid}: OK {result}")


if __name__ == "__main__":
    main()
