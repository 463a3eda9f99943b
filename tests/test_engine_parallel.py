"""Coach-level data-parallel training over the virtual CPU mesh."""
import numpy as np

import jax

from test_engine import SyntheticDataset, tiny_cfg

from matchnerf_tpu.utils import DotDict


def test_coach_trains_data_parallel(tmp_path):
    from matchnerf_tpu.data.loader import DataLoader
    from matchnerf_tpu.engine import Coach
    from matchnerf_tpu.train_step import make_train_step

    cfg = tiny_cfg(tmp_path)
    cfg.batch_size = 4
    cfg.max_epoch = 5
    cfg.parallel = DotDict(data_parallel=4, mesh_axes=["data"])
    cfg.data_train = DotDict(root_dir="", dataset_name="dtu", img_wh=[16, 16],
                             num_workers=1, max_len=-1)

    coach = Coach(cfg)
    coach.train_loader = DataLoader(SyntheticDataset(n=8, H=16, W=16),
                                    batch_size=4, shuffle=False, num_workers=1)
    coach.build_networks()
    coach.setup_optimizer()
    coach.setup_parallel()
    assert coach.mesh is not None and coach.mesh.devices.size == 4

    coach.timer = {"start": 0.0, "it_mean": None}
    coach.it, coach.ep = 0, 0
    coach.val_it = coach.test_it = coach.ckpt_it = -1
    coach._train_step = make_train_step(cfg, coach.tx, 16, 16, 16)
    coach._rng = jax.random.PRNGKey(0)

    batches = list(coach.train_loader)
    losses = []
    for _ in range(3):
        for b in batches:
            losses.append(float(coach.train_iteration(b)["all"]))
    assert np.isfinite(losses).all()
    # params remain replicated and finite after sharded updates
    for leaf in jax.tree_util.tree_leaves(coach.params):
        assert np.isfinite(np.asarray(leaf)).all()
