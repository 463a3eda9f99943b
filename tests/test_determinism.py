"""Reproducibility: identical seeds give identical init, loaders, and steps
(the reference pins seed 0 for bit-exact published numbers, SURVEY.md §4)."""
import numpy as np

import jax
import jax.numpy as jnp

from test_engine import SyntheticDataset, tiny_cfg

from matchnerf_tpu import camera


def test_same_seed_same_training_trajectory(tmp_path):
    from matchnerf_tpu.data.loader import collate
    from matchnerf_tpu.models.matchnerf import init_matchnerf
    from matchnerf_tpu.train_step import build_optimizer, make_train_step

    cfg = tiny_cfg(tmp_path)
    tx, _ = build_optimizer(cfg, total_steps=100)
    step = make_train_step(cfg, tx, 16, 16, 32)   # shared: one compile

    def run():
        params = init_matchnerf(jax.random.PRNGKey(0), cfg)
        opt = tx.init(params)
        batch = collate([SyntheticDataset(n=1, H=16, W=16)[0]])
        dev = {k: jnp.asarray(batch[k]) for k in
               ("images", "extrinsics", "intrinsics", "near_fars")}
        dev["tgt_c2w"] = jnp.asarray(camera.pose_inverse_legacy_np(
            np.asarray(batch["extrinsics"][:, -1, :3, :])))
        rng = jax.random.PRNGKey(0)
        losses = []
        for _ in range(3):
            rng, k = jax.random.split(rng)
            params, opt, loss = step(params, opt, dev, k)
            losses.append(float(loss["all"]))
        return losses, params

    la, pa = run()
    lb, pb = run()
    assert la == lb
    for x, y in zip(jax.tree_util.tree_leaves(pa), jax.tree_util.tree_leaves(pb)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_loader_epoch_reshuffles_but_is_seeded():
    from matchnerf_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            return {"scene": f"s{i}", "x": np.zeros(1, np.float32)}

    dl = DataLoader(DS(), batch_size=2, shuffle=True, seed=0)
    ep0 = [b["scene"] for b in dl]
    ep1 = [b["scene"] for b in dl]
    assert ep0 != ep1  # epoch-dependent shuffle
    dl2 = DataLoader(DS(), batch_size=2, shuffle=True, seed=0)
    assert [b["scene"] for b in dl2] == ep0  # same seed+epoch -> same order
