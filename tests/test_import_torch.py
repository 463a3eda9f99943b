"""Checkpoint importer: GMFlow-pretrain key filtering and full-model mapping."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torch_oracle import install_reference

install_reference()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def test_gmflow_pretrained_filtering():
    """Mirror utils.load_gmflow_checkpoint (misc/utils.py:160-180): drop the
    flow upsampler, refine attention, and transformer layers >= cap; keep the
    randomly-initialized featup_net."""
    from models.gmflow.gmflow import GMFlow

    from matchnerf_tpu.import_torch import import_gmflow_pretrained
    from matchnerf_tpu.models.gmflow.gmflow import init_gmflow

    torch.manual_seed(0)
    # a "flow-pretrained" gmflow has 6 layers + upsampler/refine heads
    donor = GMFlow(feature_channels=128, num_transformer_layers=6,
                   feature_upsampler="none", device="cpu")
    sd = {k: v.numpy() for k, v in donor.state_dict().items()}
    # fake flow-era extra keys that must be filtered out
    sd["upsampler.conv1.weight"] = np.zeros((4, 4, 3, 3), np.float32)
    sd["feature_flow_attn.q_proj.weight"] = np.zeros((128, 128), np.float32)

    existing = init_gmflow(jax.random.PRNGKey(0), num_transformer_layers=4)
    featup_before = np.asarray(existing["featup_net"]["conv_ls"][0]["w"]).copy()
    out = import_gmflow_pretrained(sd, existing, gmflow_n_blocks=4)

    # layers capped at 4
    assert len(out["transformer"]["layers"]) == 4
    # backbone weights actually imported (match donor, transposed layout)
    np.testing.assert_allclose(
        np.asarray(out["backbone"]["conv1"]["w"]),
        sd["backbone.conv1.weight"].transpose(2, 3, 1, 0), atol=0)
    # featup_net untouched (not covered by flow weights, misc/utils.py:178)
    np.testing.assert_array_equal(
        np.asarray(out["featup_net"]["conv_ls"][0]["w"]), featup_before)


def test_full_checkpoint_importer_with_dataparallel_prefixes():
    """matchnerf_3v.pth-style dicts with DataParallel 'module.' child prefixes."""
    from torch_oracle import reference_opts

    from models.matchnerf import MatchNeRF

    from matchnerf_tpu.import_torch import import_matchnerf_checkpoint

    opts = reference_opts()
    opts.encoder.num_transformer_layers = 1
    torch.manual_seed(1)
    model = MatchNeRF(opts)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    # simulate DataParallel-wrapped children: feat_enc.module.*, nerf_dec.module.*
    sd_dp = {}
    for k, v in sd.items():
        head, rest = k.split(".", 1)
        sd_dp[f"{head}.module.{rest}"] = v

    p_plain = import_matchnerf_checkpoint(sd, num_transformer_layers=1)
    p_dp = import_matchnerf_checkpoint(sd_dp, num_transformer_layers=1)
    a = jax.tree_util.tree_leaves(p_plain)
    b = jax.tree_util.tree_leaves(p_dp)
    assert len(a) == len(b) > 0
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
