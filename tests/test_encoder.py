"""Parity: GMFlow encoder (backbone / transformer / upsampler / top-level)
vs the torch reference, through the weight importer."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torch_oracle import install_reference

install_reference()

from models.gmflow.backbone import CNNEncoder  # noqa: E402
from models.gmflow.gmflow import GMFlow  # noqa: E402
from models.gmflow.superres import UpSampler  # noqa: E402
from models.gmflow.transformer import FeatureTransformer  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from matchnerf_tpu.import_torch import (_import_backbone,  # noqa: E402
                                        _import_transformer, _import_upsampler,
                                        import_gmflow_params)
from matchnerf_tpu.models.gmflow.backbone import apply_cnn_encoder  # noqa: E402
from matchnerf_tpu.models.gmflow.gmflow import (  # noqa: E402
    gmflow_extract_pair_features, normalize_images)
from matchnerf_tpu.models.gmflow.superres import apply_upsampler  # noqa: E402
from matchnerf_tpu.models.gmflow.transformer import apply_feature_transformer  # noqa: E402


def test_backbone_parity():
    torch.manual_seed(0)
    net = CNNEncoder(output_dim=128, num_output_scales=1)
    net.eval()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 32, 48)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x))[0].numpy().transpose(0, 2, 3, 1)
    sd = {f"backbone.{k}": v.numpy() for k, v in net.state_dict().items()}
    params = _import_backbone(sd)
    ours = np.asarray(apply_cnn_encoder(params, jnp.asarray(x.transpose(0, 2, 3, 1)))[0])
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-4)


@pytest.mark.parametrize("attn_splits", [1, 2])
def test_transformer_parity(attn_splits):
    torch.manual_seed(1)
    net = FeatureTransformer(num_layers=6, d_model=128, nhead=1,
                             attention_type="swin", ffn_dim_expansion=4)
    net.eval()
    rng = np.random.default_rng(1)
    B, C, H, W = 2, 128, 8, 12
    f0 = rng.standard_normal((B, C, H, W)).astype(np.float32)
    f1 = rng.standard_normal((B, C, H, W)).astype(np.float32)
    with torch.no_grad():
        r0, r1 = net(torch.from_numpy(f0), torch.from_numpy(f1),
                     attn_num_splits=attn_splits)
    sd = {f"transformer.{k}": v.numpy() for k, v in net.state_dict().items()}
    params = _import_transformer(sd)
    o0, o1 = apply_feature_transformer(
        params, jnp.asarray(f0.transpose(0, 2, 3, 1)), jnp.asarray(f1.transpose(0, 2, 3, 1)),
        attn_num_splits=attn_splits)
    np.testing.assert_allclose(np.asarray(o0), r0.numpy().transpose(0, 2, 3, 1),
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(o1), r1.numpy().transpose(0, 2, 3, 1),
                               atol=1e-3, rtol=1e-4)


def test_upsampler_parity():
    torch.manual_seed(2)
    net = UpSampler(n_feat=16, upsample_factor=2)
    net.eval()
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 16, 6, 8)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)
    sd = {f"featup_net.{k}": v.numpy() for k, v in net.state_dict().items()}
    params = _import_upsampler(sd)
    ours = np.asarray(apply_upsampler(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_normalize_images_parity():
    torch.manual_seed(3)
    gm = GMFlow(feature_channels=8, num_transformer_layers=1, feature_upsampler="none",
                device="cpu")
    rng = np.random.default_rng(3)
    imgs = rng.uniform(0, 1, (1, 3, 3, 8, 8)).astype(np.float32)
    ref = gm.normalize_images(torch.from_numpy(imgs)).numpy()
    ours = np.asarray(normalize_images(jnp.asarray(imgs.transpose(0, 1, 3, 4, 2))))
    np.testing.assert_allclose(ours.transpose(0, 1, 4, 2, 3), ref, atol=1e-6)


def test_gmflow_full_parity():
    """Top-level encoder (pair expansion + PE + transformer + upsampler) with
    keep_raw_feats, matching MatchNeRF.get_img_feat's consumption layout."""
    torch.manual_seed(4)
    net = GMFlow(feature_channels=128, num_scales=1, num_head=1, attention_type="swin",
                 ffn_dim_expansion=4, feature_upsampler="network", upsample_factor=2,
                 num_transformer_layers=6, device="cpu")
    net.eval()
    rng = np.random.default_rng(4)
    B, V, H, W = 1, 3, 32, 48
    imgs = rng.uniform(0, 1, (B, V, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        out = net(imgs=torch.from_numpy(imgs), attn_splits_list=[2],
                  keep_raw_feats=True, wo_self_attn=False)

    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params = import_gmflow_params(sd)
    scales = gmflow_extract_pair_features(
        params, jnp.asarray(imgs.transpose(0, 1, 3, 4, 2)), attn_splits_list=[2],
        n_views=V, keep_raw_feats=True)

    assert len(scales) == len(out["aug_feat0s"]) == 2
    for s_idx in range(2):
        ref0 = out["aug_feat0s"][s_idx].numpy()   # [B, P, C, h, w]
        ref1 = out["aug_feat1s"][s_idx].numpy()
        ours = np.asarray(scales[s_idx])          # [B, P, 2, h, w, C]
        np.testing.assert_allclose(ours[:, :, 0].transpose(0, 1, 4, 2, 3), ref0,
                                   atol=2e-3, rtol=1e-4)
        np.testing.assert_allclose(ours[:, :, 1].transpose(0, 1, 4, 2, 3), ref1,
                                   atol=2e-3, rtol=1e-4)


def test_backbone_nchw_matches_nhwc():
    """encoder.conv_data_format=NCHW (lane-utilization experiment) is a pure
    relayout: same math, fwd + grads match NHWC (reductions reassociate ->
    tolerance, not bit-equality)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from matchnerf_tpu.models.gmflow.backbone import (apply_cnn_encoder,
                                                      init_cnn_encoder)

    rng = np.random.default_rng(0)
    p = init_cnn_encoder(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((2, 32, 48, 3)).astype(np.float32))

    def run(fmt):
        def loss(p, x):
            outs = apply_cnn_encoder(p, x, data_format=fmt)
            return sum(jnp.sum(o * o) for o in outs)
        (out,) = apply_cnn_encoder(p, x, data_format=fmt)
        g = jax.grad(loss)(p, x)
        return out, g

    out_h, g_h = run("NHWC")
    out_c, g_c = run("NCHW")
    assert out_h.shape == out_c.shape
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_h),
                               rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_h),
                    jax.tree_util.tree_leaves(g_c)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-4)
