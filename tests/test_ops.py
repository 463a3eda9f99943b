"""Parity tests: low-level ops vs torch (grid_sample, resize, norms, posenc, attention)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from matchnerf_tpu.ops.grid_sample import grid_sample_2d, in_frustum_mask  # noqa: E402
from matchnerf_tpu.ops.resize import (resize_bilinear_align_corners,  # noqa: E402
                                      upsample_bilinear_x2, upsample_nearest_x2)
from matchnerf_tpu.ops.norm import instance_norm_2d, layer_norm  # noqa: E402
from matchnerf_tpu.ops.posenc import (nerf_posenc, nerf_posenc_legacy,  # noqa: E402
                                      ray_sinusoid_table, sine_position_embedding_2d)
from matchnerf_tpu.ops import attention as attn_ops  # noqa: E402


@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
@pytest.mark.parametrize("align_corners", [True, False])
def test_grid_sample_matches_torch(padding_mode, align_corners):
    rng = np.random.default_rng(0)
    B, H, W, C = 2, 9, 13, 5
    feat = rng.standard_normal((B, H, W, C)).astype(np.float32)
    # include far out-of-range coords to exercise padding
    grid = rng.uniform(-1.8, 1.8, (B, 6, 7, 2)).astype(np.float32)

    ref = F.grid_sample(torch.from_numpy(feat.transpose(0, 3, 1, 2)),
                        torch.from_numpy(grid), mode="bilinear",
                        padding_mode=padding_mode, align_corners=align_corners)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    ours = np.asarray(grid_sample_2d(jnp.asarray(feat), jnp.asarray(grid),
                                     align_corners=align_corners, padding_mode=padding_mode))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_in_frustum_mask():
    grid = np.array([[[[-1.01, 0.0], [0.5, 0.5], [0.0, 1.0], [0.99, -0.99]]]], np.float32)
    m = np.asarray(in_frustum_mask(jnp.asarray(grid)))
    np.testing.assert_array_equal(m[0, 0], [0.0, 1.0, 0.0, 1.0])


def test_upsample_nearest_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 5, 6, 3)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=2.0)
    ours = np.asarray(upsample_nearest_x2(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1), atol=0)


def test_upsample_bilinear_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 5, 6, 3)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=2,
                        mode="bilinear", align_corners=False)
    ours = np.asarray(upsample_bilinear_x2(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1), atol=1e-6)


def test_resize_align_corners_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 7, 9, 3)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(12, 16),
                        mode="bilinear", align_corners=True)
    ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), 12, 16))
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1), atol=1e-5)


def test_instance_norm_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 6, 7, 4)).astype(np.float32)
    ref = F.instance_norm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = np.asarray(instance_norm_2d(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1), atol=1e-5)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((3, 10, 16)).astype(np.float32)
    scale = rng.standard_normal(16).astype(np.float32)
    bias = rng.standard_normal(16).astype(np.float32)
    ref = F.layer_norm(torch.from_numpy(x), (16,), torch.from_numpy(scale),
                       torch.from_numpy(bias))
    ours = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias)))
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-5)


def test_sine_position_embedding_matches_reference():
    from torch_oracle import install_reference
    install_reference()
    from models.gmflow.position import PositionEmbeddingSine

    pe = PositionEmbeddingSine(num_pos_feats=64)
    x = torch.zeros(1, 128, 5, 7)
    ref = pe(x).numpy()[0].transpose(1, 2, 0)  # [H,W,C]
    ours = np.asarray(sine_position_embedding_2d(5, 7, num_pos_feats=64))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_nerf_posenc_variants_match_reference():
    from torch_oracle import install_reference, reference_opts
    install_reference()
    from models.rfdecoder.cond_nerf import CondNeRF

    opts = reference_opts()
    net = CondNeRF(opts)
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 3, 4, 3)).astype(np.float32)

    ref_leg = net.positional_encoding_legacy(opts, torch.from_numpy(x), L=10).numpy()
    ours_leg = np.asarray(nerf_posenc_legacy(jnp.asarray(x), 10))
    np.testing.assert_allclose(ours_leg, ref_leg, atol=1e-5)

    opts_dev = reference_opts()
    opts_dev.device = "cpu"
    ref_std = net.positional_encoding(opts_dev, torch.from_numpy(x), L=10).numpy()
    ours_std = np.asarray(nerf_posenc(jnp.asarray(x), 10))
    np.testing.assert_allclose(ours_std, ref_std, atol=1e-5)


def test_ray_sinusoid_table_matches_reference():
    from torch_oracle import install_reference, reference_opts
    install_reference()
    from models.rfdecoder.cond_nerf import CondNeRF

    opts = reference_opts()
    opts.decoder.raytrans_posenc = True
    net = CondNeRF(opts)
    ref = net.pos_encoding.numpy()
    ours = np.asarray(ray_sinusoid_table(16, opts.nerf.sample_intvs))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_split_merge_roundtrip_and_match_reference():
    from torch_oracle import install_reference
    install_reference()
    from models.gmflow.utils import merge_splits as ref_merge
    from models.gmflow.utils import split_feature as ref_split

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 8, 12, 5)).astype(np.float32)
    ref = ref_split(torch.from_numpy(x), num_splits=2, channel_last=True).numpy()
    ours = np.asarray(attn_ops.split_feature(jnp.asarray(x), 2))
    np.testing.assert_array_equal(ours, ref)

    back = np.asarray(attn_ops.merge_splits(jnp.asarray(ours), 2))
    ref_back = ref_merge(torch.from_numpy(ref), num_splits=2, channel_last=True).numpy()
    np.testing.assert_array_equal(back, ref_back)
    np.testing.assert_array_equal(back, x)


def test_shift_window_mask_matches_reference():
    from torch_oracle import install_reference
    install_reference()
    from models.gmflow.transformer import generate_shift_window_attn_mask

    ref = generate_shift_window_attn_mask((8, 12), 4, 6, 2, 3,
                                          device=torch.device("cpu")).numpy()
    ours = np.asarray(attn_ops.generate_shift_window_attn_mask(8, 12, 4, 6, 2, 3))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("with_shift", [False, True])
def test_split_window_attention_matches_reference(with_shift):
    from torch_oracle import install_reference
    install_reference()
    from models.gmflow.transformer import (generate_shift_window_attn_mask,
                                           single_head_split_window_attention)

    rng = np.random.default_rng(8)
    B, H, W, C = 2, 8, 12, 16
    q = rng.standard_normal((B, H * W, C)).astype(np.float32)
    k = rng.standard_normal((B, H * W, C)).astype(np.float32)
    v = rng.standard_normal((B, H * W, C)).astype(np.float32)

    mask_t = generate_shift_window_attn_mask((H, W), H // 2, W // 2, H // 4, W // 4,
                                             device=torch.device("cpu"))
    ref = single_head_split_window_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
        num_splits=2, with_shift=with_shift, h=H, w=W, attn_mask=mask_t).numpy()

    mask_j = attn_ops.generate_shift_window_attn_mask(H, W, H // 2, W // 2, H // 4, W // 4)
    ours = attn_ops.split_window_attention(
        jnp.asarray(q.reshape(B, H, W, C)), jnp.asarray(k.reshape(B, H, W, C)),
        jnp.asarray(v.reshape(B, H, W, C)), num_splits=2, with_shift=with_shift,
        attn_mask=mask_j)
    np.testing.assert_allclose(np.asarray(ours).reshape(B, H * W, C), ref, atol=1e-5)


def test_full_attention_matches_reference():
    from torch_oracle import install_reference
    install_reference()
    from models.gmflow.transformer import single_head_full_attention

    rng = np.random.default_rng(9)
    q = rng.standard_normal((2, 20, 16)).astype(np.float32)
    k = rng.standard_normal((2, 20, 16)).astype(np.float32)
    v = rng.standard_normal((2, 20, 16)).astype(np.float32)
    ref = single_head_full_attention(torch.from_numpy(q), torch.from_numpy(k),
                                     torch.from_numpy(v)).numpy()
    ours = np.asarray(attn_ops.full_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
