"""Oracle parity for the flow-geometry helpers (GMFlow encoder family
surface; unused by the MatchNeRF runtime path but part of the API)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from torch_oracle import install_reference

install_reference()

from models.gmflow.geometry import (coords_grid as t_coords_grid,  # noqa: E402
                                    flow_warp as t_flow_warp,
                                    forward_backward_consistency_check as t_fbc,
                                    generate_window_grid as t_window_grid,
                                    normalize_coords as t_normalize)
from models.gmflow.utils import InputPadder as TorchPadder  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from matchnerf_tpu.ops import flow_geometry as fg  # noqa: E402


def test_coords_grid():
    got = np.asarray(fg.coords_grid(2, 5, 7, homogeneous=True))
    want = t_coords_grid(2, 5, 7, homogeneous=True).numpy()  # [B,3,H,W]
    np.testing.assert_array_equal(got.transpose(0, 3, 1, 2), want)


def test_window_grid_and_normalize():
    got = np.asarray(fg.generate_window_grid(-2, 2, -3, 3, 5, 7))
    want = t_window_grid(-2, 2, -3, 3, 5, 7, device=torch.device("cpu")).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)

    rng = np.random.default_rng(0)
    coords = rng.uniform(0, 10, (2, 4, 6, 2)).astype(np.float32)
    got_n = np.asarray(fg.normalize_coords(jnp.asarray(coords), 4, 6))
    want_n = t_normalize(torch.from_numpy(coords), 4, 6).numpy()
    np.testing.assert_allclose(got_n, want_n, atol=1e-6)


def test_flow_warp_with_mask():
    rng = np.random.default_rng(1)
    B, H, W, C = 2, 8, 10, 4
    feat = rng.normal(0, 1, (B, H, W, C)).astype(np.float32)
    flow = rng.normal(0, 2, (B, H, W, 2)).astype(np.float32)

    got, got_mask = fg.flow_warp(jnp.asarray(feat), jnp.asarray(flow), mask=True)
    want, want_mask = t_flow_warp(
        torch.from_numpy(feat.transpose(0, 3, 1, 2)),
        torch.from_numpy(flow.transpose(0, 3, 1, 2)), mask=True)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               want.numpy(), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_mask), want_mask.numpy())


def test_forward_backward_consistency():
    rng = np.random.default_rng(2)
    B, H, W = 1, 12, 16
    fwd = rng.normal(0, 1.5, (B, H, W, 2)).astype(np.float32)
    bwd = -fwd + rng.normal(0, 0.3, (B, H, W, 2)).astype(np.float32)

    got_f, got_b = fg.forward_backward_consistency_check(
        jnp.asarray(fwd), jnp.asarray(bwd))
    want_f, want_b = t_fbc(torch.from_numpy(fwd.transpose(0, 3, 1, 2)),
                           torch.from_numpy(bwd.transpose(0, 3, 1, 2)))
    np.testing.assert_array_equal(np.asarray(got_f), want_f.numpy())
    np.testing.assert_array_equal(np.asarray(got_b), want_b.numpy())


@pytest.mark.parametrize("mode", ["sintel", "kitti"])
def test_input_padder(mode):
    rng = np.random.default_rng(3)
    B, H, W, C = 1, 13, 21, 3
    img = rng.normal(0, 1, (B, H, W, C)).astype(np.float32)

    ours = fg.InputPadder((B, H, W, C), mode=mode)
    theirs = TorchPadder((B, C, H, W), mode=mode)

    got = np.asarray(ours.pad(jnp.asarray(img))[0])
    want = theirs.pad(torch.from_numpy(img.transpose(0, 3, 1, 2)))[0].numpy()
    np.testing.assert_array_equal(got.transpose(0, 3, 1, 2), want)

    # unpad roundtrip restores the original
    back = np.asarray(ours.unpad(jnp.asarray(got)))
    np.testing.assert_array_equal(back, img)
