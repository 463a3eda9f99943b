"""Native C++ IO kernels vs numpy/reference implementations."""
import numpy as np
import pytest

from matchnerf_tpu.data import native_io


pytestmark = pytest.mark.skipif(not native_io.is_available(),
                                reason="native lib not built (no compiler)")


def test_read_pfm_matches_python(tmp_path):
    from matchnerf_tpu.data.common import read_pfm

    rng = np.random.default_rng(0)
    data = rng.standard_normal((7, 9)).astype(np.float32)
    path = tmp_path / "t.pfm"
    with open(path, "wb") as f:
        f.write(b"Pf\n9 7\n-1.0\n")
        f.write(np.flipud(data).tobytes())

    py, _ = read_pfm(str(path))
    nat, _ = native_io.read_pfm_native(str(path))
    np.testing.assert_array_equal(py, nat)


def test_read_pfm_color_bigendian(tmp_path):
    from matchnerf_tpu.data.common import read_pfm

    rng = np.random.default_rng(1)
    data = rng.standard_normal((5, 4, 3)).astype(np.float32)
    path = tmp_path / "c.pfm"
    with open(path, "wb") as f:
        f.write(b"PF\n4 5\n1.0\n")
        f.write(np.flipud(data).astype(">f4").tobytes())
    py, _ = read_pfm(str(path))
    nat, _ = native_io.read_pfm_native(str(path))
    np.testing.assert_array_equal(py.astype(np.float32), nat)


def test_resize_nearest_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(2)
    img = rng.standard_normal((20, 30)).astype(np.float32)
    ref = cv2.resize(img, (15, 10), interpolation=cv2.INTER_NEAREST)
    nat = native_io.resize_nearest_native(img, 10, 15)
    np.testing.assert_array_equal(ref, nat)


def test_resize_bilinear_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    img = rng.standard_normal((12, 16, 3)).astype(np.float32)
    for ac in (False, True):
        ref = F.interpolate(torch.from_numpy(img.transpose(2, 0, 1))[None],
                            size=(20, 24), mode="bilinear", align_corners=ac)
        ref = ref[0].numpy().transpose(1, 2, 0)
        nat = native_io.resize_bilinear_native(img, 20, 24, align_corners=ac)
        np.testing.assert_allclose(ref, nat, atol=1e-5)


def test_u8_and_imagenet():
    rng = np.random.default_rng(4)
    u8 = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    f = native_io.u8_to_f32_native(u8)
    np.testing.assert_allclose(f, u8.astype(np.float32) / 255.0, atol=1e-7)

    img = f.copy()
    native_io.normalize_imagenet_native(img)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    np.testing.assert_allclose(img, (f - mean) / std, atol=1e-5)
