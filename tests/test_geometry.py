import numpy as np
import pytest

from pemp_tpu.geometry import (
    get_affine_transform,
    get_multi_scale_size,
    get_transform,
    kpt_affine,
    resize_bilinear,
    reverse_affine_map,
    three_point_affine,
    warp_affine,
)


def test_three_point_affine_identity():
    pts = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    m = three_point_affine(pts, pts)
    np.testing.assert_allclose(m, np.array([[1, 0, 0], [0, 1, 0]]), atol=1e-9)


def test_three_point_affine_maps_points():
    src = np.array([[0.0, 0.0], [2.0, 0.0], [0.0, 2.0]])
    dst = np.array([[1.0, 1.0], [5.0, 1.0], [1.0, 7.0]])
    m = three_point_affine(src, dst)
    out = kpt_affine(src, m)
    np.testing.assert_allclose(out, dst, atol=1e-9)


def test_get_multi_scale_size_short_side_64():
    # 640x480 landscape, input 512: short side (h) resized to 512
    (w, h), center, scale = get_multi_scale_size(480, 640, 512, 1.0, 1.0)
    assert h == 512
    assert w % 64 == 0
    assert w == int(int((512 / 480 * 640 + 63) // 64 * 64))
    np.testing.assert_allclose(scale[0], w / h * 480 / 200.0)
    np.testing.assert_allclose(scale[1], 480 / 200.0)


@pytest.mark.parametrize("hw", [(480, 640), (640, 480), (427, 640), (640, 427)])
@pytest.mark.parametrize("scaling_type", ["short", "short_with_resize"])
def test_affine_roundtrip(hw, scaling_type):
    """Forward-map GT keypoints into model space, reverse-map back: identity."""
    h, w = hw
    input_size = 512
    rng = np.random.RandomState(0)
    kpts = np.zeros((2, 17, 3))
    kpts[:, :, 0] = rng.uniform(50, min(w, h) - 50, (2, 17))
    kpts[:, :, 1] = rng.uniform(50, min(w, h) - 50, (2, 17))
    kpts[:, :, 2] = 1

    resized, center, scale = get_multi_scale_size(h, w, input_size, 1.0, 1.0)
    if scaling_type == "short":
        out_size = (int(resized[0] / 2), int(resized[1] / 2))
    else:
        out_size = (int(resized[0]), int(resized[1]))
    fwd = get_affine_transform(center, scale, out_size)
    mapped = kpts.copy()
    mapped[:, :, :2] = kpt_affine(kpts[:, :, :2], fwd)

    back = reverse_affine_map(mapped.copy(), (w, h), input_size, scaling_type)
    np.testing.assert_allclose(back[:, :, :2], kpts[:, :, :2], atol=1e-6)


def test_reverse_affine_map_long_roundtrip():
    h, w = 480, 640
    scale = np.array([max(h, w) / 200.0] * 2)
    mat = get_transform(np.array((w / 2, h / 2)), scale, (512, 512))
    kpts = np.zeros((1, 17, 3))
    rng = np.random.RandomState(1)
    kpts[:, :, 0] = rng.uniform(0, w, (1, 17))
    kpts[:, :, 1] = rng.uniform(0, h, (1, 17))
    mapped = kpts.copy()
    mapped[:, :, :2] = kpt_affine(kpts[:, :, :2], mat[:2]) / 4.0  # model space = 128
    back = reverse_affine_map(mapped.copy(), (w, h), 512, "long")
    np.testing.assert_allclose(back[:, :, :2], kpts[:, :, :2], atol=1e-5)


def test_warp_affine_identity():
    img = np.arange(48, dtype=np.float32).reshape(6, 8)
    m = np.array([[1.0, 0, 0], [0, 1.0, 0]])
    out = warp_affine(img, m, (8, 6))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_warp_affine_translation():
    img = np.zeros((6, 8), dtype=np.float32)
    img[2, 3] = 1.0
    m = np.array([[1.0, 0, 2.0], [0, 1.0, 1.0]])  # shift x+2, y+1
    out = warp_affine(img, m, (8, 6))
    assert out[3, 5] == pytest.approx(1.0)


def test_resize_bilinear_2x():
    img = np.array([[0.0, 1.0], [2.0, 3.0]], dtype=np.float32)
    out = resize_bilinear(img, (4, 4))
    assert out.shape == (4, 4)
    assert out[0, 0] == pytest.approx(0.0)
    assert out[3, 3] == pytest.approx(3.0)
    # center is average
    assert np.mean(out) == pytest.approx(np.mean(img), abs=1e-6)
