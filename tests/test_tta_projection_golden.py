"""Golden: TTA canvas projection vs the reference's torch interpolate.

The reference's multi-scale aggregation resizes each scale's heatmaps/tags/
features to the base canvas with ``F.interpolate(mode='bilinear',
align_corners=False)`` (reference: src/Utils/hr_utils/
multi_scales_testing.py:42-195 and PoseEstimation.py:329-452 project2image).
Our ``tta.multi_scale.project_region`` must reproduce it bit-for-bit on the
interior — including DOWNSCALING (scales > 1 project down to the base
canvas), which requires antialias=False — with the only deviation a bounded
<=1-px border band when the source region is a subregion of a padded
tensor (the kernel reads padding zeros instead of clamping at the edge).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from pemp_tpu.tta.multi_scale import project_region


def _torch_oracle(x, out_h, out_w):
    t = torch.from_numpy(x.transpose(2, 0, 1))[None]
    o = torch.nn.functional.interpolate(
        t, size=(out_h, out_w), mode="bilinear", align_corners=False
    )
    return o[0].numpy().transpose(1, 2, 0)


@pytest.mark.parametrize(
    "src,dst",
    [
        ((40, 52), (80, 104)),   # upscale 2x (scale 0.5 -> base)
        ((80, 104), (40, 52)),   # downscale 2x (scale 2 -> base)
        ((37, 53), (80, 104)),   # odd upscale
        ((41, 61), (100, 88)),   # mixed directions
    ],
)
def test_full_tensor_projection_matches_torch_exactly(src, dst):
    """No padding: region == tensor; projection must match everywhere."""
    rng = np.random.RandomState(0)
    x = rng.rand(*src, 5).astype(np.float32)
    want = _torch_oracle(x, *dst)
    got = np.asarray(project_region(
        jnp.asarray(x), float(src[0]), float(src[1]), dst[0], dst[1]
    ))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize(
    "region,pad,dst",
    [
        ((40, 52), (64, 64), (80, 104)),   # upscale from padded subregion
        ((80, 104), (128, 128), (40, 52)),  # downscale from padded subregion
    ],
)
def test_padded_subregion_interior_exact_border_bounded(region, pad, dst):
    """Padded source: interior pixels (those whose bilinear support lies
    inside the valid region) match torch exactly; border pixels deviate by
    at most the signal magnitude and only in a <=1-src-px band."""
    rng = np.random.RandomState(1)
    rh, rw = region
    ph, pw = pad
    x = np.zeros((ph, pw, 3), np.float32)
    x[:rh, :rw] = rng.rand(rh, rw, 3) + 1.0  # keep away from the zero pad
    want = _torch_oracle(x[:rh, :rw], *dst)
    got = np.asarray(project_region(
        jnp.asarray(x), float(rh), float(rw), dst[0], dst[1]
    ))

    oh, ow = dst
    # output pixel o samples input coords (o + 0.5) * r - 0.5 +- 1; interior
    # = support fully inside [0, region): the deviation band is the set of
    # output pixels whose support touches row >= rh - 1 + eps (i.e. reads
    # x[rh] = padding) — at most ceil(1/r) + 1 border rows/cols
    ry, rx_ = rh / oh, rw / ow
    ys = (np.arange(oh) + 0.5) * ry - 0.5
    xs = (np.arange(ow) + 0.5) * rx_ - 0.5
    in_y = np.ceil(ys + 1e-6) <= rh - 1
    in_x = np.ceil(xs + 1e-6) <= rw - 1
    interior = in_y[:, None] & in_x[None, :]
    band_y = int(np.sum(~in_y))
    band_x = int(np.sum(~in_x))
    assert band_y <= int(np.ceil(1 / ry)) + 1
    assert band_x <= int(np.ceil(1 / rx_)) + 1

    np.testing.assert_allclose(
        got[interior], want[interior], atol=1e-5, rtol=1e-5
    )
    # the border band deviates (kernel reads zero padding, torch clamps):
    # bounded by the local signal magnitude. An empty band (downscale whose
    # bilinear support never reaches the pad) means the projection is exact
    # everywhere — also fine.
    border_delta = np.abs(got - want)[~interior]
    if border_delta.size:
        assert border_delta.max() <= np.abs(want).max()
        assert border_delta.max() < 1.5, border_delta.max()


def test_multiscale_average_matches_reference_chain():
    """Three scales projected + averaged like aggregate_results_mpn
    (multi_scales_testing.py:120-161): full-tensor case equals the torch
    chain exactly."""
    rng = np.random.RandomState(2)
    base = (60, 80)
    srcs = [(120, 160), (60, 80), (30, 40)]
    acc_t = np.zeros((*base, 4), np.float32)
    acc_j = np.zeros((*base, 4), np.float32)
    for s in srcs:
        x = rng.rand(*s, 4).astype(np.float32)
        acc_t += _torch_oracle(x, *base)
        acc_j += np.asarray(project_region(
            jnp.asarray(x), float(s[0]), float(s[1]), base[0], base[1]
        ))
    np.testing.assert_allclose(
        acc_j / len(srcs), acc_t / len(srcs), atol=2e-5, rtol=1e-5
    )
