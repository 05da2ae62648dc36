import jax
import jax.numpy as jnp
import numpy as np

from pemp_tpu.ops import joint_det_from_scoremaps, nms_mask


def reference_nms(scoremap, pool_kernel):
    """numpy oracle of reference non_maximum_suppression (Utils.py:15-20)."""
    j, h, w = scoremap.shape
    pad = pool_kernel // 2
    padded = np.full((j, h + 2 * pad, w + 2 * pad), -np.inf)
    padded[:, pad : pad + h, pad : pad + w] = scoremap
    pooled = np.zeros_like(scoremap)
    for y in range(h):
        for x in range(w):
            pooled[:, y, x] = padded[:, y : y + pool_kernel, x : x + pool_kernel].max(
                axis=(1, 2)
            )
    return np.equal(pooled, scoremap)


def reference_joint_det(scoremap, num_joints, threshold, pool_kernel, mask, hybrid_k):
    """numpy oracle of joint_det_from_scoremap (ConstructGraph.py:1161-1196)."""
    joint_map = reference_nms(scoremap, pool_kernel).astype(np.float64)
    if mask is not None:
        joint_map = joint_map * mask[None]
    masked = scoremap * joint_map
    dets = set()
    if threshold is not None:
        flat = masked.reshape(num_joints, -1)
        for t in range(num_joints):
            order = np.argsort(-flat[t], kind="stable")[:hybrid_k]
            for idx in order:
                if flat[t, idx] > 0:
                    dets.add((idx % masked.shape[2], idx // masked.shape[2], t))
        tt, yy, xx = np.nonzero(np.where(masked < threshold, 0, masked))
        for t, y, x in zip(tt, yy, xx):
            dets.add((x, y, t))
    return dets


def test_nms_mask_matches_oracle():
    rng = np.random.RandomState(0)
    sm = rng.rand(3, 16, 16).astype(np.float32)
    got = np.asarray(nms_mask(jnp.asarray(sm), 3))
    want = reference_nms(sm, 3)
    np.testing.assert_array_equal(got, want)


def test_detection_set_matches_reference():
    rng = np.random.RandomState(1)
    j, h, w = 4, 32, 32
    # realistic: near-zero background, a handful of strong peaks per type
    sm = rng.rand(j, h, w).astype(np.float32) * 0.05
    for t in range(j):
        for _ in range(6):
            y, x = rng.randint(2, h - 2), rng.randint(2, w - 2)
            sm[t, y, x] = rng.uniform(0.5, 1.0)
    mask = np.ones((h, w), np.float32)
    mask[:4, :4] = 0.0

    det, scores, valid = joint_det_from_scoremaps(
        jnp.asarray(sm)[None], k_per_type=40, threshold=0.1, pool_kernel=3,
        mask=jnp.asarray(mask)[None], hybrid_k=5,
    )
    got = {
        tuple(map(int, det[0, i]))
        for i in range(det.shape[1])
        if bool(valid[0, i])
    }
    want = reference_joint_det(sm.astype(np.float64), j, 0.1, 3, mask, 5)
    assert got == want
    # scores are the masked scoremap values
    for i in range(det.shape[1]):
        if bool(valid[0, i]):
            x, y, t = map(int, det[0, i])
            assert abs(float(scores[0, i]) - sm[t, y, x]) < 1e-6


def test_detection_no_threshold_top20():
    rng = np.random.RandomState(2)
    sm = rng.rand(2, 24, 24).astype(np.float32)
    det, scores, valid = joint_det_from_scoremaps(
        jnp.asarray(sm)[None], k_per_type=20, threshold=None, pool_kernel=3,
    )
    assert bool(valid.all())
    assert det.shape == (1, 40, 3)
    # types blocked: first 20 are type 0
    assert set(np.asarray(det[0, :20, 2]).tolist()) == {0}
    assert set(np.asarray(det[0, 20:, 2]).tolist()) == {1}


def test_detection_truncates_to_top_k_when_oversubscribed():
    """When more than K peaks pass the threshold, the K highest-scoring
    survive (documented TPU-native deviation from the unbounded reference)."""
    rng = np.random.RandomState(4)
    sm = rng.rand(1, 32, 32).astype(np.float32)  # dense: everything > 0.1
    k = 16
    det, scores, valid = joint_det_from_scoremaps(
        jnp.asarray(sm)[None], k_per_type=k, threshold=0.1, pool_kernel=3
    )
    got_scores = np.sort(np.asarray(scores[0])[np.asarray(valid[0])])[::-1]
    masked = sm[0] * reference_nms(sm, 3)[0]
    want = np.sort(masked.reshape(-1))[::-1][:k]
    want = want[want > 0]
    np.testing.assert_allclose(got_scores, want[: len(got_scores)], rtol=1e-6)


def test_type_blocked_layout():
    rng = np.random.RandomState(3)
    sm = rng.rand(17, 32, 32).astype(np.float32)
    k = 8
    det, _, _ = joint_det_from_scoremaps(
        jnp.asarray(sm)[None], k_per_type=k, threshold=0.1, pool_kernel=3
    )
    types = np.asarray(det[0, :, 2])
    want = np.repeat(np.arange(17), k)
    np.testing.assert_array_equal(types, want)


def test_blocked_top_k_exact():
    """blocked_top_k must match lax.top_k exactly (values and indices),
    including tie-breaking by lowest index, at shapes that split into blocks
    and shapes that fall back to the plain path."""
    from pemp_tpu.ops.detection import blocked_top_k

    rng = np.random.RandomState(0)
    for n, block in [(8192, 2048), (100, 2048), (4096, 1024)]:
        x = rng.rand(3, 5, n).astype(np.float32)
        # inject ties spanning block boundaries
        x[..., : n // 2] = np.round(x[..., : n // 2], 1)
        sv, iv = jax.lax.top_k(jnp.asarray(x), 40)
        sb, ib = blocked_top_k(jnp.asarray(x), 40, block=block)
        np.testing.assert_array_equal(np.asarray(sv), np.asarray(sb))
        np.testing.assert_array_equal(np.asarray(iv), np.asarray(ib))
