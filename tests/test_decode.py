import jax.numpy as jnp
import numpy as np
import pytest

from pemp_tpu.decode import (
    adjust_quarter,
    decode_poses,
    fill_mean,
    persons_from_clusters,
    persons_to_ann,
    refine_ae,
)
from pemp_tpu.ops import connected_components


def two_person_graph():
    """6 nodes: persons A={0,1,2}, B={3,4}, noise={5}. 3 types."""
    det = np.array(
        [
            [10, 10, 0], [12, 20, 1], [11, 30, 2],     # A
            [40, 12, 0], [42, 22, 1],                  # B
            [25, 25, 0],                               # noise
        ],
        np.int32,
    )
    scores = np.array([0.9, 0.8, 0.85, 0.95, 0.7, 0.3], np.float32)
    edges = np.array(
        [[0, 1, 3, 0, 5], [1, 2, 4, 3, 2]], np.int32
    )
    edge_pred = np.array([0.95, 0.9, 0.92, 0.1, 0.05], np.float32)
    ev = np.ones(5, bool)
    nv = np.ones(6, bool)
    return det, scores, edges, edge_pred, ev, nv


def test_persons_from_clusters():
    det, scores, edges, edge_pred, ev, nv = two_person_graph()
    labels = connected_components(
        jnp.asarray(edges), jnp.asarray(edge_pred > 0.8), 6, jnp.asarray(nv)
    )
    persons, valid = persons_from_clusters(
        jnp.asarray(det), jnp.asarray(scores), labels, jnp.asarray(nv),
        num_joints=3, max_persons=5,
    )
    persons, valid = np.asarray(persons), np.asarray(valid)
    assert valid.sum() == 2  # noise is single-joint, dropped
    a, b = persons[0], persons[1]
    np.testing.assert_allclose(a[0], [10, 10, 0.9])
    np.testing.assert_allclose(a[1], [12, 20, 0.8])
    np.testing.assert_allclose(a[2], [11, 30, 0.85])
    np.testing.assert_allclose(b[0], [40, 12, 0.95])
    np.testing.assert_allclose(b[1], [42, 22, 0.7])
    assert b[2, 2] == 0  # missing joint


def test_duplicate_type_takes_higher_score():
    det = np.array([[5, 5, 0], [6, 6, 0], [7, 7, 1]], np.int32)
    scores = np.array([0.5, 0.9, 0.8], np.float32)
    labels = jnp.zeros(3, jnp.int32)  # one cluster
    persons, valid = persons_from_clusters(
        jnp.asarray(det), jnp.asarray(scores), labels, jnp.ones(3, bool),
        num_joints=2, max_persons=3,
    )
    p = np.asarray(persons)[0]
    np.testing.assert_allclose(p[0], [6, 6, 0.9])  # argmax of type-0 scores


def test_fill_mean():
    persons = np.zeros((2, 3, 3), np.float32)
    persons[0, 0] = [10, 10, 0.9]
    persons[0, 2] = [20, 20, 0.8]
    valid = np.array([True, False])
    out = np.asarray(fill_mean(jnp.asarray(persons), jnp.asarray(valid)))
    np.testing.assert_allclose(out[0, 1, :2], [15, 15])
    assert out[0, 1, 2] == 0  # score untouched
    np.testing.assert_allclose(out[1], 0)  # invalid person untouched


def test_adjust_quarter_moves_toward_peak():
    j, h, w = 1, 16, 16
    sm = np.zeros((j, h, w), np.float32)
    sm[0, 8, 8] = 1.0
    sm[0, 8, 9] = 0.6   # gradient to the right
    sm[0, 9, 8] = 0.4   # and downward
    persons = np.zeros((1, 1, 3), np.float32)
    persons[0, 0] = [8, 8, 0.9]
    out = np.asarray(adjust_quarter(jnp.asarray(sm), jnp.asarray(persons)))
    assert out[0, 0, 0] == pytest.approx(8.75)  # +0.5 +0.25 (right bigger)
    assert out[0, 0, 1] == pytest.approx(8.75)  # +0.5 +0.25 (down bigger)


def test_refine_fills_missing_joint_from_tags():
    j, h, w = 2, 16, 16
    sm = np.zeros((j, h, w), np.float32)
    tags = np.zeros((j, h, w), np.float32) + 5.0  # far tag everywhere
    # person with tag value ~1.0; joint type 1 missing but a peak exists
    sm[0, 4, 4] = 0.9
    tags[0, 4, 4] = 1.0
    sm[1, 6, 6] = 0.7
    tags[1, 6, 6] = 1.1   # close tag -> should be claimed
    persons = np.zeros((1, 2, 3), np.float32)
    persons[0, 0] = [4, 4, 0.9]
    valid = np.array([True])
    out = np.asarray(
        refine_ae(jnp.asarray(sm), jnp.asarray(tags), jnp.asarray(persons), jnp.asarray(valid))
    )
    assert out[0, 1, 2] == pytest.approx(1e-3)
    assert abs(out[0, 1, 0] - 6.5) <= 0.3
    assert abs(out[0, 1, 1] - 6.5) <= 0.3


def test_decode_poses_end_to_end():
    det, scores, edges, edge_pred, ev, nv = two_person_graph()
    j, h, w = 3, 48, 48
    sm = np.random.RandomState(0).rand(j, h, w).astype(np.float32) * 0.05
    tags = np.zeros((j, h, w), np.float32)
    persons, valid = decode_poses(
        jnp.asarray(sm), jnp.asarray(tags), jnp.asarray(det), jnp.asarray(scores),
        jnp.asarray(edges), jnp.asarray(ev), jnp.asarray(edge_pred), jnp.asarray(nv),
        node_threshold=0.5, num_joints=3, with_refine=False,
    )
    assert np.asarray(valid).sum() == 2
    ann = persons_to_ann(
        persons, valid, (96, 96), 96, img_id=7, scaling_type="short",
        scoring_method="default",
    )
    assert len(ann) == 2
    assert ann[0]["image_id"] == 7
    assert len(ann[0]["keypoints"]) == 9
    assert ann[0]["score"] > 0


def test_decode_no_survivors_returns_none():
    det, scores, edges, edge_pred, ev, nv = two_person_graph()
    j, h, w = 3, 48, 48
    sm = np.zeros((j, h, w), np.float32)
    tags = np.zeros((j, h, w), np.float32)
    persons, valid = decode_poses(
        jnp.asarray(sm), jnp.asarray(tags), jnp.asarray(det),
        jnp.asarray(scores * 0.0),  # nothing passes the node threshold
        jnp.asarray(edges), jnp.asarray(ev), jnp.asarray(edge_pred), jnp.asarray(nv),
        node_threshold=0.5, num_joints=3, with_refine=False,
    )
    ann = persons_to_ann(persons, valid, (96, 96), 96, 1, "short")
    assert ann is None


def test_connected_components_dense_matches_sparse():
    from pemp_tpu.ops.components import (
        _connected_components_dense,
        _connected_components_sparse,
    )

    rng = np.random.RandomState(0)
    for _ in range(10):
        n, e = 60, 150
        ei = jnp.asarray(rng.randint(0, n, (2, e)))
        ev = jnp.asarray(rng.rand(e) > 0.5)
        nv = jnp.asarray(rng.rand(n) > 0.2)
        a = np.asarray(_connected_components_dense(ei, ev, n, nv))
        b = np.asarray(_connected_components_sparse(ei, ev, n, nv))
        np.testing.assert_array_equal(a, b)


def test_refine_ae_multichannel_matches_reference_oracle():
    """refine_ae with TTA tag channels vs a numpy oracle of the reference
    refine (Utils.py:1026-1104): vector-norm tag distance over channels."""
    from pemp_tpu.decode.assembly import refine_ae

    rng = np.random.RandomState(0)
    j, h, w, s, p = 5, 24, 20, 2, 3
    scoremaps = rng.rand(j, h, w).astype(np.float32)
    tagmaps = rng.randn(j, h, w, s).astype(np.float32)
    persons = np.zeros((p, j, 3), np.float32)
    for pi in range(p):
        for ji in range(j):
            if rng.rand() < 0.6:
                persons[pi, ji] = [rng.randint(w), rng.randint(h), rng.rand() + 0.1]
    person_valid = np.array([True, True, False])

    got = np.asarray(
        refine_ae(
            jnp.asarray(scoremaps), jnp.asarray(tagmaps),
            jnp.asarray(persons), jnp.asarray(person_valid),
        )
    )

    # numpy oracle (reference semantics)
    want = persons.copy()
    for pi in range(p):
        if not person_valid[pi]:
            continue
        tags = [
            tagmaps[ji, int(persons[pi, ji, 1]), int(persons[pi, ji, 0])]
            for ji in range(j) if persons[pi, ji, 2] > 0
        ]
        if not tags:
            continue
        mean_tag = np.mean(np.array(tags), axis=0)
        for ji in range(j):
            tt = np.sqrt(((tagmaps[ji] - mean_tag[None, None, :]) ** 2).sum(-1))
            tmp2 = scoremaps[ji] - np.round(tt)
            y, x = np.unravel_index(np.argmax(tmp2), tmp2.shape)
            val = scoremaps[ji, y, x]
            xx, yy = x, y
            fx = x + 0.5 + (0.25 if scoremaps[ji, yy, min(xx + 1, w - 1)] > scoremaps[ji, yy, max(xx - 1, 0)] else -0.25)
            fy = y + 0.5 + (0.25 if scoremaps[ji, min(yy + 1, h - 1), xx] > scoremaps[ji, max(yy - 1, 0), xx] else -0.25)
            if val > 0 and persons[pi, ji, 2] == 0:
                want[pi, ji] = [fx, fy, 1e-3]

    np.testing.assert_allclose(got, want, atol=1e-4)


def test_decode_poses_channels_last_equivalence():
    """channels_last=True on NHWC maps reproduces the (J, H, W) path exactly
    (the bench/TTA paths decode the model's native layout transpose-free)."""
    rng = np.random.RandomState(5)
    det, scores, edges, edge_pred, ev, nv = two_person_graph()
    j, h, w = 3, 48, 48
    sm = rng.rand(j, h, w).astype(np.float32)
    tg = rng.randn(j, h, w, 2).astype(np.float32)
    kw = dict(
        node_threshold=0.5, num_joints=j, with_fill_mean=True,
        with_refine=True, with_adjust=True,
    )
    p_ref, v_ref = decode_poses(
        jnp.asarray(sm), jnp.asarray(tg), jnp.asarray(det),
        jnp.asarray(scores), jnp.asarray(edges), jnp.asarray(ev),
        jnp.asarray(edge_pred), jnp.asarray(nv), **kw,
    )
    p_cl, v_cl = decode_poses(
        jnp.asarray(sm.transpose(1, 2, 0)), jnp.asarray(tg.transpose(1, 2, 0, 3)),
        jnp.asarray(det), jnp.asarray(scores), jnp.asarray(edges),
        jnp.asarray(ev), jnp.asarray(edge_pred), jnp.asarray(nv),
        channels_last=True, **kw,
    )
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_cl))
    np.testing.assert_allclose(np.asarray(p_ref), np.asarray(p_cl), atol=0, rtol=0)


def test_refine_adjust_channels_last_single_tag_dim():
    """(H, W, J) 3-dim tagmaps path (S=1, bench single-scale)."""
    rng = np.random.RandomState(6)
    j, h, w, p = 4, 32, 32, 5
    sm = rng.rand(j, h, w).astype(np.float32)
    tg = rng.randn(j, h, w).astype(np.float32)
    persons = rng.rand(p, j, 3).astype(np.float32) * [[w - 1, h - 1, 1]]
    persons[:, ::2, 2] = 0.0  # some missing joints
    pv = np.array([True, True, False, True, True])
    a = refine_ae(jnp.asarray(sm), jnp.asarray(tg), jnp.asarray(persons), jnp.asarray(pv))
    b = refine_ae(
        jnp.asarray(sm.transpose(1, 2, 0)), jnp.asarray(tg.transpose(1, 2, 0)),
        jnp.asarray(persons), jnp.asarray(pv), channels_last=True,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0, rtol=0)
    c = adjust_quarter(jnp.asarray(sm), jnp.asarray(persons))
    d = adjust_quarter(
        jnp.asarray(sm.transpose(1, 2, 0)), jnp.asarray(persons), channels_last=True
    )
    np.testing.assert_allclose(np.asarray(c), np.asarray(d), atol=0, rtol=0)
