import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pemp_tpu.graph import GCConfig, construct_graph_batch
from pemp_tpu.ops import hungarian_numpy

pytestmark = pytest.mark.slow  # heavy compiles; excluded by -m 'not slow'


def make_scene(rng, j=4, h=48, w=48, people=2):
    """Synthetic scoremaps with known GT poses."""
    sm = np.zeros((j, h, w), np.float32)
    joints = np.zeros((people, j, 3), np.float32)
    for p in range(people):
        cx, cy = rng.randint(8, w - 8), rng.randint(8, h - 8)
        for t in range(j):
            x = np.clip(cx + rng.randint(-4, 5), 0, w - 1)
            y = np.clip(cy + rng.randint(-4, 5), 0, h - 1)
            sm[t, y, x] = rng.uniform(0.6, 1.0)
            joints[p, t] = (x, y, 2)
    factors = np.full((people, j), 20.0, np.float32)
    return sm, joints, factors


def pad_people(joints, factors, max_people=30):
    p, j = joints.shape[:2]
    jo = np.zeros((max_people, j, 3), np.float32)
    fo = np.ones((max_people, j), np.float32)
    jo[:p] = joints
    fo[:p] = factors
    return jo, fo


@pytest.fixture(scope="module")
def cfg():
    return GCConfig(
        num_joints=4, nodes_per_type=10, knn_k=6, detect_threshold=0.1,
        hybrid_k=2, matching_radius=0.5, edge_label_method=6,
        mask_crowds=False,
    )


def build(cfg, sm, joints, factors):
    j, h, w = sm.shape
    scoremaps = jnp.asarray(sm.transpose(1, 2, 0))[None]  # NHWC
    features = jnp.asarray(
        np.random.RandomState(0).rand(1, h, w, 8).astype(np.float32)
    )
    tagmaps = jnp.zeros((1, h, w, j))
    jo, fo = pad_people(joints, factors)
    return construct_graph_batch(
        cfg, scoremaps, features, tagmaps,
        joints_gt=jnp.asarray(jo)[None], factors=jnp.asarray(fo)[None],
    )


def test_labels_method6_simple_scene(cfg):
    rng = np.random.RandomState(0)
    sm, joints, factors = make_scene(rng)
    gb = build(cfg, sm, joints, factors)

    det = np.asarray(gb.joint_det)
    valid = np.asarray(gb.node_valid)
    persons = np.asarray(gb.node_persons)
    node_labels = np.asarray(gb.node_labels)

    # every GT joint should be matched to the detection at its position
    for p in range(2):
        for t in range(4):
            x, y, _ = joints[p, t]
            hits = [
                i for i in range(len(det))
                if valid[i] and det[i, 2] == t and det[i, 0] == x and det[i, 1] == y
            ]
            assert hits, (p, t)
            assert any(persons[i] == p for i in hits)
            assert all(node_labels[i] == 1.0 for i in hits if persons[i] == p)

    # edge labels: 1 iff same matched person on both ends
    ei = np.asarray(gb.edge_index)
    ev = np.asarray(gb.edge_valid)
    el = np.asarray(gb.edge_labels)
    for e in range(ei.shape[1]):
        if not ev[e]:
            continue
        ps, pd = persons[ei[0, e]], persons[ei[1, e]]
        want = 1.0 if (ps >= 0 and ps == pd) else 0.0
        assert el[e] == want

    # label mask is 1 (no neighbours -> no ambiguity; edges exist)
    lm = np.asarray(gb.label_mask)
    assert lm[ev].max() == 1.0


def test_labels_match_hungarian_oracle(cfg):
    """On-device matching agrees with exact host Hungarian on the same
    similarity matrix (same-type pass)."""
    rng = np.random.RandomState(1)
    sm, joints, factors = make_scene(rng, people=3)
    gb = build(cfg, sm, joints, factors)

    det = np.asarray(gb.joint_det)
    valid = np.asarray(gb.node_valid)
    # build the same-type similarity matrix as the constructor does
    jo, fo = pad_people(joints, factors)
    gt = jo.reshape(-1, 3)
    fac = fo.reshape(-1)
    gt_type = np.tile(np.arange(4), 30)
    sim = np.zeros((len(gt), len(det)))
    for r in range(len(gt)):
        if gt[r, 2] <= 0:
            continue
        for c in range(len(det)):
            if not valid[c] or det[c, 2] != gt_type[r]:
                continue
            d2 = np.sum((np.round(gt[r, :2]) - det[c, :2]) ** 2)
            s = np.exp(-d2 / fac[r])
            sim[r, c] = s if s >= cfg.matching_radius else 0.0
    sol = hungarian_numpy(sim)
    persons = np.asarray(gb.node_persons)
    gt_person = np.repeat(np.arange(30), 4)
    for r, c in enumerate(sol):
        if c >= 0:
            assert persons[c] == gt_person[r]


def test_no_gt_in_image_masks_loss(cfg):
    """An image whose GT is empty gets label_mask == 0 everywhere."""
    rng = np.random.RandomState(2)
    sm, joints, factors = make_scene(rng)
    joints[:, :, 2] = 0  # all invisible
    gb = build(cfg, sm, joints, factors)
    lm = np.asarray(gb.label_mask)
    assert lm.max() == 0.0


def test_batch_offsets_disjoint(cfg):
    rng = np.random.RandomState(3)
    sm1, j1, f1 = make_scene(rng)
    sm2, j2, f2 = make_scene(rng)
    j, h, w = sm1.shape
    scoremaps = jnp.asarray(
        np.stack([sm1.transpose(1, 2, 0), sm2.transpose(1, 2, 0)])
    )
    features = jnp.zeros((2, h, w, 8))
    tagmaps = jnp.zeros((2, h, w, j))
    jo1, fo1 = pad_people(j1, f1)
    jo2, fo2 = pad_people(j2, f2)
    gb = construct_graph_batch(
        cfg, scoremaps, features, tagmaps,
        joints_gt=jnp.asarray(np.stack([jo1, jo2])),
        factors=jnp.asarray(np.stack([fo1, fo2])),
    )
    n = 4 * 10
    ei = np.asarray(gb.edge_index)
    ev = np.asarray(gb.edge_valid)
    e_per = ei.shape[1] // 2
    # first image's edges point into [0, n), second into [n, 2n)
    assert ei[:, :e_per][:, ev[:e_per]].max() < n
    assert ei[:, e_per:][:, ev[e_per:]].min() >= n
    bi = np.asarray(gb.batch_index)
    assert (bi[:n] == 0).all() and (bi[n:] == 1).all()


def test_testing_mode_no_labels(cfg):
    rng = np.random.RandomState(4)
    sm, _, _ = make_scene(rng)
    j, h, w = sm.shape
    gb = construct_graph_batch(
        cfg,
        jnp.asarray(sm.transpose(1, 2, 0))[None],
        jnp.zeros((1, h, w, 8)),
        jnp.zeros((1, h, w, j)),
    )
    assert gb.edge_labels is None
    assert gb.node_labels is None
    assert gb.x.shape == (40, 8)


def test_edge_features_position_connection(cfg):
    rng = np.random.RandomState(5)
    sm, joints, factors = make_scene(rng)
    gb = build(cfg, sm, joints, factors)
    ea = np.asarray(gb.edge_attr)
    ei = np.asarray(gb.edge_index)
    ev = np.asarray(gb.edge_valid)
    det = np.asarray(gb.joint_det)
    assert ea.shape[1] == 2 + 4
    for e in np.where(ev)[0][:50]:
        s, d = ei[0, e], ei[1, e]
        assert ea[e, 0] == pytest.approx(det[d, 0] - det[s, 0])
        assert ea[e, 1] == pytest.approx(det[d, 1] - det[s, 1])
        hot = np.zeros(4)
        hot[det[s, 2]] = 1
        hot[det[d, 2]] = 1
        np.testing.assert_array_equal(ea[e, 2:], hot)


def test_image_centric_sampling(cfg):
    """Image-centric sampling (reference: ConstructGraph.py:182-204): keeps
    all label positives plus <=3x random negatives, rebuilds edges among the
    kept subset, relabels with method 4."""
    import dataclasses

    rng = np.random.RandomState(7)
    sm, joints, factors = make_scene(rng)
    ic_cfg = dataclasses.replace(cfg, image_centric=True)
    j, h, w = sm.shape
    scoremaps = jnp.asarray(sm.transpose(1, 2, 0))[None]
    features = jnp.asarray(rng.rand(1, h, w, 8).astype(np.float32))
    tagmaps = jnp.zeros((1, h, w, j))
    jo, fo = pad_people(joints, factors)
    gb = construct_graph_batch(
        ic_cfg, scoremaps, features, tagmaps,
        joints_gt=jnp.asarray(jo)[None], factors=jnp.asarray(fo)[None],
        rng=jax.random.PRNGKey(0),
    )
    plain = construct_graph_batch(
        cfg, scoremaps, features, tagmaps,
        joints_gt=jnp.asarray(jo)[None], factors=jnp.asarray(fo)[None],
        rng=jax.random.PRNGKey(0),
    )
    valid = np.asarray(gb.node_valid)
    labels = np.asarray(gb.node_labels)
    pos = valid & (labels == 1.0)
    neg = valid & (labels != 1.0)
    # every positive survives, negatives bounded by 3x positives
    assert pos.sum() > 0
    assert neg.sum() <= 3 * max(pos.sum(), 20)
    # sampling strictly reduces the kept set vs the plain constructor
    assert valid.sum() <= np.asarray(plain.node_valid).sum()
    # edges only among kept nodes
    ei = np.asarray(gb.edge_index)
    ev = np.asarray(gb.edge_valid)
    assert valid[ei[0][ev]].all() and valid[ei[1][ev]].all()
