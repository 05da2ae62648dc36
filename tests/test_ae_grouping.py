import numpy as np
import pytest

from pemp_tpu.decode.ae_grouping import (
    HeatmapParser,
    Params,
    cluster_cc,
    match_by_tag,
    min_cost_match,
    mpn_match_by_tag,
)


def synth_maps(j=4, h=64, w=64, people=((20, 20, 1.0), (45, 40, 5.0))):
    """Two people with distinct tag values."""
    det = np.zeros((j, h, w), np.float32)
    tag = np.zeros((j, h, w), np.float32)
    gt = []
    for cx, cy, tagval in people:
        person = []
        for t in range(j):
            x, y = cx + t * 2, cy + t
            det[t, y, x] = 0.9
            tag[t, y, x] = tagval
            person.append((x, y))
        gt.append(person)
    return det, tag, gt


def test_min_cost_match_square():
    cost = np.array([[1.0, 9.0], [9.0, 2.0]])
    pairs = {tuple(p) for p in min_cost_match(cost)}
    assert pairs == {(0, 0), (1, 1)}


def test_match_by_tag_groups_two_people():
    det, tag, gt = synth_maps()
    parser = HeatmapParser(num_joints=4, max_num_people=10)
    persons, scores = parser.parse(det, tag, adjust=False, refine=False)
    assert persons.shape[0] == 2
    found = {tuple(int(v) for v in persons[p, 0, :2]) for p in range(2)}
    assert found == {gt[0][0], gt[1][0]}
    # all four joints present per person
    assert (persons[:, :, 2] > 0).all()


def test_parse_with_adjust_and_refine_runs():
    det, tag, gt = synth_maps()
    parser = HeatmapParser(num_joints=4, max_num_people=10)
    persons, scores = parser.parse(det, tag, adjust=True, refine=True)
    assert persons.shape[0] == 2
    assert len(scores) == 2
    # adjust moved coordinates by +-0.25 + 0.5 offsets
    assert np.all(np.abs(persons[:, :, :2] % 1.0 - 0.5) > 0.2)


def test_refine_fills_missing():
    det, tag, _ = synth_maps()
    parser = HeatmapParser(num_joints=4, max_num_people=10)
    kp = np.zeros((4, 3), np.float32)
    kp[0] = (20, 20, 0.9)  # only joint 0 of person A present
    out = parser.refine(det, tag[..., None], kp)
    # the other joints should be found at person-A positions (same tag)
    assert out[1, 2] > 0
    assert abs(out[1, 0] - 22) <= 1.0


def test_mpn_match_by_tag():
    joint_det = np.array(
        [[10, 10, 0], [12, 11, 1], [40, 40, 0], [42, 41, 1]], np.int64
    )
    tags = np.array([[1.0], [1.05], [6.0], [6.1]], np.float32)
    scores = np.array([0.9, 0.85, 0.95, 0.8], np.float32)
    params = Params(num_joints=2, max_num_people=5)
    ans = mpn_match_by_tag(joint_det, tags, scores, params)
    assert ans.shape[0] == 2
    xs = sorted(ans[:, 0, 0].tolist())
    assert xs == [10.0, 40.0]


def test_cluster_cc_groups_by_tag():
    det, tag, gt = synth_maps()
    persons = cluster_cc(det, tag, num_joints=4)
    assert persons.shape[0] == 2
    assert (persons[:, :, 2] > 0).sum() == 8


def test_min_cost_match_tie_heavy_optimality():
    """Tie-heavy cost matrices of the reference's round(d)*100 - score form:
    min_cost_match must return a complete, cost-optimal assignment (equal to
    the brute-force optimum) and be deterministic across calls.
    min_cost_match now runs the classical Munkres algorithm itself
    (pemp_tpu/decode/munkres.py), so its tie order is the deterministic
    classical one — see min_cost_match's docstring."""
    import itertools

    from pemp_tpu.decode.ae_grouping import min_cost_match

    rng = np.random.RandomState(0)
    for _ in range(50):
        k = rng.randint(2, 6)
        # rounded tag distances in {0, 100, 200} minus small scores: many ties
        d = rng.randint(0, 3, (k, k)).astype(np.float64) * 100.0
        score = np.round(rng.rand(k, k), 2)
        cost = d - score
        pairs = min_cost_match(cost)
        assert pairs.shape == (k, 2)
        assert sorted(pairs[:, 0].tolist()) == list(range(k))
        assert sorted(pairs[:, 1].tolist()) == list(range(k))
        got_cost = cost[pairs[:, 0], pairs[:, 1]].sum()
        best = min(
            sum(cost[i, p[i]] for i in range(k))
            for p in itertools.permutations(range(k))
        )
        np.testing.assert_allclose(got_cost, best, atol=1e-9)
        pairs2 = min_cost_match(cost)
        np.testing.assert_array_equal(pairs, pairs2)


def test_munkres_matches_scipy_optimum_random():
    """Classical Munkres vs scipy: same optimal cost on random (incl.
    rectangular) instances; complete assignment of the shorter side."""
    from scipy.optimize import linear_sum_assignment

    from pemp_tpu.decode.munkres import Munkres

    rng = np.random.RandomState(7)
    for trial in range(60):
        r = rng.randint(1, 8)
        c = rng.randint(1, 8)
        cost = rng.rand(r, c) * 10
        pairs = Munkres().compute(cost)
        k = min(r, c)
        assert len(pairs) == k
        rows = [p[0] for p in pairs]
        cols = [p[1] for p in pairs]
        assert len(set(rows)) == k and len(set(cols)) == k
        got = sum(cost[i, j] for i, j in pairs)
        ri, ci = linear_sum_assignment(cost)
        np.testing.assert_allclose(got, cost[ri, ci].sum(), atol=1e-9)


def test_munkres_tie_order_is_row_major_greedy():
    """On an all-ties matrix the classical algorithm stars zeros greedily in
    row-major order -> identity assignment. Pins the deterministic tie
    order the grouping relies on."""
    from pemp_tpu.decode.munkres import Munkres

    for n in (2, 3, 5):
        cost = np.ones((n, n))
        pairs = Munkres().compute(cost)
        assert pairs == [(i, i) for i in range(n)]
