"""Golden tests: our on-device decode vs the *actual* reference decode code.

Imports the reference's Utils/Utils.py (torch+scipy+numpy) with stub modules
for the imports its decode path never touches (cv2, tensorboard,
torch_geometric metrics, the missing andres multicut wrapper), then compares

  * pred_to_person(cc_method='threshold') + graph_cluster_to_persons
    (Utils.py:499-514, 672-743) vs cluster_threshold + persons_from_clusters
  * refine (Utils.py:1026-1104) vs decode.assembly.refine_ae
  * adjust (Utils.py:917-936) vs decode.assembly.adjust_quarter

on randomized synthetic scenes. This covers SURVEY hard-part "decode chain"
with the reference's own semantics, not a hand-written oracle.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from pemp_tpu.decode.assembly import (
    adjust_quarter,
    cluster_threshold,
    persons_from_clusters,
    refine_ae,
)

REF_SRC = "/root/reference/src"


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _dense_to_sparse(adj):
    idx = adj.nonzero(as_tuple=False).t()
    return idx, adj[idx[0], idx[1]]


@pytest.fixture(scope="module")
def ref_utils():
    saved = dict(sys.modules)
    _stub("cv2")
    _stub("torch.utils.tensorboard", SummaryWriter=object)
    tg = _stub("torch_geometric")
    _stub(
        "torch_geometric.utils",
        dense_to_sparse=_dense_to_sparse,
        precision=None, recall=None, accuracy=None, f1_score=None,
        subgraph=None,
    )
    tg.utils = sys.modules["torch_geometric.utils"]
    upkg = _stub("Utils")
    upkg.__path__ = [f"{REF_SRC}/Utils"]
    _stub("Utils.correlation_clustering")
    _stub(
        "Utils.correlation_clustering.correlation_clustering_utils",
        cluster_graph=lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("andres lib absent")
        ),
    )

    class _Graph:  # reference dataset_utils.Graph: a plain data holder here
        def __init__(self, x=None, edge_index=None, edge_attr=None, **kw):
            self.x, self.edge_index, self.edge_attr = x, edge_index, edge_attr

    _stub("Utils.dataset_utils", Graph=_Graph)
    _stub(
        "Utils.eval",
        gen_ann_format=None, gen_ann_format_mean=None, gen_ann_format_correct=None,
    )
    _stub("Utils.transformations", reverse_affine_map=None)

    spec = importlib.util.spec_from_file_location(
        "Utils.Utils", f"{REF_SRC}/Utils/Utils.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["Utils.Utils"] = mod
    try:
        spec.loader.exec_module(mod)
        yield mod
    finally:
        from ref_shim import restore_modules

        restore_modules(saved)


def _scene(rng, n=120, j=17, e=500):
    det = np.stack(
        [
            rng.randint(0, 60, n),
            rng.randint(0, 60, n),
            rng.randint(0, j, n),
        ],
        axis=1,
    ).astype(np.int64)
    scores = rng.rand(n).astype(np.float32) * 0.9 + 0.05
    src = rng.randint(0, n, e)
    dst = rng.randint(0, n, e)
    keep = src != dst
    edge_index = np.stack([src[keep], dst[keep]])
    pred = rng.rand(edge_index.shape[1]).astype(np.float32)
    return det, scores, edge_index, pred


def _person_set(persons):
    """Canonical set representation: per-person sorted tuple of joint rows."""
    out = []
    for p in persons:
        rows = tuple(
            (t, round(float(x), 4), round(float(y), 4), round(float(s), 5))
            for t, (x, y, s) in enumerate(p)
            if s > 0
        )
        out.append(rows)
    return sorted(out)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_threshold_assembly_matches_reference(ref_utils, seed):
    rng = np.random.RandomState(seed)
    det, scores, edge_index, pred = _scene(rng)
    n, j = len(det), 17

    ref_persons, _, _ = ref_utils.pred_to_person(
        torch.from_numpy(det), torch.from_numpy(scores),
        torch.from_numpy(edge_index), torch.from_numpy(pred), None,
        "threshold", j,
    )
    ref_persons = np.asarray(ref_persons).reshape(-1, j, 3)

    labels = cluster_threshold(
        jnp.asarray(edge_index), jnp.ones(edge_index.shape[1], bool),
        jnp.asarray(pred), n, jnp.ones(n, bool), threshold=0.8,
    )
    persons, valid = persons_from_clusters(
        jnp.asarray(det.astype(np.int32)), jnp.asarray(scores),
        labels, jnp.ones(n, bool), j, max_persons=64,
    )
    got = np.asarray(persons)[np.asarray(valid)]

    assert _person_set(got) == _person_set(ref_persons)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_refine_matches_reference(ref_utils, seed):
    rng = np.random.RandomState(10 + seed)
    j, h, w, p, s = 17, 48, 48, 3, 2
    scoremaps = rng.rand(j, h, w).astype(np.float32)
    tagmaps = rng.rand(j, h, w, s).astype(np.float32) * 4
    persons = np.zeros((p, j, 3), np.float32)
    for pi in range(p):
        present = rng.rand(j) > 0.4
        present[rng.randint(j)] = True  # at least one joint
        persons[pi, present, 0] = rng.randint(0, w, present.sum())
        persons[pi, present, 1] = rng.randint(0, h, present.sum())
        persons[pi, present, 2] = rng.rand(present.sum()) * 0.9 + 0.05

    want = ref_utils.refine(scoremaps.copy(), tagmaps.copy(), persons.copy())
    got = np.asarray(
        refine_ae(
            jnp.asarray(scoremaps), jnp.asarray(tagmaps),
            jnp.asarray(persons), jnp.ones(p, bool),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_adjust_matches_reference(ref_utils, seed):
    rng = np.random.RandomState(20 + seed)
    j, h, w, p = 17, 48, 48, 4
    scoremaps = rng.rand(j, h, w).astype(np.float32)
    persons = np.zeros((p, j, 3), np.float32)
    for pi in range(p):
        present = rng.rand(j) > 0.3
        persons[pi, present, 0] = rng.randint(1, w - 1, present.sum())
        persons[pi, present, 1] = rng.randint(1, h - 1, present.sum())
        persons[pi, present, 2] = rng.rand(present.sum())

    want = ref_utils.adjust(persons.copy(), scoremaps.copy())
    got = np.asarray(adjust_quarter(jnp.asarray(scoremaps), jnp.asarray(persons)))
    # reference adjust mutates only joints with score > 0; ours is vectorized
    mask = persons[:, :, 2] > 0
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-5, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_greedy_construction_matches_reference(ref_utils, seed):
    """CC_METHOD='greedy' host decode vs reference greedy_person_construction
    (Utils.py:517-626); np.float shim for the reference's legacy numpy."""
    np.float = float  # reference uses the removed numpy alias
    try:
        rng = np.random.RandomState(30 + seed)
        det, scores, edge_index, pred = _scene(rng, n=80, e=400)

        from pemp_tpu.decode import greedy_person_construction

        want, want_labels = ref_utils.greedy_person_construction(
            torch.from_numpy(det), torch.from_numpy(scores),
            torch.from_numpy(pred), None, torch.from_numpy(edge_index), 17,
        )
        got, got_labels = greedy_person_construction(
            det, scores, pred, None, edge_index, 17
        )
        want = np.asarray(want).reshape(-1, 17, 3)
        got = np.asarray(got).reshape(-1, 17, 3)
        assert _person_set(got) == _person_set(want)
        np.testing.assert_array_equal(np.asarray(got_labels), np.asarray(want_labels))
    finally:
        del np.float


# The reference imports the munkres PyPI package (group.py:13); it is not
# installed here, so the goldens inject our classical 6-step Munkres
# implementation as the module. Both sides then run the SAME deterministic
# assignment algorithm (the classical one the PyPI package implements), so
# tie-heavy scenes are comparable — unlike a scipy stand-in, whose tie order
# is arbitrary and unrelated to Munkres'.
from pemp_tpu.decode.munkres import Munkres as _ClassicalMunkres  # noqa: N811


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_mpn_match_by_tag_matches_reference(ref_utils, seed):
    """AE fallback grouping vs reference mpn_match_by_tag (Utils.py:1493-1578)."""
    _stub("munkres", Munkres=_ClassicalMunkres)
    try:
        rng = np.random.RandomState(40 + seed)
        n, j, s = 90, 17, 1
        det = np.stack(
            [rng.randint(0, 60, n), rng.randint(0, 60, n), rng.randint(0, j, n)],
            axis=1,
        ).astype(np.int64)
        scores = rng.rand(n).astype(np.float32) * 0.9 + 0.05
        tags = (rng.rand(n, s).astype(np.float32) * 6).round(1)

        class P:
            num_joints = j
            max_num_people = 30
            detection_threshold = 0.1
            tag_threshold = 1.0
            use_detection_val = True
            ignore_too_much = False
            joint_order = [
                i - 1
                for i in [1, 2, 3, 4, 5, 6, 7, 12, 13, 8, 9, 10, 11, 14, 15, 16, 17]
            ]

        want = ref_utils.mpn_match_by_tag(det, tags, scores, P())
        want = np.asarray(want, np.float32).reshape(-1, j, want.shape[-1])[:, :, :3]

        from pemp_tpu.decode.ae_grouping import Params, mpn_match_by_tag

        got = mpn_match_by_tag(det, tags, scores, Params(num_joints=j))
        got = np.asarray(got, np.float32).reshape(-1, j, 3)
        assert _person_set(got) == _person_set(want)
    finally:
        sys.modules.pop("munkres", None)


@pytest.fixture(scope="module")
def ref_group(ref_utils):
    """Load the reference's hr_utils/group.py (AE grouping baseline)."""
    _stub("munkres", Munkres=_ClassicalMunkres)
    sys.modules["Utils"].Graph = sys.modules["Utils.dataset_utils"].Graph
    sys.modules["Utils"].adjust = ref_utils.adjust
    sys.modules["Utils"].refine = ref_utils.refine
    spec = importlib.util.spec_from_file_location(
        "ref_group", f"{REF_SRC}/Utils/hr_utils/group.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    yield mod
    sys.modules.pop("munkres", None)


class _Cfg:
    class DATASET:
        NUM_JOINTS = 17
        MAX_NUM_PEOPLE = 30


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_match_by_tag_matches_reference_group(ref_group, seed):
    """Binned (J,K) tag matching vs the reference's group.py match_by_tag."""
    from pemp_tpu.decode.ae_grouping import Params, match_by_tag

    rng = np.random.RandomState(50 + seed)
    j, k, d = 17, 12, 2
    tag_k = (rng.rand(j, k, d).astype(np.float32) * 6).round(1)
    loc_k = rng.randint(0, 64, (j, k, 2)).astype(np.float64)
    val_k = rng.rand(j, k).astype(np.float64)

    want = ref_group.match_by_tag((tag_k, loc_k, val_k), ref_group.Params(_Cfg))
    want = np.asarray(want, np.float32).reshape(-1, j, 3 + d)
    got = match_by_tag(tag_k, loc_k, val_k, Params(num_joints=j))
    assert _person_set(got[:, :, :3]) == _person_set(want[:, :, :3])


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1])
def test_heatmap_parser_topk_match_matches_reference(ref_group, seed):
    """NMS + per-joint top-K + tag matching vs reference HeatmapParser."""
    from pemp_tpu.decode.ae_grouping import HeatmapParser as OurParser

    rng = np.random.RandomState(60 + seed)
    j, h, w = 17, 64, 64
    det = rng.rand(j, h, w).astype(np.float32)
    tag = (rng.rand(j, h, w, 2).astype(np.float32) * 6)

    ref_parser = ref_group.HeatmapParser(_Cfg)
    ans = ref_parser.top_k(
        torch.from_numpy(det)[None], torch.from_numpy(tag)[None]
    )
    want_groups = ref_parser.match(
        ans["tag_k"], ans["loc_k"], ans["val_k"]
    )[0]
    want_groups = np.asarray(want_groups, np.float32).reshape(-1, j, 5)

    ours = OurParser(num_joints=j, max_num_people=30, nms_kernel=5)
    tag_k, loc_k, val_k = ours.top_k(det, tag)
    from pemp_tpu.decode.ae_grouping import Params, match_by_tag

    got = match_by_tag(tag_k, loc_k, val_k, Params(num_joints=j))
    assert _person_set(got[:, :, :3]) == _person_set(want_groups[:, :, :3])


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_parser_refine_fill_score_matches_utils_refine(ref_utils, seed):
    """HeatmapParser.refine(fill_score=0.001) — the MPN tag-regression eval
    path (tools/valid.py) — must match the reference's Utils.py refine
    (Utils.py:1026-1104: in-filled joints get fixed score 0.001, unlike
    group.py refine which uses the heatmap value)."""
    from pemp_tpu.decode.ae_grouping import HeatmapParser

    rng = np.random.RandomState(40 + seed)
    j, h, w, p, s = 17, 48, 48, 3, 2
    scoremaps = rng.rand(j, h, w).astype(np.float32)
    tagmaps = rng.rand(j, h, w, s).astype(np.float32) * 4
    persons = np.zeros((p, j, 3), np.float32)
    for pi in range(p):
        present = rng.rand(j) > 0.4
        present[rng.randint(j)] = True
        persons[pi, present, 0] = rng.randint(0, w, present.sum())
        persons[pi, present, 1] = rng.randint(0, h, present.sum())
        persons[pi, present, 2] = rng.rand(present.sum()) * 0.9 + 0.05

    want = ref_utils.refine(scoremaps.copy(), tagmaps.copy(), persons.copy())
    parser = HeatmapParser(num_joints=j)
    got = np.stack([
        parser.refine(scoremaps, tagmaps, kp.copy(), fill_score=0.001)
        for kp in persons
    ])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
