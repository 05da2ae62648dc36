"""Golden tests: hourglass AE parsers vs the *actual* reference group_hg code.

Loads the reference's src/Utils/hr_utils/group_hg.py (standalone: torch +
numpy + munkres) with the ``munkres`` import stubbed to our classical
Munkres implementation (pemp_tpu/decode/munkres.py) — both sides then run
the SAME deterministic assignment algorithm, so tie-heavy scenes are
comparable — and compares

  * HeatmapParserHG.parse (group_hg.py:192-355: max-distance py_max_match
    quirk, in-adjust +0.5, refine fill score = heatmap value)
  * HeatmapParserHG2.parse (group_hg.py:414-488: RMS tag distance,
    min-cost assignment, module-level refine with fill score 1)

against pemp_tpu.decode.group_hg on randomized synthetic hourglass-shaped
outputs. Covers VERDICT round-2 missing item #3 (hourglass AE parsers).
"""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pemp_tpu.decode.group_hg import HeatmapParserHG, HeatmapParserHG2
from pemp_tpu.decode.munkres import Munkres

REF_PATH = "/root/reference/src/Utils/hr_utils/group_hg.py"


@pytest.fixture(scope="module")
def ref_group_hg():
    saved = dict(sys.modules)
    mk = types.ModuleType("munkres")
    mk.Munkres = Munkres
    sys.modules["munkres"] = mk
    spec = importlib.util.spec_from_file_location("ref_group_hg", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
        yield mod
    finally:
        from ref_shim import restore_modules

        restore_modules(saved)


def _scene(rng, j=17, h=64, w=64, n_people=3, noise=0.02):
    """Synthetic hourglass maps: gaussian joint peaks + per-person tags."""
    det = rng.rand(j, h, w).astype(np.float64) * noise
    tag = rng.randn(j, h, w).astype(np.float64) * 0.05
    yy, xx = np.mgrid[0:h, 0:w]
    for p in range(n_people):
        ptag = (p + 1) * 2.0 + rng.randn() * 0.1
        cx, cy = rng.randint(8, w - 8), rng.randint(8, h - 8)
        for jt in range(j):
            if rng.rand() < 0.25:  # missing joints exercise refine
                continue
            mx = np.clip(cx + rng.randint(-6, 7), 0, w - 1)
            my = np.clip(cy + rng.randint(-6, 7), 0, h - 1)
            g = np.exp(-(((xx - mx) ** 2 + (yy - my) ** 2) / (2 * 1.5**2)))
            det[jt] = np.maximum(det[jt], g * (0.5 + 0.5 * rng.rand()))
            tag[jt, my, mx] = ptag + rng.randn() * 0.05
    return det, tag


def _compare(ours, ref, scores_ours, scores_ref):
    ref = np.asarray(ref, np.float64).reshape(-1, *ours.shape[1:]) if np.size(ref) else np.zeros_like(ours[:0])
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(scores_ours, np.float64),
        np.asarray(scores_ref, np.float64),
        atol=1e-6,
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_heatmap_parser_hg_matches_reference(ref_group_hg, seed):
    rng = np.random.RandomState(100 + seed)
    det, tag = _scene(rng, n_people=2 + seed % 3)

    ref_parser = ref_group_hg.HeatmapParserHG(cfg=None)
    det_t = torch.from_numpy(det[None]).float()
    tag_t = torch.from_numpy(tag[None]).float()
    ref_ans, ref_scores = ref_parser.parse(det_t, tag_t, adjust=True, refine=True)
    ref_people = np.asarray(ref_ans[0], np.float64) if len(ref_ans[0]) else np.zeros((0, 17, 4))

    ours = HeatmapParserHG(num_joints=17, max_num_people=30)
    # reference parses the float32 tensors; feed the same precision
    ans, scores = ours.parse(
        det_t[0].numpy().astype(np.float64),
        tag_t[0].numpy().astype(np.float64),
        adjust=True, refine=True,
    )
    _compare(np.asarray(ans, np.float64), ref_people, scores, ref_scores)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_heatmap_parser_hg2_matches_reference(ref_group_hg, seed):
    rng = np.random.RandomState(200 + seed)
    det, tag = _scene(rng, n_people=2 + seed)

    ref_parser = ref_group_hg.HeatmapParserHG2()
    det_t = torch.from_numpy(det[None]).float()
    tag_t = torch.from_numpy(tag[None]).float()
    ref_ans, ref_scores = ref_parser.parse(det_t, tag_t, adjust=True)
    ref_people = np.asarray(ref_ans[0], np.float64) if len(ref_ans[0]) else np.zeros((0, 17, 4))

    ours = HeatmapParserHG2()
    ans, scores = ours.parse(
        det_t[0].numpy().astype(np.float64),
        tag_t[0].numpy().astype(np.float64),
        adjust=True,
    )
    _compare(np.asarray(ans, np.float64), ref_people, scores, ref_scores)


def test_heatmap_parser_hg_empty_scene(ref_group_hg):
    """All-below-threshold maps: both sides produce zero people."""
    det = np.full((17, 32, 32), 0.01)
    tag = np.zeros((17, 32, 32))
    ref_parser = ref_group_hg.HeatmapParserHG(cfg=None)
    ref_ans, ref_scores = ref_parser.parse(
        torch.from_numpy(det[None]).float(), torch.from_numpy(tag[None]).float(),
        adjust=True, refine=True,
    )
    ours = HeatmapParserHG(num_joints=17)
    ans, scores = ours.parse(det, tag, adjust=True, refine=True)
    assert len(ans) == 0 and len(scores) == 0
    assert np.size(ref_ans[0]) == 0 and len(ref_scores) == 0
