"""Hand-derived exact-semantics fixtures for the pure-numpy COCO evaluator.

pycocotools is not installable here, so every expected number below is
computed ON PAPER from the COCOeval keypoint algorithm
(pycocotools cocoeval.py; the reference defers to it at
src/Utils/eval.py:142-187) — NOT from our implementation. Each fixture is
constructed so a specific order-sensitive rule changes the answer:

  A. greedy per-GT matching in descending detection score: a matched
     (non-crowd) GT is out of play for later detections, and the 101-point
     interpolated precision integral.
  B. global (cross-image) stable mergesort of detections by score.
  C. crowd GTs absorb multiple detections (matched crowds stay available);
     detections matched to ignored GTs are ignored, not FPs.
  D. area-range boundaries are inclusive on BOTH ends — a GT whose area
     sits exactly on 96**2 counts in `medium` AND `large`.
  E. maxDets=20 truncation happens after the score sort.
  G. unmatched detections whose own keypoint-extent area falls outside the
     area range are ignored for that range, not false positives.
  H. CrowdPose easy/medium/hard split by image crowdIndex.

OKS values are pinned to exactly 1.0 (detection keypoints identical to the
GT's: every dx=dy=0 so mean(exp(0))=1 independent of sigmas/area) or
effectively 0.0 (>=2000px offsets), so the expected APs are exact closed
forms of the PR integral.
"""

import numpy as np
import pytest

from pemp_tpu.data.coco_api import COCO
from pemp_tpu.eval import KeypointEval


def _grid_kps(x0, y0, size=50.0, v=2):
    """17 keypoints on a grid inside [x0, x0+size] x [y0, y0+size]; the
    keypoint extent (and hence loadRes detection area) is exactly size**2."""
    kps = []
    for j in range(17):
        gx = x0 + (j % 5) / 4.0 * size
        gy = y0 + (j // 5) / 3.0 * size
        kps += [gx, gy, v]
    # pin the exact extent: last two points at the corners
    kps[0:2] = [x0, y0]
    kps[3 * 16:3 * 16 + 2] = [x0 + size, y0 + size]
    return kps


def _gt(aid, img, kps, area, iscrowd=0, bbox=None, nkp=17):
    return {
        "id": aid, "image_id": img, "category_id": 1, "keypoints": kps,
        "num_keypoints": nkp, "area": area,
        "bbox": bbox or [min(kps[0::3]), min(kps[1::3]), 50, 50],
        "iscrowd": iscrowd,
    }


def _dt(img, kps, score):
    return {"image_id": img, "category_id": 1,
            "keypoints": list(kps), "score": score}


def _run(images, gts, dts, crowdpose=False):
    gt = COCO({
        "images": images,
        "annotations": gts,
        "categories": [{"id": 1, "name": "person"}],
    })
    dt = gt.loadRes(dts)
    ev = KeypointEval(gt, dt, crowdpose=crowdpose)
    ev.evaluate([im["id"] for im in images])
    ev.accumulate()
    return ev.summarize(verbose=False)


IMG = [{"id": 1, "width": 5000, "height": 5000}]


def test_A_greedy_matching_and_interpolation():
    """2 GTs; dts (score desc): exact-on-A, exact-on-A again, exact-on-B.
    The second detection finds A already matched (non-crowd -> skipped) and
    has OKS 0 with B -> FP at every threshold. tps=[1,0,1], npig=2:
    rc=[.5,.5,1], pr=[1,.5,2/3] -> backward-max [1,2/3,2/3];
    searchsorted(left) gives q = 51x1.0 + 50x(2/3) -> AP = 253/303."""
    a = _grid_kps(100, 100)
    b = _grid_kps(2100, 2100)
    gts = [_gt(1, 1, a, 2500.0), _gt(2, 1, b, 2500.0)]
    dts = [_dt(1, a, 0.9), _dt(1, a, 0.8), _dt(1, b, 0.7)]
    stats = _run(IMG, gts, dts)
    want = 253.0 / 303.0
    assert stats[0] == pytest.approx(want, abs=1e-9)   # AP
    assert stats[1] == pytest.approx(want, abs=1e-9)   # AP50
    assert stats[2] == pytest.approx(want, abs=1e-9)   # AP75
    assert stats[3] == pytest.approx(want, abs=1e-9)   # AP medium (both GTs)
    assert stats[4] == -1.0                            # no large GTs
    assert stats[5] == pytest.approx(1.0, abs=1e-9)    # AR


def test_B_global_score_sort_across_images():
    """TP(0.6) in image 1; FP(0.9) and TP(0.5) in image 2. Pooled by global
    descending score: [FP, TP, TP] -> rc=[0,.5,1], pr=[0,.5,2/3] ->
    backward-max 2/3 everywhere -> AP = 2/3 exactly. A per-image or
    unstable sort changes this."""
    images = [{"id": 1, "width": 5000, "height": 5000},
              {"id": 2, "width": 5000, "height": 5000}]
    g1 = _grid_kps(100, 100)
    g2 = _grid_kps(100, 100)
    far = _grid_kps(4000, 4000)
    gts = [_gt(1, 1, g1, 2500.0), _gt(2, 2, g2, 2500.0)]
    dts = [_dt(1, g1, 0.6), _dt(2, far, 0.9), _dt(2, g2, 0.5)]
    stats = _run(images, gts, dts)
    assert stats[0] == pytest.approx(2.0 / 3.0, abs=1e-9)
    assert stats[5] == pytest.approx(1.0, abs=1e-9)


def test_C_crowd_absorbs_multiple_detections():
    """A crowd GT (iscrowd=1, no labelled keypoints, bbox around the dts) is
    ignored but must absorb BOTH high-scoring detections inside it (matched
    crowds stay available: cocoeval's `gtm>0 and not iscrowd` rule). With a
    TP on the one real GT, AP = 1.0; treating the second crowd detection as
    an FP would give 0.5."""
    crowd_kps = [0.0] * 51
    real = _grid_kps(2100, 2100)
    gts = [
        _gt(1, 1, crowd_kps, 90000.0, iscrowd=1,
            bbox=[100.0, 100.0, 300.0, 300.0], nkp=0),
        _gt(2, 1, real, 2500.0),
    ]
    in_crowd1 = _grid_kps(150, 150)
    in_crowd2 = _grid_kps(220, 220)
    dts = [_dt(1, in_crowd1, 0.9), _dt(1, in_crowd2, 0.8), _dt(1, real, 0.7)]
    stats = _run(IMG, gts, dts)
    assert stats[0] == pytest.approx(1.0, abs=1e-9)
    assert stats[5] == pytest.approx(1.0, abs=1e-9)


def test_D_area_boundary_counts_in_both_ranges():
    """GT area exactly 96**2: pycocotools ignores iff area<rng[0] OR
    area>rng[1], so the boundary GT is live in `medium` ([32^2, 96^2]) AND
    `large` ([96^2, 1e10]). A TP on it gives AP(M) = AP(L) = 1.0; a
    half-open range would yield -1 for medium."""
    size = 96.0
    kps = _grid_kps(100, 100, size=size)
    gts = [_gt(1, 1, kps, 96.0**2)]
    dts = [_dt(1, kps, 0.9)]
    stats = _run(IMG, gts, dts)
    assert stats[0] == pytest.approx(1.0, abs=1e-9)
    assert stats[3] == pytest.approx(1.0, abs=1e-9)   # AP medium
    assert stats[4] == pytest.approx(1.0, abs=1e-9)   # AP large


def test_E_maxdets_truncation_after_sort():
    """25 detections: 24 far-away FPs with scores above the single TP's.
    maxDets=20 keeps only the top-20 by score — all FPs — so the TP is
    truncated away entirely: AP = AR = 0."""
    real = _grid_kps(100, 100)
    far = _grid_kps(4000, 4000)
    gts = [_gt(1, 1, real, 2500.0)]
    dts = [_dt(1, far, 0.99 - 0.005 * i) for i in range(24)]
    dts.append(_dt(1, real, 0.5))
    stats = _run(IMG, gts, dts)
    assert stats[0] == pytest.approx(0.0, abs=1e-12)
    assert stats[5] == pytest.approx(0.0, abs=1e-12)


def test_G_unmatched_detection_area_ignored_per_range():
    """An unmatched high-scoring detection whose keypoint extent (200x200 =
    40000 > 96**2) is outside `medium` is IGNORED for the medium range (not
    an FP), but a genuine FP for `all`: AP(all) = 0.5, AP(M) = 1.0."""
    real = _grid_kps(100, 100)                      # extent 2500 (medium)
    big_far = _grid_kps(3000, 3000, size=200.0)     # extent 40000 (large)
    gts = [_gt(1, 1, real, 2500.0)]
    dts = [_dt(1, big_far, 0.95), _dt(1, real, 0.9)]
    stats = _run(IMG, gts, dts)
    assert stats[0] == pytest.approx(0.5, abs=1e-9)   # AP all
    assert stats[3] == pytest.approx(1.0, abs=1e-9)   # AP medium
    assert stats[4] == -1.0                           # no large GTs


def test_H_crowdpose_easy_medium_hard():
    """Three images with crowdIndex 0.05/0.5/0.9; TPs on easy+medium, an FP
    on hard. Pooled AP: tps=[1,1,0], npig=3 -> rc=[1/3,2/3,2/3],
    pr=[1,1,2/3] -> q = 34x1 + 33x1 + 34x0 -> AP(all) = 67/101;
    AP(E)=AP(M)=1, AP(H)=0."""
    images = [
        {"id": 1, "width": 5000, "height": 5000, "crowdIndex": 0.05},
        {"id": 2, "width": 5000, "height": 5000, "crowdIndex": 0.5},
        {"id": 3, "width": 5000, "height": 5000, "crowdIndex": 0.9},
    ]

    def kps14(x0, y0):
        kps = []
        for j in range(14):
            kps += [x0 + (j % 4) * 10.0, y0 + (j // 4) * 10.0, 2]
        return kps

    g1, g2, g3 = kps14(100, 100), kps14(100, 100), kps14(100, 100)
    far = kps14(4000, 4000)
    gts = [
        dict(_gt(1, 1, g1, 2500.0), num_keypoints=14),
        dict(_gt(2, 2, g2, 2500.0), num_keypoints=14),
        dict(_gt(3, 3, g3, 2500.0), num_keypoints=14),
    ]
    dts = [_dt(1, g1, 0.9), _dt(2, g2, 0.8), _dt(3, far, 0.7)]
    stats = _run(images, gts, dts, crowdpose=True)
    # [AP, AP50, AP75, AR, AR50, AR75, AP(E), AP(M), AP(H)]
    assert stats[0] == pytest.approx(67.0 / 101.0, abs=1e-9)
    assert stats[3] == pytest.approx(2.0 / 3.0, abs=1e-9)   # AR(all)
    assert stats[6] == pytest.approx(1.0, abs=1e-9)
    assert stats[7] == pytest.approx(1.0, abs=1e-9)
    assert stats[8] == pytest.approx(0.0, abs=1e-12)
