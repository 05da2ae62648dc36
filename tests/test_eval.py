import numpy as np
import pytest

from pemp_tpu.data.coco_api import COCO
from pemp_tpu.data.rle import polygon_to_mask, rle_decode, segmentation_to_mask
from pemp_tpu.eval import KeypointEval, calc_metrics, compute_oks, roc_auc


def make_gt_dataset(n_images=4, people_per_img=2, seed=0):
    rng = np.random.RandomState(seed)
    images, annotations = [], []
    aid = 1
    for i in range(1, n_images + 1):
        images.append({"id": i, "width": 640, "height": 480})
        for _ in range(people_per_img):
            cx, cy = rng.uniform(100, 500), rng.uniform(100, 380)
            kps = []
            for j in range(17):
                kps += [cx + rng.uniform(-40, 40), cy + rng.uniform(-60, 60), 2]
            annotations.append(
                {
                    "id": aid,
                    "image_id": i,
                    "category_id": 1,
                    "keypoints": kps,
                    "num_keypoints": 17,
                    "area": 120 * 160,
                    "bbox": [cx - 60, cy - 80, 120, 160],
                    "iscrowd": 0,
                }
            )
            aid += 1
    return {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "person"}],
    }


def detections_from_gt(ds, noise=0.0, score=0.9, seed=1):
    rng = np.random.RandomState(seed)
    dts = []
    for ann in ds["annotations"]:
        kp = np.array(ann["keypoints"], dtype=np.float64)
        kp[0::3] += rng.normal(0, noise, 17)
        kp[1::3] += rng.normal(0, noise, 17)
        kp[2::3] = 1.0
        dts.append(
            {
                "image_id": ann["image_id"],
                "category_id": 1,
                "keypoints": kp.tolist(),
                "score": score + rng.uniform(-0.05, 0.05),
            }
        )
    return dts


def run_eval(ds, dts):
    gt = COCO(ds)
    dt = gt.loadRes(dts)
    ev = KeypointEval(gt, dt)
    ev.evaluate()
    ev.accumulate()
    return ev.summarize(verbose=False)


def test_perfect_detections_ap_1():
    ds = make_gt_dataset()
    stats = run_eval(ds, detections_from_gt(ds, noise=0.0))
    assert stats[0] == pytest.approx(1.0, abs=1e-6)
    assert stats[5] == pytest.approx(1.0, abs=1e-6)  # AR


def test_noise_degrades_ap_monotonically():
    ds = make_gt_dataset()
    aps = [run_eval(ds, detections_from_gt(ds, noise=n))[0] for n in (0.0, 8.0, 40.0)]
    assert aps[0] > aps[1] > aps[2]
    assert aps[2] < 0.6


def test_missing_half_detections_halves_recall():
    ds = make_gt_dataset(n_images=6, people_per_img=2)
    dts = detections_from_gt(ds, noise=0.0)
    stats = run_eval(ds, dts[::2])
    assert stats[5] == pytest.approx(0.5, abs=0.05)


def test_oks_identity_is_one():
    ds = make_gt_dataset(n_images=1, people_per_img=1)
    gts = ds["annotations"]
    dts = detections_from_gt(ds, noise=0.0)
    from pemp_tpu.eval import COCO_SIGMAS

    oks = compute_oks(dts, gts, COCO_SIGMAS)
    assert oks[0, 0] == pytest.approx(1.0)


def test_crowd_gt_is_ignored():
    ds = make_gt_dataset(n_images=2, people_per_img=1)
    ds["annotations"][0]["iscrowd"] = 1
    dts = detections_from_gt(ds, noise=0.0)
    # remove the detection for the crowd gt; AP should still be 1
    dts = [d for d in dts if d["image_id"] != ds["annotations"][0]["image_id"]]
    stats = run_eval(ds, dts)
    assert stats[0] == pytest.approx(1.0, abs=1e-6)


def test_calc_metrics():
    out = np.array([1, 1, 0, 0, 1])
    tgt = np.array([1, 0, 0, 1, 1])
    m = calc_metrics(out, tgt)
    assert m["prec"] == pytest.approx(2 / 3)
    assert m["rec"] == pytest.approx(2 / 3)
    assert m["acc"] == pytest.approx(3 / 5)


def test_roc_auc_known_value():
    labels = [1, 1, 0, 0]
    scores = [0.9, 0.8, 0.7, 0.1]
    assert roc_auc(labels, scores) == pytest.approx(1.0)
    scores = [0.1, 0.2, 0.8, 0.9]
    assert roc_auc(labels, scores) == pytest.approx(0.0)


def test_polygon_rasterization_square():
    m = polygon_to_mask([2, 2, 10, 2, 10, 10, 2, 10], 16, 16)
    assert m[5, 5] == 1
    assert m[1, 1] == 0
    assert m[12, 12] == 0
    assert m.sum() == pytest.approx(64, abs=9)


def test_rle_roundtrip_uncompressed():
    mask = np.zeros((4, 6), np.uint8)
    mask[1:3, 2:5] = 1
    # build column-major counts
    flat = mask.T.reshape(-1)
    counts = []
    run_val, run_len = 0, 0
    for v in flat:
        if v == run_val:
            run_len += 1
        else:
            counts.append(run_len)
            run_val, run_len = v, 1
    counts.append(run_len)
    out = rle_decode({"size": [4, 6], "counts": counts})
    np.testing.assert_array_equal(out, mask)


def test_segmentation_dispatch():
    m = segmentation_to_mask([[0, 0, 4, 0, 4, 4, 0, 4]], 8, 8)
    assert m.sum() > 0


def test_multihost_eval_sharding(tmp_path):
    """shard_indices covers every image exactly once across processes;
    write_part/merge_parts round-trips annotations in process order."""
    from pemp_tpu.parallel import cleanup_parts, merge_parts, shard_indices, write_part

    n, pc = 103, 4
    all_idx = sorted(sum((shard_indices(n, pc, p) for p in range(pc)), []))
    assert all_idx == list(range(n))
    assert shard_indices(n, 1, 0) == list(range(n))
    # balanced within one image
    sizes = [len(shard_indices(n, pc, p)) for p in range(pc)]
    assert max(sizes) - min(sizes) <= 1

    for p in range(pc):
        anns = [[{"image_id": i, "score": 0.5}] for i in shard_indices(n, pc, p)]
        write_part(str(tmp_path), "eval_test", p, anns, shard_indices(n, pc, p))
    anns, ids = merge_parts(str(tmp_path), "eval_test", pc)
    assert sorted(ids) == list(range(n))
    assert len(anns) == n
    got = sorted(a[0]["image_id"] for a in anns)
    assert got == list(range(n))
    cleanup_parts(str(tmp_path), "eval_test", pc)
    import os
    assert not any("part" in f for f in os.listdir(tmp_path))
