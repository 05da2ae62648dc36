import json
import os

import numpy as np
import pytest

from pemp_tpu.config import get_config
from pemp_tpu.data import (
    CocoKeypoints,
    DataLoader,
    HeatmapGenerator,
    JointsGenerator,
    transforms_hr_train,
)


@pytest.fixture(scope="module")
def fake_coco_root(tmp_path_factory):
    """Write a tiny COCO-format dataset with images on disk."""
    from PIL import Image

    root = tmp_path_factory.mktemp("coco")
    os.makedirs(root / "annotations")
    os.makedirs(root / "val2017")
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    for i in range(1, 5):
        w, h = 320, 240
        fname = f"{i:012d}.jpg"
        Image.fromarray(
            (rng.rand(h, w, 3) * 255).astype(np.uint8)
        ).save(root / "val2017" / fname)
        images.append({"id": i, "width": w, "height": h, "file_name": fname})
        for _ in range(2):
            cx, cy = rng.uniform(60, 260), rng.uniform(60, 180)
            kps = []
            nk = 0
            for j in range(17):
                v = 2 if rng.rand() > 0.2 else 0
                kps += [float(cx + rng.uniform(-30, 30)), float(cy + rng.uniform(-40, 40)), v]
                nk += v > 0
            annotations.append(
                {
                    "id": aid, "image_id": i, "category_id": 1,
                    "keypoints": kps, "num_keypoints": int(nk),
                    "area": 5000.0, "bbox": [cx - 40, cy - 50, 80, 100],
                    "iscrowd": 0,
                    "segmentation": [[cx - 40, cy - 50, cx + 40, cy - 50, cx + 40, cy + 50, cx - 40, cy + 50]],
                }
            )
            aid += 1
    ds = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "person", "keypoints": ["x"] * 17}],
    }
    with open(root / "annotations" / "person_keypoints_val2017.json", "w") as f:
        json.dump(ds, f)
    return str(root)


def test_dataset_sample_contract(fake_coco_root, tmp_path):
    cfg = get_config()
    cfg.defrost()
    cfg.DATASET.INPUT_SIZE = 128
    cfg.DATASET.OUTPUT_SIZE = [32, 64]
    cfg.freeze()
    rng = np.random.RandomState(0)
    transforms = transforms_hr_train(cfg, rng=rng)
    hm = [HeatmapGenerator(32, 17, sigma=1), HeatmapGenerator(64, 17, sigma=2)]
    jg = [JointsGenerator(30, 17, 32, True), JointsGenerator(30, 17, 64, True)]
    ds = CocoKeypoints(
        fake_coco_root, mode="val", transforms=transforms,
        heatmap_generator=hm, joint_generator=jg,
        cache_dir=str(tmp_path),
    )
    assert len(ds) == 4
    img, heatmaps, masks, kpts, factors, ae = ds[0]
    assert img.shape == (128, 128, 3)
    assert heatmaps[0].shape == (17, 32, 32)
    assert heatmaps[1].shape == (17, 64, 64)
    assert masks[0].shape == (32, 32)
    assert kpts.shape == (30, 17, 3)
    assert factors.shape == (30, 17)
    assert ae[1].shape == (30, 17, 2)
    # heatmap peaks coincide with transformed keypoints
    for p in range(2):
        for j in range(17):
            x, y, v = kpts[p, j]
            if v > 0:
                assert heatmaps[1][j, int(y), int(x)] > 0.5


def test_dataloader_batching(fake_coco_root, tmp_path):
    cfg = get_config()
    cfg.defrost()
    cfg.DATASET.INPUT_SIZE = 128
    cfg.DATASET.OUTPUT_SIZE = [32, 64]
    cfg.freeze()
    transforms = transforms_hr_train(cfg, rng=np.random.RandomState(0))
    hm = [HeatmapGenerator(32, 17, sigma=1), HeatmapGenerator(64, 17, sigma=2)]
    jg = [JointsGenerator(30, 17, 32, True), JointsGenerator(30, 17, 64, True)]
    ds = CocoKeypoints(
        fake_coco_root, mode="val", transforms=transforms,
        heatmap_generator=hm, joint_generator=jg, cache_dir=str(tmp_path),
    )
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["imgs"].shape == (2, 128, 128, 3)
    assert b["heatmaps"][1].shape == (2, 64, 64, 17)  # NHWC for the model
    assert b["keypoints"].shape == (2, 30, 17, 3)
    assert b["masks"][0].shape == (2, 32, 32)


def test_dataloader_prefetch_bounded():
    """Prefetch submits a bounded window, not the whole epoch up front.

    Guards against unbounded ThreadPoolExecutor fan-out: with a slow
    consumer, in-flight loads must stay <= 2*num_workers + workers' own
    concurrency, not race through all batches.
    """
    import threading
    import time

    loads = []
    lock = threading.Lock()

    class SlowDataset:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            with lock:
                loads.append(i)
            time.sleep(0.002)
            return (np.zeros((2, 2, 3), np.float32),)

    def collate(samples):
        return np.stack([s[0] for s in samples])

    loader = DataLoader(
        SlowDataset(), batch_size=4, shuffle=False, num_workers=2,
        collate=collate,
    )
    it = iter(loader)
    next(it)  # consume one batch, then stall
    time.sleep(0.2)  # give runaway workers time to race ahead if unbounded
    # window = 2*num_workers = 4 submitted batches + 1 refill after the
    # consumed batch -> at most 5 batches (20 items) may have been loaded
    assert len(loads) <= 5 * 4, f"prefetch ran ahead: {len(loads)} items loaded"
    rest = list(it)
    assert len(rest) == 15  # full epoch still delivered, in order
    assert sorted(loads) == list(range(64))


def test_crowd_mask_applied(fake_coco_root, tmp_path):
    """iscrowd annotations produce mask zeros."""
    # patch the annotation file with a crowd region
    ann_path = os.path.join(fake_coco_root, "annotations", "person_keypoints_val2017.json")
    with open(ann_path) as f:
        ds_json = json.load(f)
    ds_json["annotations"][0]["iscrowd"] = 1
    ds_json["annotations"][0]["num_keypoints"] = 0
    with open(ann_path, "w") as f:
        json.dump(ds_json, f)

    from pemp_tpu.data.transforms import Compose, ToFloat

    ds = CocoKeypoints(
        fake_coco_root, mode="val",
        transforms=Compose([ToFloat()]),
        heatmap_generator=[HeatmapGenerator(64, 17, sigma=2)],
        joint_generator=[JointsGenerator(30, 17, 64, True)],
        cache_dir=str(tmp_path),
    )
    _, _, masks, _, _, _ = ds[0]
    assert masks[0].min() == 0.0  # crowd region masked out
    assert masks[0].max() == 1.0
