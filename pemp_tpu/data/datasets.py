"""COCO/CrowdPose/OCHuman keypoint datasets + a simple prefetching loader.

reference: src/data/CocoKeypoints_hr.py (primary), CocoKeypoints_hg.py
(long-side-512 variant folded in via ``scaling_type``), CrowdPoseKeypoints.py,
OCHumans.py, CocoKeypoints_test.py. Uses the pure-python COCO API and RLE
utilities; emits the reference's exact sample tuple with fixed-shape padded
keypoints/factors.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from pemp_tpu.data.coco_api import COCO
from pemp_tpu.data.rle import segmentation_to_mask
from pemp_tpu.data.targets import filter_visible, pack_for_batch

KPT_OKS_SIGMAS = (
    np.array(
        [.26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62, 1.07, 1.07, .87, .87, .89, .89]
    )
    / 10.0
)
CROWDPOSE_SIGMAS = (
    np.array([.79, .79, .72, .72, .62, .62, 1.07, 1.07, .87, .87, .89, .89, .79, .79]) / 10.0
)


def _load_image(path):
    from PIL import Image

    with open(path, "rb") as f:
        return np.array(Image.open(f).convert("RGB"))


class CocoKeypoints:
    """reference: src/data/CocoKeypoints_hr.py:13-163."""

    def __init__(self, path, mini=False, mode="train", seed=0, filter_empty=True,
                 img_ids=None, year=17, transforms=None, heatmap_generator=None,
                 mask_crowds=True, joint_generator=None, num_joints=17,
                 cache_dir="tmp"):
        rng = np.random.RandomState(seed)
        self.root_path = path
        ann_path = f"{path}/annotations/person_keypoints_{mode}20{year}.json"
        self.coco = COCO(ann_path)
        self.mask_crowds = mask_crowds
        self.transforms = transforms
        self.num_joints = num_joints
        assert isinstance(heatmap_generator, (list, tuple)) or heatmap_generator is None
        self.num_scales = len(heatmap_generator) if heatmap_generator else 0
        self.heatmap_generator = heatmap_generator
        self.joint_generator = joint_generator
        self.max_num_people = 30
        assert mode in ("train", "val")
        self.data_dir = f"{mode}20{year}"
        self.cat_ids = self.coco.getCatIds(catNms=["person"])
        self.img_ids = img_ids if img_ids is not None else list(self.coco.imgs.keys())

        if filter_empty and img_ids is None:
            cache = os.path.join(cache_dir, f"usable_ids_{mode}_{year}.p")
            if os.path.exists(cache):
                with open(cache, "rb") as f:
                    self.img_ids = pickle.load(f)
            else:
                usable = []
                for iid in self.img_ids:
                    anns = self.coco.loadAnns(self.coco.getAnnIds(imgIds=iid))
                    ok = any(
                        np.count_nonzero(np.array(a["keypoints"])[2::3]) > 1
                        for a in anns
                    )
                    if ok:
                        usable.append(iid)
                self.img_ids = usable
                os.makedirs(cache_dir, exist_ok=True)
                with open(cache, "wb") as f:
                    pickle.dump(self.img_ids, f)

        if mini and img_ids is None:
            n = 500 if (year == 17 and mode == "val") else 4000
            n = min(n, len(self.img_ids))
            self.img_ids = rng.choice(self.img_ids, n, replace=False)

    def __len__(self):
        return len(self.img_ids)

    def sigmas(self):
        return KPT_OKS_SIGMAS[: self.num_joints]

    def load_raw(self, idx):
        img_id = int(self.img_ids[idx])
        anns = self.coco.loadAnns(self.coco.getAnnIds(imgIds=img_id))
        info = self.coco.loadImgs(img_id)[0]
        img = _load_image(f"{self.root_path}/{self.data_dir}/{info['file_name']}")
        return img_id, anns, info, img

    def __getitem__(self, idx):
        assert self.transforms is not None and self.heatmap_generator is not None
        img_id, anns, info, img = self.load_raw(idx)
        h, w = info["height"], info["width"]

        sig = self.sigmas()
        keypoints_list, factor_list, scale_list = [], [], []
        for a in anns:
            if a.get("num_keypoints", 0) > 0:
                keypoints_list.append(
                    np.array(a["keypoints"], np.float64).reshape(-1, 3)[: self.num_joints]
                )
                factor_list.append(
                    (sig * 2) ** 2 * (a.get("area", 1.0) + np.spacing(1)) * 2.0
                )
                scale_list.append((a.get("area", 1.0) + np.spacing(1)) * 2.0)
        keypoints = np.array(keypoints_list, np.float64)
        factors = np.array(factor_list, np.float64)
        scales = np.array(scale_list, np.float64)

        mask = np.zeros((h, w))
        if self.mask_crowds:
            for a in anns:
                if a.get("iscrowd"):
                    mask += segmentation_to_mask(a["segmentation"], h, w)
                elif a.get("num_keypoints", 0) == 0 and "segmentation" in a:
                    mask += segmentation_to_mask(a["segmentation"], h, w)
        mask = (mask < 0.5).astype(np.float32)

        mask_list = [mask.copy() for _ in range(self.num_scales)]
        keypoint_list = [keypoints.copy() for _ in range(self.num_scales)]
        ae_keypoints = [keypoints.copy() for _ in range(self.num_scales)]
        heatmaps, ae_targets = [], []

        img, mask_list, keypoint_list, factors = self.transforms(
            img, mask_list, keypoint_list, factors
        )

        for s in range(self.num_scales):
            heatmaps.append(
                self.heatmap_generator[s](keypoint_list[s], scales).astype(np.float32)
            )
            ae_targets.append(
                self.joint_generator[s](keypoint_list[s]).astype(np.int32)
            )
            keypoint_list[s] = filter_visible(keypoint_list[s], mask_list[s].shape)
            mask_list[s] = mask_list[s].astype(np.float32)

        kpts = keypoint_list[-1]
        if len(kpts) != 0:
            keep = kpts[:, :, 2].sum(axis=1) != 0.0
            keypoint_list[-1] = pack_for_batch(kpts[keep].astype(np.float32), 30)
            factors = pack_for_batch(np.asarray(factors)[keep], 30)
        else:
            keypoint_list[-1] = np.zeros((30, self.num_joints, 3), np.float32)
            factors = np.zeros((30, self.num_joints), np.float64)

        return img, heatmaps, mask_list, keypoint_list[-1], factors.astype(np.float32), ae_targets


class CrowdPoseKeypoints(CocoKeypoints):
    """reference: src/data/CrowdPoseKeypoints.py:12-120 (14 joints)."""

    def __init__(self, path, mini=False, mode="test", seed=0, filter_empty=True,
                 img_ids=None, transforms=None, heatmap_generator=None,
                 joint_generator=None, cache_dir="tmp"):
        rng = np.random.RandomState(seed)
        self.root_path = path
        self.coco = COCO(f"{path}/json/crowdpose_{mode}.json")
        self.mask_crowds = False
        self.transforms = transforms
        self.num_joints = 14
        self.num_scales = len(heatmap_generator) if heatmap_generator else 0
        self.heatmap_generator = heatmap_generator
        self.joint_generator = joint_generator
        self.max_num_people = 30
        self.data_dir = "images"
        self.cat_ids = [1]
        self.img_ids = img_ids if img_ids is not None else list(self.coco.imgs.keys())
        if filter_empty and img_ids is None:
            self.img_ids = [
                iid
                for iid in self.img_ids
                if any(
                    np.count_nonzero(np.array(a["keypoints"])[2::3]) > 1
                    for a in self.coco.loadAnns(self.coco.getAnnIds(imgIds=iid))
                )
            ]
        if mini and img_ids is None:
            self.img_ids = rng.choice(self.img_ids, min(4000, len(self.img_ids)), replace=False)

    def sigmas(self):
        return CROWDPOSE_SIGMAS


class OCHumans(CocoKeypoints):
    """Eval-only COCO-format variant. reference: src/data/OCHumans.py."""

    def __init__(self, path, mode="val", seed=0, transforms=None, mask_crowds=False):
        self.root_path = path
        self.coco = COCO(f"{path}/ochuman_coco_format_{mode}_range_0.00_1.00.json")
        self.mask_crowds = mask_crowds
        self.transforms = transforms
        self.num_joints = 17
        self.num_scales = 0
        self.heatmap_generator = None
        self.joint_generator = None
        self.max_num_people = 30
        self.data_dir = "images"
        self.img_ids = list(self.coco.imgs.keys())


class CocoKeypointsTest:
    """Image-only loader for test-dev. reference: src/data/CocoKeypoints_test.py."""

    def __init__(self, path, seed=0, year=17, transforms=None):
        self.root_path = path
        self.coco = COCO(f"{path}/annotations/image_info_test-dev20{year}.json")
        self.transforms = transforms
        self.data_dir = f"test20{year}"
        self.img_ids = list(self.coco.imgs.keys())

    def __len__(self):
        return len(self.img_ids)

    def __getitem__(self, idx):
        img_id = int(self.img_ids[idx])
        info = self.coco.loadImgs(img_id)[0]
        img = _load_image(f"{self.root_path}/{self.data_dir}/{info['file_name']}")
        if self.transforms:
            img, _, _, _ = self.transforms(img, [], [], np.zeros(0))
        return (img,)


class DataLoader:
    """Minimal prefetching batch loader (replaces torch DataLoader)."""

    def __init__(self, dataset, batch_size=1, shuffle=False, num_workers=0,
                 drop_last=True, seed=0, collate=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.rng = np.random.RandomState(seed)
        self.collate = collate or default_collate

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        if self.num_workers > 0:
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor

            # bounded prefetch: keep at most ~2x num_workers batches in
            # flight so completed-but-unconsumed batches cannot pile up and
            # exhaust host RAM on long epochs (each COCO batch is ~25MB of
            # images + 2-scale heatmaps + masks)
            window = 2 * self.num_workers
            with ThreadPoolExecutor(self.num_workers) as pool:
                pending = deque()
                it = iter(batches)
                for b in it:
                    pending.append(pool.submit(self._load_batch, b))
                    if len(pending) >= window:
                        break
                while pending:
                    f = pending.popleft()
                    nxt = next(it, None)
                    if nxt is not None:
                        pending.append(pool.submit(self._load_batch, nxt))
                    yield f.result()
        else:
            for b in batches:
                yield self._load_batch(b)

    def _load_batch(self, idxs):
        return self.collate([self.dataset[int(i)] for i in idxs])


def default_collate(samples):
    """Stack the reference sample tuple into the train-step batch dict."""
    imgs = np.stack([s[0] for s in samples]).astype(np.float32)
    n_scales = len(samples[0][1])
    return {
        "imgs": imgs,
        "heatmaps": [
            np.stack([s[1][i] for s in samples]).transpose(0, 2, 3, 1)
            for i in range(n_scales)
        ],
        "masks": [np.stack([s[2][i] for s in samples]) for i in range(n_scales)],
        "keypoints": np.stack([s[3] for s in samples]),
        "factors": np.stack([s[4] for s in samples]).astype(np.float32),
        "ae_targets": [
            np.stack([s[5][i] for s in samples]) for i in range(n_scales)
        ],
    }
