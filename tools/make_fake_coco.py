#!/usr/bin/env python
"""Generate a small fake COCO dataset on disk (images + annotations) for
smoke tests and CLI drives when no real COCO data is available."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="tmp/fake_coco")
    p.add_argument("--images", type=int, default=8)
    p.add_argument("--mode", default="val")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--people", type=int, default=None,
                   help="fixed people per image (default: random 1-4)")
    p.add_argument(
        "--flavor", default="coco", choices=["coco", "testdev", "ochuman"],
        help="coco: person_keypoints_<mode>2017; testdev: image_info JSON + "
        "test2017 dir (submission path); ochuman: OCHuman-format JSON + images/",
    )
    args = p.parse_args()

    from PIL import Image

    from pemp_tpu.data.synthetic import random_scene, render_image

    img_dir = {
        "coco": f"{args.mode}2017", "testdev": "test2017", "ochuman": "images"
    }[args.flavor]
    os.makedirs(f"{args.root}/annotations", exist_ok=True)
    os.makedirs(f"{args.root}/{img_dir}", exist_ok=True)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    for i in range(1, args.images + 1):
        w = h = args.size
        kps, areas = random_scene(rng, input_size=args.size,
                                  n_people=args.people)
        img = render_image(kps, args.size, rng)
        fname = f"{i:012d}.jpg"
        Image.fromarray((img * 255).astype(np.uint8)).save(
            f"{args.root}/{img_dir}/{fname}"
        )
        images.append({"id": i, "width": w, "height": h, "file_name": fname})
        for kp, area in zip(kps, areas):
            flat = []
            for x, y, v in kp:
                flat += [float(x), float(y), int(v)]
            xs = kp[kp[:, 2] > 0, 0]
            ys = kp[kp[:, 2] > 0, 1]
            annotations.append(
                {
                    "id": aid, "image_id": i, "category_id": 1,
                    "keypoints": flat,
                    "num_keypoints": int((kp[:, 2] > 0).sum()),
                    "area": float(area),
                    "bbox": [float(xs.min()), float(ys.min()),
                             float(xs.max() - xs.min()), float(ys.max() - ys.min())],
                    "iscrowd": 0,
                    "segmentation": [[float(xs.min()), float(ys.min()),
                                      float(xs.max()), float(ys.min()),
                                      float(xs.max()), float(ys.max()),
                                      float(xs.min()), float(ys.max())]],
                }
            )
            aid += 1
    if args.flavor == "testdev":
        # submission path: image-info only, no annotations
        # (reference: CocoKeypoints_test.py)
        ds = {"images": images, "categories": [{"id": 1, "name": "person"}]}
        out = f"{args.root}/annotations/image_info_test-dev2017.json"
    elif args.flavor == "ochuman":
        ds = {
            "images": images,
            "annotations": annotations,
            "categories": [{"id": 1, "name": "person"}],
        }
        out = f"{args.root}/ochuman_coco_format_val_range_0.00_1.00.json"
    else:
        ds = {
            "images": images,
            "annotations": annotations,
            "categories": [{"id": 1, "name": "person"}],
        }
        out = f"{args.root}/annotations/person_keypoints_{args.mode}2017.json"
    with open(out, "w") as f:
        json.dump(ds, f)
    print(f"wrote {args.images} images to {args.root}")


if __name__ == "__main__":
    main()
