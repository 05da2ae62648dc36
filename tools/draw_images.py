#!/usr/bin/env python
"""Draw predicted poses over images.

reference: src/draw_images_coco.py / draw_images_hr.py — visual inspection
driver. Runs the TTA eval path and writes overlay PNGs.

    python tools/draw_images.py --config test/tiny --out tmp/draws --max-images 4 \
        [MODEL.PRETRAINED path.ckpt]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--out", default="tmp/draws")
    p.add_argument("--max-images", type=int, default=8)
    p.add_argument(
        "--detail", action="store_true",
        help="also write cluster / node-label / edge-confidence overlays "
        "(reference draw_images_coco.py detail modes)",
    )
    args, options = p.parse_known_args()

    import jax
    import jax.numpy as jnp

    from pemp_tpu.config import get_config, update_config, update_config_command
    from pemp_tpu.data import CocoKeypoints
    from pemp_tpu.geometry import reverse_affine_map
    from pemp_tpu.models import build_pose_model
    from pemp_tpu.train.checkpoint import load_params_only
    from pemp_tpu.tta import TTAPipeline
    from pemp_tpu.utils.vis import draw_detections, save_valid_image

    config = get_config()
    config = update_config(config, f"configs/{args.config}.yaml")
    config = update_config_command(config, options)
    os.makedirs(args.out, exist_ok=True)

    eval_set = CocoKeypoints(
        config.DATASET.ROOT, mode="val", transforms=None, filter_empty=False,
        num_joints=config.DATASET.NUM_JOINTS,
    )
    model = build_pose_model(config)
    in_size = config.DATASET.INPUT_SIZE
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, in_size, in_size, 3)), train=False)
    if config.MODEL.PRETRAINED and os.path.exists(config.MODEL.PRETRAINED):
        params, stats = load_params_only(
            config.MODEL.PRETRAINED, variables["params"], variables["batch_stats"]
        )
        variables = {"params": params, "batch_stats": stats}
    pipe = TTAPipeline(model, variables, config)

    n = min(args.max_images, len(eval_set))
    dataset = "COCO" if config.DATASET.DATASET == "coco" else "CROWDPOSE"
    for i in range(n):
        img_id = int(eval_set.img_ids[i])
        _, _, info, image = eval_set.load_raw(i)
        out = pipe(np.asarray(image))
        persons = np.asarray(out["persons"])[np.asarray(out["person_valid"])]
        if len(persons):
            persons = reverse_affine_map(
                persons.copy(), (image.shape[1], image.shape[0]), in_size,
                out["scaling_type"], min(config.TEST.SCALE_FACTOR),
            )
        save_valid_image(
            image, persons, os.path.join(args.out, f"{img_id}_poses.png"), dataset
        )
        det = np.asarray(out["nodes"])
        valid = np.asarray(out["node_valid"]) & (
            np.asarray(out["node_scores"]) > config.MODEL.MPN.NODE_THRESHOLD
        )
        # detections live on the TTA canvas; draw on a gray canvas
        ch, cw = out["canvas_size"]
        canvas = np.full((ch, cw, 3), 0.3, np.float32)
        draw_detections(canvas, det, valid, os.path.join(args.out, f"{img_id}_det.png"))
        if args.detail:
            # detail modes (reference: draw_images_coco.py:154-175): cluster
            # coloring, node-classification dots, edge-confidence overlays
            from pemp_tpu.decode.assembly import cluster_threshold
            from pemp_tpu.utils.vis import (
                draw_detection_classification_result,
                draw_detection_with_cluster,
                draw_edges_conf,
                draw_inter_person_edge_conf,
            )

            labels = np.asarray(cluster_threshold(
                jnp.asarray(out["edge_index"]), jnp.asarray(out["edge_valid"]),
                jnp.asarray(out["edge_pred"]), len(det), jnp.asarray(valid),
            ))
            stem = os.path.join(args.out, f"{img_id}")
            nscore = np.asarray(out["node_scores"])
            ei = np.asarray(out["edge_index"])
            ep = np.asarray(out["edge_pred"])
            nj = config.DATASET.NUM_JOINTS
            draw_detection_with_cluster(canvas, det, labels, valid, stem, nj)
            draw_detection_classification_result(
                canvas, det, nscore > 0.5, valid, stem
            )
            draw_edges_conf(canvas, det, labels, nscore, ei, ep, valid, stem)
            for t in (0, 3, 4):
                draw_inter_person_edge_conf(
                    canvas, det, labels, nscore, ei, ep, valid, t, stem, nj
                )
        print(f"{img_id}: {len(persons)} persons -> {args.out}")


if __name__ == "__main__":
    main()
