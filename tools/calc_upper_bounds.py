#!/usr/bin/env python
"""Label-construction AP ceiling via the UpperBound path.

reference: src/test/calc_upper_bounds.py — run GT-labels-as-predictions
through graph construction + clustering + assembly + reverse mapping + COCO
eval. Measures how much AP the matching/label/decode pipeline can possibly
deliver, independent of any learned model. Uses the deterministic eval
geometry (64-multiple short-side resize, outputs at half resolution,
reverse map "short").

    python tools/calc_upper_bounds.py --config test/tiny --out_file ub.txt [--max-images N]
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
    p.add_argument("--out_file", required=True)
    p.add_argument("--max-images", type=int, default=None)
    args, options = p.parse_known_args()

    import jax
    import jax.numpy as jnp

    from pemp_tpu.config import get_config, update_config, update_config_command
    from pemp_tpu.data import CocoKeypoints
    from pemp_tpu.data.datasets import KPT_OKS_SIGMAS
    from pemp_tpu.decode.assembly import decode_poses
    from pemp_tpu.decode.format import persons_to_ann
    from pemp_tpu.eval import EvalWriter
    from pemp_tpu.geometry import (
        factor_affine,
        get_affine_transform,
        get_multi_scale_size,
        kpt_affine,
    )
    from pemp_tpu.graph.constructor import GCConfig, construct_graph_batch

    config = get_config()
    config = update_config(config, f"configs/{args.config}.yaml")
    config = update_config_command(config, options)
    config.defrost()
    config.MODEL.GC.USE_GT = True
    config.MODEL.GC.EDGE_LABEL_METHOD = 2
    config.MODEL.GC.MASK_CROWDS = False
    if not config.LOG_DIR:
        config.LOG_DIR = "tmp"
    config.freeze()
    eval_writer = EvalWriter(config, fname=args.out_file)

    nj = config.DATASET.NUM_JOINTS
    mp = config.DATASET.MAX_NUM_PEOPLE
    input_size = config.DATASET.INPUT_SIZE
    eval_set = CocoKeypoints(
        config.DATASET.ROOT, mini=False, seed=0, mode="val",
        transforms=None, filter_empty=False, num_joints=nj,
    )
    gc = GCConfig.from_config(config)
    sig = KPT_OKS_SIGMAS[:nj]

    @jax.jit
    def run(heat_shape_dummy, kpts, factors):
        h, w = heat_shape_dummy.shape[1:3]
        heat = jnp.zeros((1, h, w, nj))
        gb = construct_graph_batch(
            gc, heat, jnp.zeros((1, h, w, 1)), jnp.zeros((1, h, w, nj)),
            joints_gt=kpts, factors=factors, testing=False,
        )
        persons, valid = decode_poses(
            jnp.zeros((nj, h, w)), jnp.zeros((nj, h, w)),
            gb.joint_det, jnp.where(gb.node_valid, gb.node_labels, 0.0),
            gb.edge_index, gb.edge_valid, gb.edge_labels, gb.node_valid,
            node_threshold=0.5, num_joints=nj,
            with_refine=False, with_adjust=False, with_fill_mean=False,
        )
        return persons, valid

    n = len(eval_set) if args.max_images is None else min(args.max_images, len(eval_set))
    anns, ids = [], []
    for i in range(n):
        img_id = int(eval_set.img_ids[i])
        ids.append(img_id)
        info = eval_set.coco.loadImgs(img_id)[0]
        h, w = info["height"], info["width"]
        gts = eval_set.coco.loadAnns(eval_set.coco.getAnnIds(imgIds=img_id))

        resized, center, scale = get_multi_scale_size(h, w, input_size, 1.0, 1.0)
        out_size = (int(resized[0] / 2), int(resized[1] / 2))
        mat = get_affine_transform(center, scale, out_size)

        kpts = np.zeros((mp, nj, 3), np.float32)
        factors = np.ones((mp, nj), np.float32)
        pi = 0
        for a in gts:
            if a.get("num_keypoints", 0) == 0 or pi >= mp:
                continue
            kp = np.array(a["keypoints"], np.float64).reshape(-1, 3)[:nj]
            kp[:, :2] = kpt_affine(kp[:, :2], mat)
            kpts[pi] = kp
            fac = (sig * 2) ** 2 * (a.get("area", 1.0) + np.spacing(1)) * 2.0
            factors[pi] = factor_affine(fac, mat)
            pi += 1
        if pi == 0:
            continue

        # bucket the canvas (static shapes per bucket)
        bh = -(-out_size[1] // 64) * 64
        bw = -(-out_size[0] // 64) * 64
        persons, valid = run(
            jnp.zeros((1, bh, bw, 1)), jnp.asarray(kpts)[None], jnp.asarray(factors)[None]
        )
        ann = persons_to_ann(
            persons, valid, (w, h), input_size, img_id, "short",
            scoring_method="correct",
        )
        if ann is not None:
            anns.append(ann)

    stats = eval_writer.eval_coco(
        eval_set.coco, anns, np.array(ids), "Upper bound (labels as predictions)"
    )
    eval_writer.close()
    return stats


if __name__ == "__main__":
    main()
