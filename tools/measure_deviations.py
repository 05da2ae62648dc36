#!/usr/bin/env python
"""Quantify the documented TPU-layout deviations (VERDICT r2 #5).

Renders ideal Gaussian scoremaps from GT keypoints (sigma 2, like the
training target generator), runs the REAL detection -> kNN-graph -> label
construction pipeline with labels-as-predictions, decodes, and evaluates AP
on a fake-COCO val split under each deviation setting:

  * KNN_CAP_IN = 32 (default) vs = KNN_K (exact transpose-edge capacity)
  * NODES_PER_TYPE K = 40 (default) vs 80 (looser per-type top-K truncation)

Unlike tools/calc_upper_bounds.py (USE_GT=True: GT joints become the nodes),
this uses USE_GT=False so the detection top-K and the kNN capacity actually
bind — the two static-shape truncations whose AP effect is being measured.
The third documented deviation (TTA border bleed) is bounded directly by
tests/test_tta_projection_golden.py.

    python tools/make_fake_coco.py --root tmp/fake_coco --images 48 --size 256
    python tools/measure_deviations.py --root tmp/fake_coco [--max-images N]

Prints one JSON line per setting: {"cap_in", "k", "AP", "AP50", ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def render_heat(kpts, h, w, num_joints, sigma=2.0):
    """Gaussian scoremaps from canvas-space GT keypoints (numpy).

    Same kernel as the training target generator (data/targets.py /
    reference heatmap generator): 6*sigma+3 window, exp(-d2/(2 s^2))."""
    heat = np.zeros((h, w, num_joints), np.float32)
    size = int(6 * sigma + 3)
    x = np.arange(size, dtype=np.float32)
    x0 = y0 = 3 * sigma + 1
    g = np.exp(-((x - x0) ** 2 + (x[:, None] - y0) ** 2) / (2 * sigma ** 2))
    for person in kpts:
        for j in range(num_joints):
            px, py, v = person[j]
            if v <= 0:
                continue
            xi, yi = int(px), int(py)
            if not (0 <= xi < w and 0 <= yi < h):
                continue
            ul = (int(xi - x0), int(yi - y0))
            br = (int(ul[0] + size), int(ul[1] + size))
            c, d = max(0, -ul[0]), min(br[0], w) - ul[0]
            a, b = max(0, -ul[1]), min(br[1], h) - ul[1]
            cc, dd = max(0, ul[0]), min(br[0], w)
            aa, bb = max(0, ul[1]), min(br[1], h)
            heat[aa:bb, cc:dd, j] = np.maximum(
                heat[aa:bb, cc:dd, j], g[a:b, c:d]
            )
    return heat


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="tmp/fake_coco")
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--input-size", type=int, default=512)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from pemp_tpu.config import get_config
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
    config.defrost()
    config.DATASET.ROOT = args.root
    config.DATASET.INPUT_SIZE = args.input_size
    config.MODEL.GC.MASK_CROWDS = False
    config.MODEL.GC.EDGE_LABEL_METHOD = 6
    config.LOG_DIR = "tmp"
    config.freeze()
    nj = config.DATASET.NUM_JOINTS
    mp = config.DATASET.MAX_NUM_PEOPLE
    input_size = config.DATASET.INPUT_SIZE
    sig = KPT_OKS_SIGMAS[:nj]

    eval_set = CocoKeypoints(
        args.root, mini=False, seed=0, mode="val",
        transforms=None, filter_empty=False, num_joints=nj,
    )
    n = len(eval_set) if args.max_images is None else min(args.max_images, len(eval_set))

    def build_runner(gc):
        @jax.jit
        def run(heat, kpts, factors):
            gb = construct_graph_batch(
                gc, heat, jnp.zeros_like(heat[..., :1]), jnp.zeros_like(heat),
                joints_gt=kpts, factors=factors, testing=False,
            )
            n_edges = gb.edge_valid.sum()
            n_nodes = gb.node_valid.sum()
            persons, valid = decode_poses(
                heat[0], jnp.zeros_like(heat[0]),
                gb.joint_det, jnp.where(gb.node_valid, gb.node_labels, 0.0),
                gb.edge_index, gb.edge_valid,
                jnp.where(gb.edge_valid, gb.edge_labels, 0.0), gb.node_valid,
                node_threshold=0.5, num_joints=nj,
                with_refine=False, with_adjust=True, with_fill_mean=False,
                channels_last=True,
            )
            return persons, valid, n_edges, n_nodes

        return run

    settings = [
        {"cap_in": 32, "k": 40},   # shipped defaults
        {"cap_in": -1, "k": 40},   # exact transpose capacity
        {"cap_in": 32, "k": 80},   # looser detection top-K
        {"cap_in": -1, "k": 80},
    ]
    results = []
    for st in settings:
        cfg = config.clone()
        cfg.defrost()
        cfg.TPU.KNN_CAP_IN = st["cap_in"]
        cfg.TPU.NODES_PER_TYPE = st["k"]
        cfg.freeze()
        gc = GCConfig.from_config(cfg)
        run = build_runner(gc)
        anns, ids = [], []
        edge_counts, node_counts = [], []
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
            bh = -(-out_size[1] // 64) * 64
            bw = -(-out_size[0] // 64) * 64
            heat = render_heat(kpts[:pi], bh, bw, nj)
            persons, valid, n_edges, n_nodes = run(
                jnp.asarray(heat)[None], jnp.asarray(kpts)[None],
                jnp.asarray(factors)[None],
            )
            edge_counts.append(int(n_edges))
            node_counts.append(int(n_nodes))
            ann = persons_to_ann(
                persons, valid, (w, h), input_size, img_id, "short",
                scoring_method="correct",
            )
            if ann is not None:
                anns.append(ann)

        writer = EvalWriter(cfg, fname=f"deviation_{st['cap_in']}_{st['k']}.txt")
        stats = writer.eval_coco(
            eval_set.coco, anns, np.array(ids),
            f"deviation cap_in={st['cap_in']} K={st['k']}",
        )
        writer.close()
        row = {**st, "AP": round(float(stats[0]), 4),
               "AP50": round(float(stats[1]), 4),
               "mean_edges": round(float(np.mean(edge_counts)), 1),
               "mean_nodes": round(float(np.mean(node_counts)), 1)}
        results.append(row)
        print(json.dumps(row), flush=True)
    return results


if __name__ == "__main__":
    main()
