#!/usr/bin/env python
"""Graph/detection statistics over a dataset.

reference: src/test/comp_graph_stats.py — histograms of detection scores,
missed GT joints, and graph sizes; used to sanity-check the detection and
matching stack.

    python tools/comp_graph_stats.py --config test/tiny [--max-images N]
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
    p.add_argument("--max-images", type=int, default=50)
    args, options = p.parse_known_args()

    import jax
    import jax.numpy as jnp

    from pemp_tpu.config import get_config, update_config, update_config_command
    from pemp_tpu.data import (
        CocoKeypoints,
        HeatmapGenerator,
        JointsGenerator,
        transforms_hr_train,
    )
    from pemp_tpu.graph.constructor import GCConfig, construct_graph_batch

    config = get_config()
    config = update_config(config, f"configs/{args.config}.yaml")
    config = update_config_command(config, options)

    out_sizes = list(config.DATASET.OUTPUT_SIZE)
    nj = config.DATASET.NUM_JOINTS
    hm = [HeatmapGenerator(s, nj, sigma=max(int(s / 64), 1)) for s in out_sizes]
    jg = [JointsGenerator(30, nj, s, True) for s in out_sizes]
    tf = transforms_hr_train(config, rng=np.random.RandomState(0))
    ds = CocoKeypoints(
        config.DATASET.ROOT, mode="val", transforms=tf,
        heatmap_generator=hm, joint_generator=jg, filter_empty=False,
        num_joints=nj,
    )
    gc = GCConfig.from_config(config)

    n_det, n_edges, n_pos_nodes, n_missed, scores_all = [], [], [], [], []
    n = min(args.max_images, len(ds))
    for i in range(n):
        img, heatmaps, masks, kpts, factors, _ = ds[i]
        heat = jnp.asarray(heatmaps[-1].transpose(1, 2, 0))[None]
        gb = construct_graph_batch(
            gc, heat, jnp.zeros_like(heat[..., :1]), jnp.zeros_like(heat),
            joints_gt=jnp.asarray(kpts)[None], factors=jnp.asarray(factors)[None],
        )
        valid = np.asarray(gb.node_valid)
        labels = np.asarray(gb.node_labels)
        n_det.append(int(valid.sum()))
        n_edges.append(int(np.asarray(gb.edge_valid).sum()))
        n_pos_nodes.append(int(labels[valid].sum()))
        scores_all.extend(np.asarray(gb.joint_scores)[valid].tolist())
        gt_count = int((kpts[:, :, 2] > 0).sum())
        n_missed.append(max(gt_count - int(labels[valid].sum()), 0))

    def stats(name, xs):
        xs = np.asarray(xs, np.float64)
        print(f"{name}: mean={xs.mean():.2f} median={np.median(xs):.1f} "
              f"p95={np.percentile(xs, 95):.1f} max={xs.max():.1f}")

    print(f"over {n} images:")
    stats("detections/img", n_det)
    stats("valid edges/img", n_edges)
    stats("label-positive nodes/img", n_pos_nodes)
    stats("missed GT joints/img (num_non_detected)", n_missed)
    stats("detection scores", scores_all)


if __name__ == "__main__":
    main()
