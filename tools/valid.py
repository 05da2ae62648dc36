#!/usr/bin/env python
"""MPN model evaluation entry point.

Mirrors the reference CLI (reference: src/valid.py:15-23):

    python tools/valid.py --config hybrid_class_agnostic_end2end/model_58_4 \
        --out_file eval.txt [KEY VALUE ...]

Per image: multi-scale + flip TTA (TPU-batched), graph + MPN, on-device or
correlation-clustering grouping, refine/adjust, reverse affine map, COCO/
CrowdPose OKS evaluation — structured like src/valid.py:94-183 with the
host<->device boundary moved to after quarter-pixel adjustment.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate the MPN pose model")
    p.add_argument("--config", required=True)
    p.add_argument("--out_file", required=True)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("options", nargs=argparse.REMAINDER, default=None)
    return p.parse_args()


def main():
    args = parse_args()

    from pemp_tpu.parallel import maybe_init_distributed

    maybe_init_distributed()  # no-op unless launched by a cluster manager

    import jax
    import jax.numpy as jnp

    from pemp_tpu.config import get_config, update_config, update_config_command
    from pemp_tpu.cluster import cluster_labels
    from pemp_tpu.data import CocoKeypoints, CocoKeypointsTest, CrowdPoseKeypoints, OCHumans, transforms_to_tensor
    from pemp_tpu.decode.format import persons_to_ann
    from pemp_tpu.eval import EvalWriter
    from pemp_tpu.eval.coco_eval import coco_eval  # noqa: F401 (EvalWriter uses it)
    from pemp_tpu.geometry import get_scaling_type
    from pemp_tpu.models import build_pose_model
    from pemp_tpu.train.checkpoint import load_params_only
    from pemp_tpu.tta import TTAPipeline

    config = get_config()
    cfg_file = args.config if args.config.endswith(".yaml") else f"configs/{args.config}.yaml"
    config = update_config(config, cfg_file)
    config = update_config_command(config, args.options)
    config.defrost()
    if not config.LOG_DIR:
        config.LOG_DIR = "tmp"
    # eval never consumes aux-step predictions — skip their stacks/heads
    config.TPU.COLLECT_AUX = False
    config.freeze()
    eval_writer = EvalWriter(config, fname=args.out_file)
    scaling_type = get_scaling_type(config)

    transforms, _ = transforms_to_tensor(config)
    split = config.TEST.SPLIT
    if split == "coco_17_full":
        eval_set = CocoKeypoints(
            config.DATASET.ROOT, mini=False, seed=0, mode="val", year=17,
            transforms=None, mask_crowds=False, filter_empty=False,
        )
    elif split == "coco_17_mini":
        eval_set = CocoKeypoints(
            config.DATASET.ROOT, mini=True, seed=0, mode="val", year=17,
            transforms=None, mask_crowds=False, filter_empty=False,
        )
    elif split == "test-dev2017":
        eval_set = CocoKeypointsTest(config.DATASET.ROOT, seed=0, year=17)
    elif split == "crowd_pose_test":
        eval_set = CrowdPoseKeypoints(
            config.DATASET.ROOT, mini=False, seed=0, mode="test",
            transforms=None, filter_empty=False,
        )
    elif split in ("ochuman_valid", "ochuman_test"):
        # reference maps ochuman_valid -> mode "val" (valid.py:71-78), which
        # selects ochuman_coco_format_val_range_0.00_1.00.json
        mode = "val" if split == "ochuman_valid" else "test"
        eval_set = OCHumans(config.DATASET.ROOT, mode=mode, transforms=None)
    else:
        raise NotImplementedError(split)

    model = build_pose_model(config)
    in_size = config.DATASET.INPUT_SIZE
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, in_size, in_size, 3)), train=False
    )
    if config.MODEL.PRETRAINED and os.path.exists(config.MODEL.PRETRAINED):
        params, stats = load_params_only(
            config.MODEL.PRETRAINED, variables["params"], variables["batch_stats"]
        )
        variables = {"params": params, "batch_stats": stats}
        print(f"loaded checkpoint {config.MODEL.PRETRAINED}")
    else:
        print("WARNING: no checkpoint found, evaluating random weights")

    cc_method = config.MODEL.GC.CC_METHOD
    on_device_decode = cc_method == "threshold"
    # eval fan-out: shard the image batch across all local devices
    # (SURVEY §2.3; the reference evaluates on a single GPU only)
    mesh = None
    if len(jax.local_devices()) > 1 and os.environ.get("EVAL_FANOUT", "1") != "0":
        from pemp_tpu.parallel import make_mesh

        # fan-out mesh over LOCAL devices only: with process_count > 1 each
        # process feeds different host-local batches (different shapes), so a
        # jit spanning non-addressable devices would hang — image sharding
        # across processes is handled separately by shard_indices below
        mesh = make_mesh(devices=jax.local_devices())
        print(f"eval fan-out over {mesh.devices.size} local devices")
    pipe = TTAPipeline(
        model, variables, config, with_decode=on_device_decode, mesh=mesh
    )

    anns, eval_ids = [], []
    dur_kpt, dur_constr = [], []
    n = len(eval_set) if args.max_images is None else min(args.max_images, len(eval_set))
    num_joints = config.DATASET.NUM_JOINTS
    # multi-host sharding: each process evaluates an interleaved slice and
    # writes a partial-results file; process 0 merges after a barrier
    # (SURVEY §2.3 — the reference evaluates single-GPU only)
    from pemp_tpu.parallel import shard_indices

    pc, pi = jax.process_count(), jax.process_index()
    my_indices = shard_indices(n, pc, pi)
    # device batching: images are loaded in windows, grouped by padded-shape
    # signature inside run_batched, and processed as one jit per batch —
    # the reference evaluates batch=1 in python (reference: valid.py:94-135)
    window = int(os.environ.get("EVAL_WINDOW", 64))
    batch_size = int(os.environ.get("EVAL_BATCH", 8))

    def iter_outputs():
        for w0 in range(0, len(my_indices), window):
            idxs = my_indices[w0:w0 + window]
            images = []
            for i in idxs:
                img_id = int(eval_set.img_ids[i])
                _, _, info, image = eval_set.load_raw(i) if hasattr(eval_set, "load_raw") else (
                    None, None, eval_set.coco.loadImgs(img_id)[0], eval_set[i][0],
                )
                images.append(np.asarray(image))
            t0 = time.perf_counter()
            outs = pipe.run_batched(images, batch_size=batch_size)
            per_img = (time.perf_counter() - t0) / len(idxs)
            for i, out in zip(idxs, outs):
                dur_kpt.append(per_img)
                yield i, out

    for i, out in iter_outputs():
        img_id = int(eval_set.img_ids[i])
        eval_ids.append(img_id)
        t0 = time.perf_counter()
        if out.get("tag_pred") is not None:
            # tag-regression variants group by AE tag matching on the MPN's
            # per-node tags with detector scores (reference: valid.py:115-131
            # perd_to_ann_ae -> mpn_match_by_tag -> refine -> adjust)
            from pemp_tpu.decode.ae_grouping import (
                HeatmapParser, Params, mpn_match_by_tag,
            )

            keep = np.asarray(out["node_valid"])
            det = np.asarray(out["nodes"])[keep]
            scr = np.asarray(out["detector_scores"])[keep]
            tp = np.asarray(out["tag_pred"])[keep]
            if tp.ndim == 1:
                tp = tp[:, None]
            ans = mpn_match_by_tag(det, tp, scr, Params(num_joints=num_joints))
            sm_np = np.asarray(out["scoremaps"]).transpose(2, 0, 1)
            tg_np = np.asarray(out["tags"]).transpose(2, 0, 1, 3)
            parser = HeatmapParser(num_joints=num_joints)
            if len(ans) and config.TEST.WITH_REFINE:
                # fill_score=0.001 matches Utils.py refine (the reference's
                # perd_to_ann_ae path, Utils.py:1102), not group.py refine
                ans = np.stack(
                    [parser.refine(sm_np, tg_np, kp, fill_score=0.001) for kp in ans]
                )
            if len(ans) and config.TEST.ADJUST:
                ans = parser.adjust(np.asarray(ans, np.float32), sm_np)
            persons = np.asarray(ans, np.float32).reshape(-1, num_joints, 3)
            person_valid = np.ones(len(persons), bool)
        elif on_device_decode:
            persons, person_valid = out["persons"], out["person_valid"]
        elif cc_method == "greedy":
            # host greedy person construction (reference: Utils.py:517-626)
            from pemp_tpu.decode import greedy_person_construction

            nodes = np.asarray(out["nodes"])
            nvalid = np.asarray(out["node_valid"])
            nscore = np.asarray(out["node_scores"]) * nvalid
            ei = np.asarray(out["edge_index"])
            ev = np.asarray(out["edge_valid"])
            ep = np.asarray(out["edge_pred"]) * ev
            cp = np.asarray(out["class_prob"]) if out["class_prob"] is not None else None
            persons, _ = greedy_person_construction(
                nodes, nscore, ep, cp, ei, num_joints
            )
            person_valid = np.ones(len(persons), bool)
            if len(persons) == 0:
                persons = np.zeros((0, num_joints, 3))
        else:
            # host correlation clustering (GAEC/KL/MUT) on the MPN edge scores
            from pemp_tpu.decode.assembly import decode_poses

            nodes = np.asarray(out["nodes"])
            nscore = np.asarray(out["node_scores"])
            nvalid = np.asarray(out["node_valid"])
            ei = np.asarray(out["edge_index"])
            ev = np.asarray(out["edge_valid"])
            ep = np.asarray(out["edge_pred"])
            keep = nvalid & (nscore > config.MODEL.MPN.NODE_THRESHOLD)
            sel = ev & keep[ei[0]] & keep[ei[1]]
            labels = cluster_labels(ei[:, sel], ep[sel] - 0.5, len(nodes), cc_method)
            persons, person_valid = decode_poses(
                jnp.transpose(out["scoremaps"], (2, 0, 1)),
                jnp.transpose(out["tags"], (2, 0, 1, 3)),
                jnp.asarray(nodes), jnp.asarray(nscore), jnp.asarray(ei),
                jnp.asarray(ev), jnp.asarray(ep), jnp.asarray(nvalid),
                node_threshold=config.MODEL.MPN.NODE_THRESHOLD,
                num_joints=num_joints,
                class_probs=jnp.asarray(out["class_prob"]) if out["class_prob"] is not None else None,
                with_fill_mean=config.TEST.FILL_MEAN,
                with_refine=config.TEST.WITH_REFINE,
                with_adjust=config.TEST.ADJUST,
                cluster_labels=jnp.asarray(labels),
            )
        ann = persons_to_ann(
            persons, person_valid, out["base_size"], in_size, img_id,
            out["scaling_type"], min(config.TEST.SCALE_FACTOR),
            scoring_method=config.TEST.SCORING,
        )
        dur_constr.append(time.perf_counter() - t0)
        if ann is not None:
            anns.append(ann)
        if (i + 1) % 50 == 0:
            print(f"{i + 1}/{n} images, {np.mean(dur_kpt[-50:]):.3f}s/img fwd")

    if pc > 1:
        # multi-host gather: every process writes its part to the shared log
        # dir; a device barrier orders the writes before host 0 merges
        from jax.experimental import multihost_utils

        from pemp_tpu.parallel import cleanup_parts, merge_parts, write_part

        stem = f"eval_{split}"
        write_part(config.LOG_DIR, stem, pi, anns, eval_ids)
        multihost_utils.sync_global_devices("eval_parts_written")
        if pi != 0:
            return
        anns, eval_ids = merge_parts(config.LOG_DIR, stem, pc)
        cleanup_parts(config.LOG_DIR, stem, pc)

    if split == "test-dev2017":
        from pemp_tpu.eval.coco_eval import coco_eval as _  # noqa: F401
        import json

        with open(os.path.join(config.LOG_DIR, "person_keypoints_test-dev2017_mpn_results.json"), "w") as f:
            json.dump(sum(anns, []), f)
    else:
        eval_writer.eval_coco(
            eval_set.coco, anns, np.array(eval_ids), "General Evaluation",
            f"person_keypoints_{split}_mpn_results.json",
        )
        eval_writer.eval_speed("kpt_detector", dur_kpt, "pose_constr", dur_constr)
        eval_writer.close()


if __name__ == "__main__":
    main()
