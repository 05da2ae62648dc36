#!/usr/bin/env python
"""Backbone-parity evaluation: HigherHRNet + AE grouping vs correlation
clustering on tags (no MPN).

Mirrors the reference CLI (reference: src/valid_hr.py:88-172): per image,
backbone-only multi-scale inference, then both HeatmapParser (Munkres AE
grouping) and cluster_cc (GAEC on tag distances); two AP numbers side by side.

    python tools/valid_hr.py --config hrnet/w32_512 --out_file hr_eval.txt [KEY VALUE ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--out_file", required=True)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument(
        "--parser", choices=["hr", "hg", "hg2"], default="hr",
        help="AE grouping parser: hr = HRNet HeatmapParser (reference "
        "valid_hr.py:109); hg / hg2 = hourglass parsers "
        "(reference group_hg.py:192/:414, used by the reference's "
        "hourglass eval scripts)",
    )
    p.add_argument("options", nargs=argparse.REMAINDER, default=None)
    return p.parse_args()


def main():
    args = parse_args()

    from pemp_tpu.parallel import maybe_init_distributed

    maybe_init_distributed()  # no-op unless launched by a cluster manager

    import jax
    import jax.numpy as jnp

    from pemp_tpu.config import get_config, update_config, update_config_command
    from pemp_tpu.data import CocoKeypoints
    from pemp_tpu.decode.ae_grouping import HeatmapParser, cluster_cc
    from pemp_tpu.decode.format import gen_ann_format
    from pemp_tpu.eval import EvalWriter
    from pemp_tpu.geometry import get_scaling_type, reverse_affine_map
    from pemp_tpu.models.ae_group import build_ae_group_model
    from pemp_tpu.train.checkpoint import load_params_only
    from pemp_tpu.tta import TTAPipeline

    config = get_config()
    cfg_file = args.config if args.config.endswith(".yaml") else f"configs/{args.config}.yaml"
    config = update_config(config, cfg_file)
    config = update_config_command(config, args.options)
    if not config.LOG_DIR:
        config.defrost()
        config.LOG_DIR = "tmp"
        config.freeze()
    eval_writer = EvalWriter(config, fname=args.out_file)
    scaling_type = get_scaling_type(config)

    eval_set = CocoKeypoints(
        config.DATASET.ROOT, mini=(config.TEST.SPLIT == "coco_17_mini"),
        seed=0, mode="val", year=17, transforms=None, mask_crowds=False,
        filter_empty=False,
    )

    model = build_ae_group_model(config)
    in_size = config.DATASET.INPUT_SIZE
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, in_size, in_size, 3)), train=False)
    if config.MODEL.PRETRAINED and os.path.exists(config.MODEL.PRETRAINED):
        params, stats = load_params_only(
            config.MODEL.PRETRAINED, variables["params"], variables["batch_stats"]
        )
        variables = {"params": params, "batch_stats": stats}
        print(f"loaded checkpoint {config.MODEL.PRETRAINED}")
    else:
        print("WARNING: no checkpoint found, evaluating random weights")

    # device batching: like tools/valid.py, images are loaded in windows and
    # grouped by padded-shape signature inside run_batched so the backbone
    # runs at device-batch throughput (the reference evaluates batch=1 in
    # python, reference: src/valid_hr.py:146-172)
    mesh = None
    if len(jax.local_devices()) > 1 and os.environ.get("EVAL_FANOUT", "1") != "0":
        from pemp_tpu.parallel import make_mesh

        mesh = make_mesh(devices=jax.local_devices())
        print(f"eval fan-out over {mesh.devices.size} local devices")
    pipe = TTAPipeline(model, variables, config, maps_only=True, mesh=mesh)
    if args.parser == "hg":
        from pemp_tpu.decode.group_hg import HeatmapParserHG

        parser = HeatmapParserHG(config)
    elif args.parser == "hg2":
        from pemp_tpu.decode.group_hg import HeatmapParserHG2

        parser = HeatmapParserHG2()
    else:
        parser = HeatmapParser(config)

    anns_ae, anns_cc, eval_ids, durations = [], [], [], []
    n = len(eval_set) if args.max_images is None else min(args.max_images, len(eval_set))
    nj = config.DATASET.NUM_JOINTS
    window = int(os.environ.get("EVAL_WINDOW", 64))
    batch_size = int(os.environ.get("EVAL_BATCH", 8))

    def iter_outputs():
        for w0 in range(0, n, window):
            idxs = list(range(w0, min(w0 + window, n)))
            images = [np.asarray(eval_set.load_raw(i)[3]) for i in idxs]
            t0 = time.perf_counter()
            outs = pipe.run_batched(images, batch_size=batch_size)
            per_img = (time.perf_counter() - t0) / len(idxs)
            for i, out in zip(idxs, outs):
                durations.append(per_img)
                yield i, out

    for i, out in iter_outputs():
        img_id = int(eval_set.img_ids[i])
        eval_ids.append(img_id)
        det = np.asarray(out["scoremaps"]).transpose(2, 0, 1)  # (J, H, W)
        tags = np.asarray(out["tags"])
        tags = tags.transpose(2, 0, 1, 3)  # (J, H, W, S) TTA tag channels
        ch, cw = out["canvas_size"]
        det = det[:, :ch, :cw]
        tags = tags[:, :ch, :cw, :]

        if args.parser == "hg2":  # HG2 always refines (group_hg.py:480-487)
            grouped, scores = parser.parse(det, tags, adjust=config.TEST.ADJUST)
        else:
            grouped, scores = parser.parse(
                det, tags, adjust=config.TEST.ADJUST,
                refine=config.TEST.REFINE_COMP or True,
            )
        if len(grouped):
            mapped = reverse_affine_map(
                grouped.copy(), out["base_size"], in_size, out["scaling_type"],
                min(config.TEST.SCALE_FACTOR),
            )
            anns_ae.append(gen_ann_format(mapped, img_id))

        persons_cc = cluster_cc(det, tags, nj)
        if len(persons_cc):
            mapped = reverse_affine_map(
                persons_cc.copy(), out["base_size"], in_size, out["scaling_type"],
                min(config.TEST.SCALE_FACTOR),
            )
            anns_cc.append(gen_ann_format(mapped, img_id))
        if (i + 1) % 50 == 0:
            print(f"{i + 1}/{n}")

    ids = np.array(eval_ids)
    eval_writer.eval_coco(eval_set.coco, anns_ae, ids, "AE grouping (HeatmapParser)", "dt_ae.json")
    eval_writer.eval_coco(eval_set.coco, anns_cc, ids, "Correlation clustering on tags", "dt_cc.json")
    eval_writer.eval_speed("kpt_forward", durations)
    eval_writer.close()


if __name__ == "__main__":
    main()
