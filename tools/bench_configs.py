#!/usr/bin/env python
"""Throughput for the five BASELINE.json eval configurations.

BASELINE.md lists five reproduction configs; the driver's bench.py measures
only #3 (w48-640 single-scale). This tool times the other four on synthetic
images through the real eval pipelines (TTAPipeline device batching + the
same decode each config's eval entry uses), printing an img/s table and the
cold-compile seconds per config (VERDICT r3 #4/#8).

    python tools/bench_configs.py [--configs w32_512_ae ...] [--images 32]

Modes:
  w48_640_ss    HigherHRNet-w48 640, single-scale, MPN decode (= bench.py)
  w48_640_ms    w48 640, multi-scale [2,1,0.5] + flip (README 71.0 setting,
                reference: src/Models/PoseEstimation/PoseEstimation.py:147-253)
  w32_512_ae    HRNet-w32 512 + AE grouping (valid_hr path,
                reference: src/valid_hr.py:88-172)
  hourglass_512 Hourglass 512 + AE grouping
                (reference: src/valid_hr.py + PoseEstimationHourglass)
  crowdpose_ms  mmpose-HRNet CrowdPose, multi-scale + flip
                (reference: README CrowdPose 69.0 setting)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

import numpy as np

MODES = {
    "w48_640_ss": dict(
        yaml="configs/hrnet/w48_640.yaml", scales=[1.0], flip=False,
        ae=False, img=(640, 427),
    ),
    "w48_640_ms": dict(
        yaml="configs/hrnet/w48_640.yaml", scales=[2.0, 1.0, 0.5], flip=True,
        ae=False, img=(640, 427),
    ),
    "w32_512_ae": dict(
        yaml="configs/hrnet/w32_512.yaml", scales=[1.0], flip=True,
        ae=True, img=(640, 427),
    ),
    "hourglass_512": dict(
        yaml="configs/hourglass/hg_512.yaml", scales=[1.0], flip=False,
        ae=True, img=(640, 427),
    ),
    "crowdpose_ms": dict(
        yaml="configs/crowdpose/model_81_1_2.yaml", scales=[2.0, 1.0, 0.5],
        flip=True, ae=False, img=(640, 427),
    ),
}


def bench_mode(name, spec, n_images, batch_size, opts=()):
    import jax
    import jax.numpy as jnp  # noqa: F401

    from pemp_tpu.config import get_config, update_config, update_config_command

    cfg = get_config()
    cfg = update_config(cfg, spec["yaml"])
    cfg.defrost()
    cfg.TEST.SCALE_FACTOR = list(spec["scales"])
    cfg.TEST.FLIP_TEST = bool(spec["flip"])
    cfg.TPU.COLLECT_AUX = False
    cfg.freeze()
    if opts:
        # dotted-key overrides, applied last (tiny-shape CPU smoke tests
        # shrink the model this way; same surface as tools/valid.py)
        cfg = update_config_command(cfg, opts)

    rng = np.random.RandomState(0)
    w, h = spec.get("img", (640, 427))
    images = [(rng.rand(h, w, 3) * 255).astype(np.uint8) for _ in range(n_images)]

    if spec["ae"]:
        from pemp_tpu.decode.ae_grouping import HeatmapParser
        from pemp_tpu.models.ae_group import build_ae_group_model
        from pemp_tpu.tta import TTAPipeline

        model = build_ae_group_model(cfg)
        ex = jnp.zeros(
            (1, cfg.DATASET.INPUT_SIZE, cfg.DATASET.INPUT_SIZE, 3), jnp.float32
        )
        variables = model.init(jax.random.PRNGKey(0), ex, train=False)
        pipe = TTAPipeline(model, variables, cfg, maps_only=True)
        parser = HeatmapParser(cfg)

        def run(batch):
            # mirrors tools/valid_hr.py's per-image host grouping exactly
            outs = pipe.run_batched(batch, batch_size=batch_size)
            for o in outs:
                det = np.asarray(o["scoremaps"]).transpose(2, 0, 1)
                tags = np.asarray(o["tags"]).transpose(2, 0, 1, 3)
                ch, cw = o["canvas_size"]
                det = det[:, :ch, :cw]
                tags = tags[:, :ch, :cw, :]
                parser.parse(det, tags, adjust=True, refine=True)
    else:
        from pemp_tpu.models import build_pose_model
        from pemp_tpu.tta import TTAPipeline

        model = build_pose_model(cfg)
        ex = jnp.zeros(
            (1, cfg.DATASET.INPUT_SIZE, cfg.DATASET.INPUT_SIZE, 3), jnp.float32
        )
        variables = model.init(jax.random.PRNGKey(0), ex, train=False)
        pipe = TTAPipeline(model, variables, cfg, with_decode=True)

        def run(batch):
            pipe.run_batched(batch, batch_size=batch_size)

    # cold compile + warmup on one batch
    t0 = time.perf_counter()
    run(images[:batch_size])
    compile_s = time.perf_counter() - t0
    run(images[:batch_size])

    t0 = time.perf_counter()
    run(images)
    dt = time.perf_counter() - t0
    return dict(
        mode=name, images_per_sec=round(n_images / dt, 2),
        compile_s=round(compile_s, 1), n_images=n_images,
        batch_size=batch_size, scales=spec["scales"], flip=spec["flip"],
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", nargs="*", default=list(MODES))
    p.add_argument("--images", type=int, default=32)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--opts", nargs="*", default=[],
                   help="dotted-key config overrides, e.g. DATASET.INPUT_SIZE 64")
    args = p.parse_args()
    rows = []
    for name in args.configs:
        spec = MODES[name]
        try:
            row = bench_mode(name, spec, args.images, args.batch, args.opts)
        except Exception as e:  # noqa: BLE001 — report per-config failures
            row = dict(mode=name, error=f"{type(e).__name__}: {e}")
        rows.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
