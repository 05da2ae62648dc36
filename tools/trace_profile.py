#!/usr/bin/env python
"""Per-op TPU profile of the bench pipeline via jax.profiler + xprof.

Captures a trace of a few steady-state bench iterations and prints the
top-N HLO ops by self time (device), so optimization targets are measured
rather than guessed. Uses tensorboard_plugin_profile's converter on the
captured .xplane.pb — no TensorBoard server needed.

    python tools/trace_profile.py [--top 40] [--batch 8]

Env knobs honored from bench.py (BENCH_STEPS, BENCH_NO_DECODE, ...).
"""

from __future__ import annotations

import argparse
import csv
import glob
import io
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# must be set before jax import to share bench.py's persistent compilation
# cache (bench sets it too, but only when imported before jax)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--logdir", default="tmp/trace")
    ap.add_argument(
        "--train", action="store_true",
        help="trace the flagship TRAIN step (fwd+bwd+Adam) instead of the "
        "eval bench pipeline (VERDICT r3 #2: the training path had no "
        "perf measurement at all)",
    )
    ap.add_argument(
        "--no-xprof", action="store_true",
        help="skip trace capture + per-op breakdown; just time the step "
        "(also what the CPU smoke test runs — xprof has no device rows "
        "on the CPU backend)",
    )
    ap.add_argument("--opts", nargs="*", default=[],
                    help="dotted-key config overrides, e.g. DATASET.INPUT_SIZE 64")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    if args.train:
        from pemp_tpu.config import get_config, update_config
        from pemp_tpu.data.synthetic import make_batch
        from pemp_tpu.losses import dispatch_loss_func
        from pemp_tpu.models import build_pose_model
        from pemp_tpu.train import (
            TrainState, build_optimizer, make_train_step,
        )

        cfg = get_config()
        cfg = update_config(
            cfg, "configs/hybrid_class_agnostic_end2end/model_58_4.yaml"
        )
        cfg.defrost()
        cfg.TPU.NODES_PER_TYPE = 40
        cfg.freeze()
        if args.opts:
            from pemp_tpu.config import update_config_command

            cfg = update_config_command(cfg, args.opts)
        in_size = cfg.DATASET.INPUT_SIZE
        out_sizes = tuple(cfg.DATASET.OUTPUT_SIZE)
        batch = make_batch(rng, args.batch, in_size, out_sizes,
                           cfg.DATASET.NUM_JOINTS)
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        model = build_pose_model(cfg, dtype=jnp.bfloat16)
        variables = model.init(
            jax.random.PRNGKey(0), batch["imgs"][:1],
            keypoints_gt=batch["keypoints"][:1],
            masks=batch["masks"][-1][:1], factors=batch["factors"][:1],
            train=False,
        )
        loss_factory = dispatch_loss_func(cfg)
        tx, _ = build_optimizer(cfg, variables["params"], steps_per_epoch=10**6)
        step = jax.jit(make_train_step(model, loss_factory, tx, cfg))
        state = TrainState(
            params=variables["params"], batch_stats=variables["batch_stats"],
            opt_state=tx.init(variables["params"]), step=jnp.int32(0),
        )

        import time

        t0 = time.perf_counter()
        state, loss, _ = step(state, batch)
        jax.block_until_ready(loss)
        compile_s = time.perf_counter() - t0
        state, loss, _ = step(state, batch)
        jax.block_until_ready(loss)
        # NOTE (r5): on the remote axon platform the first ~10 post-compile
        # steps absorb deferred executable upload — warm a full round before
        # timing, and time OUTSIDE the profiler (tracing adds ~100x wall
        # overhead per step over the tunnel; r4's 34.7s/step number was that
        # artifact — untraced steady state is 282 ms/step)
        for _ in range(10):
            state, loss, _ = step(state, batch)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, loss, _ = step(state, batch)
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0
        if not args.no_xprof:
            os.makedirs(args.logdir, exist_ok=True)
            with jax.profiler.trace(args.logdir):
                for _ in range(args.iters):
                    state, loss, _ = step(state, batch)
                jax.block_until_ready(loss)
        print(
            f"train step: {dt/args.iters*1e3:.1f} ms/step, "
            f"{args.batch*args.iters/dt:.2f} img/s "
            f"(batch {args.batch}, input {in_size}, compile {compile_s:.0f}s, "
            f"loss {float(loss):.4f})"
        )
    else:
        from bench import build_pipeline

        fn, imgs = build_pipeline(args.batch)
        data = jnp.asarray(rng.rand(*imgs.shape), jnp.float32)
        # warmup / compile
        jax.block_until_ready(fn(data))
        jax.block_until_ready(fn(data))

        os.makedirs(args.logdir, exist_ok=True)
        with jax.profiler.trace(args.logdir):
            for _ in range(args.iters):
                out = fn(data)
            jax.block_until_ready(out)

    if args.no_xprof:
        return 0
    pbs = sorted(glob.glob(f"{args.logdir}/**/*.xplane.pb", recursive=True),
                 key=os.path.getmtime)
    if not pbs:
        print("no xplane.pb captured", file=sys.stderr)
        return 1
    pb = pbs[-1]
    with open(pb, "rb") as f:
        raw = f.read()

    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:  # older env
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([pb], "framework_op_stats", {})
    tab = json.loads(data)
    tab = tab[0] if isinstance(tab, list) else tab
    cols = [c["id"] for c in tab["cols"]]
    rows = [dict(zip(cols, [c.get("v") for c in r["c"]])) for r in tab["rows"]]
    dev = [
        r for r in rows
        if str(r.get("host_or_device", "")).lower().startswith("d")
    ]
    if not dev:
        print("no device rows", file=sys.stderr)
        return 1
    dev.sort(key=lambda r: -(r.get("total_self_time") or 0))
    total = sum(r.get("total_self_time") or 0 for r in dev)
    print(f"total device self time: {total/1e3:.2f} ms over {args.iters} "
          f"iters ({total/1e3/args.iters:.2f} ms/iter)")
    print(f"{'self_us':>12} {'%':>5} {'n':>6}  type / op")
    for r in dev[: args.top]:
        t = r.get("total_self_time") or 0
        n = int(r.get("occurrences") or 0)
        print(
            f"{t:12.0f} {100*t/max(total,1e-9):5.1f} {n:6d}  "
            f"{str(r.get('type'))[:22]:22s} {str(r.get('operation'))[:95]}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
