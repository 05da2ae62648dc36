#!/usr/bin/env python
"""Overfit-one-batch sanity check.

reference: src/test/test_train_loop.py:121-216 — train on a single fixed
batch printing edge/node/class precision/recall; the 'can it learn at all'
harness.

    python tools/overfit.py --config test/tiny --iters 200 [KEY VALUE ...]
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
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--print-freq", type=int, default=20)
    args, options = p.parse_known_args()

    import jax
    import jax.numpy as jnp

    from pemp_tpu.config import get_config, update_config, update_config_command
    from pemp_tpu.data.synthetic import make_batch
    from pemp_tpu.eval import calc_metrics
    from pemp_tpu.losses import dispatch_loss_func
    from pemp_tpu.models import build_pose_model
    from pemp_tpu.train import TrainState, build_optimizer, make_eval_step, make_train_step

    config = get_config()
    config = update_config(config, f"configs/{args.config}.yaml")
    config = update_config_command(config, options)

    rng = np.random.RandomState(0)
    in_size = config.DATASET.INPUT_SIZE
    out_sizes = tuple(config.DATASET.OUTPUT_SIZE)
    batch = make_batch(rng, config.TRAIN.BATCH_SIZE, in_size, out_sizes,
                       config.DATASET.NUM_JOINTS)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    model = build_pose_model(config)
    variables = model.init(
        jax.random.PRNGKey(0), batch["imgs"][:1],
        keypoints_gt=batch["keypoints"][:1], masks=batch["masks"][-1][:1],
        factors=batch["factors"][:1], train=False,
    )
    loss_factory = dispatch_loss_func(config)
    # keep LR-step boundaries within int32 (optax schedule counts in steps)
    tx, _ = build_optimizer(config, variables["params"], steps_per_epoch=10**6)
    step_fn = jax.jit(make_train_step(model, loss_factory, tx, config))
    eval_fn = jax.jit(make_eval_step(model, loss_factory, config))

    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]), step=jnp.int32(0),
    )
    for i in range(args.iters):
        state, loss, logging = step_fn(state, batch)
        if i % args.print_freq == 0 or i == args.iters - 1:
            _, _, output = eval_fn(state.params, state.batch_stats, batch)
            edge_pred = (np.asarray(jax.nn.sigmoid(output["preds"]["edge"][-1])) > 0.5)
            node_pred = (np.asarray(jax.nn.sigmoid(output["preds"]["node"][-1])) > 0.5)
            em = calc_metrics(
                edge_pred, np.asarray(output["labels"]["edge"][-1]),
                np.asarray(output["masks"]["edge"][-1]),
            ) or {}
            nm = calc_metrics(
                node_pred, np.asarray(output["labels"]["node"]),
                np.asarray(output["masks"]["node"]),
            ) or {}
            print(
                f"iter {i}: loss {float(loss):.5f} | "
                f"edge prec {em.get('prec', 0):.3f} rec {em.get('rec', 0):.3f} | "
                f"node prec {nm.get('prec', 0):.3f} rec {nm.get('rec', 0):.3f}"
            )


if __name__ == "__main__":
    main()
