#!/usr/bin/env python
"""Training entry point.

Usage (mirrors the reference: src/train.py — argv[1] is the experiment name):

    python tools/train.py hybrid_class_agnostic_end2end/model_58_4 \
        [--synthetic] [--epochs N] [--steps-per-epoch N] [KEY VALUE ...]

Builds the composite model, split-LR Adam with freeze modes, data-parallel
sharded train step over all local devices, per-epoch validation with the same
loss plumbing, and per-epoch checkpoints (+ LR-step snapshots,
reference: src/train.py:497-508). ``--synthetic`` trains on generated scenes
when no COCO data is on disk.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Train the pose-estimation MPN")
    p.add_argument("config", help="experiment config name under configs/ (no .yaml)")
    p.add_argument("--synthetic", action="store_true", help="train on synthetic scenes")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    args, options = p.parse_known_args()
    args.options = options
    return args


def make_synthetic_loader(config, steps: int, seed: int = 0):
    from pemp_tpu.data.synthetic import make_batch

    rng = np.random.RandomState(seed)
    in_size = config.DATASET.INPUT_SIZE
    out_sizes = tuple(config.DATASET.OUTPUT_SIZE)
    bs = config.TRAIN.BATCH_SIZE

    def gen():
        for _ in range(steps):
            yield make_batch(rng, bs, in_size, out_sizes, config.DATASET.NUM_JOINTS)

    return gen


def make_coco_loaders(config):
    """Train + per-epoch validation loaders (reference: train.py:20-102
    create_train_validation_split)."""
    from pemp_tpu.data import (
        CocoKeypoints,
        CrowdPoseKeypoints,
        DataLoader,
        HeatmapGenerator,
        JointsGenerator,
        transforms_hr_train,
    )

    out_sizes = list(config.DATASET.OUTPUT_SIZE)
    nj = config.DATASET.NUM_JOINTS
    mp = config.DATASET.MAX_NUM_PEOPLE
    hm = [HeatmapGenerator(s, nj) for s in out_sizes]
    jg = [JointsGenerator(mp, nj, s, True) for s in out_sizes]
    tf = transforms_hr_train(config)
    mini = "mini" in config.TRAIN.SPLIT
    val_loader = None
    if config.DATASET.DATASET == "crowd_pose":
        train_set = CrowdPoseKeypoints(
            config.DATASET.ROOT, mini=mini, mode="trainval",
            transforms=tf, heatmap_generator=hm, joint_generator=jg,
        )
    else:
        train_set = CocoKeypoints(
            config.DATASET.ROOT, mini=mini, mode="train",
            transforms=tf, heatmap_generator=hm, joint_generator=jg,
            num_joints=nj,
        )
        try:
            val_set = CocoKeypoints(
                config.DATASET.ROOT, mini=True, mode="val",
                transforms=tf, heatmap_generator=hm, joint_generator=jg,
                num_joints=nj,
            )
            val_loader = DataLoader(
                val_set, config.TRAIN.BATCH_SIZE, shuffle=False,
                num_workers=config.WORKERS,
            )
        except FileNotFoundError:
            val_loader = None
    loader = DataLoader(
        train_set, config.TRAIN.BATCH_SIZE, shuffle=True, num_workers=config.WORKERS
    )
    return loader, val_loader


def main():
    args = parse_args()

    from pemp_tpu.parallel import maybe_init_distributed

    maybe_init_distributed()  # no-op unless launched by a cluster manager

    import jax
    import jax.numpy as jnp

    from pemp_tpu.config import get_config, update_config, update_config_command
    from pemp_tpu.eval import calc_metrics
    from pemp_tpu.losses import dispatch_loss_func
    from pemp_tpu.models import build_pose_model
    from pemp_tpu.parallel import make_mesh, replicate, shard_batch, shard_train_step
    from pemp_tpu.train import TrainState, build_optimizer, make_train_step
    from pemp_tpu.train.checkpoint import load_checkpoint, load_params_only, save_checkpoint
    from pemp_tpu.utils import Logger

    config = get_config()
    config = update_config(config, f"configs/{args.config}.yaml")
    config = update_config_command(config, args.options)
    np.random.seed(0)

    log_dir = config.LOG_DIR or f"log/{args.config.replace('/', '_')}"
    os.makedirs(log_dir, exist_ok=True)
    logger = Logger(log_dir=log_dir)

    print("Load model")
    model = build_pose_model(config)
    bs = config.TRAIN.BATCH_SIZE
    in_size = config.DATASET.INPUT_SIZE
    sample = jnp.zeros((1, in_size, in_size, 3))
    variables = model.init(
        jax.random.PRNGKey(0),
        sample,
        keypoints_gt=jnp.zeros((1, config.DATASET.MAX_NUM_PEOPLE, config.DATASET.NUM_JOINTS, 3)),
        masks=jnp.ones((1, config.DATASET.OUTPUT_SIZE[-1], config.DATASET.OUTPUT_SIZE[-1])),
        factors=jnp.ones((1, config.DATASET.MAX_NUM_PEOPLE, config.DATASET.NUM_JOINTS)),
        train=False,
    )
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
    print(f"model params: {n_params / 1e6:.1f}M")

    steps_per_epoch = args.steps_per_epoch or 1000
    loss_factory = dispatch_loss_func(config)
    tx, labels = build_optimizer(config, variables["params"], steps_per_epoch)
    train_step = make_train_step(model, loss_factory, tx, config)

    mesh = make_mesh()
    print(f"mesh: {mesh.devices.size} device(s) on axis 'data'")
    step_fn = shard_train_step(train_step, mesh)

    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.int32(0),
        fail_count=jnp.int32(0),
    )
    start_epoch = config.TRAIN.START_EPOCH
    ckpt_path = config.MODEL.PRETRAINED or os.path.join(log_dir, "pose_estimation.ckpt")
    if config.TRAIN.CONTINUE:
        if config.TRAIN.FINETUNE:
            params, stats = load_params_only(
                config.TRAIN.CONTINUE, state.params, state.batch_stats
            )
            state = TrainState(params, stats, state.opt_state, state.step)
        else:
            state, start_epoch = load_checkpoint(config.TRAIN.CONTINUE, state)
    state = replicate(state, mesh)

    print("Load dataset")
    val_loader = None
    if args.synthetic:
        loader_fn = make_synthetic_loader(config, steps_per_epoch)
    else:
        loader, val_loader = make_coco_loaders(config)
        steps_per_epoch = len(loader)
        loader_fn = lambda: iter(loader)  # noqa: E731

    from pemp_tpu.train import make_eval_step

    eval_step = jax.jit(make_eval_step(model, loss_factory, config))

    end_epoch = args.epochs if args.epochs is not None else config.TRAIN.END_EPOCH
    print("#####Begin Training#####")
    # abort after repeated failed (skipped non-finite) steps, mirroring the
    # reference's oom_counter >= 5 stop (reference: src/train.py:276-299)
    aborted = False
    for epoch in range(start_epoch, end_epoch):
        if aborted:
            break
        t_epoch = time.time()
        for i, batch in enumerate(loader_fn()):
            it = i + steps_per_epoch * epoch
            batch = shard_batch(
                jax.tree_util.tree_map(jnp.asarray, batch), mesh
            )
            state, loss, logging = step_fn(state, batch)
            if i % config.PRINT_FREQ == 0:
                logging = {k: float(v) for k, v in logging.items()}
                loss = float(loss)
                fail_count = int(np.asarray(state.fail_count).max())
                logger.log_loss(loss, "Loss/train", it)
                logger.log_vars("Loss/parts", it, **logging)
                parts = " ".join(f"{k}:{v:.4f}" for k, v in logging.items())
                print(f"Iter: {it}, loss: {loss:.6f} | {parts}")
                if fail_count >= 5:
                    print(
                        "Stopping training due to large amount of failed "
                        f"(non-finite) steps: {fail_count}"
                    )
                    aborted = True
                    break
        save_checkpoint(ckpt_path, jax.device_get(state), epoch)
        if epoch + 1 in list(config.TRAIN.LR_STEP):
            save_checkpoint(f"{ckpt_path}.epoch{epoch}", jax.device_get(state), epoch)
        # per-epoch no-grad validation with the same loss plumbing
        # (reference: train.py:351-495)
        if val_loader is not None:
            host_state = jax.device_get(state)
            val_losses = []
            for vb in val_loader:
                vb = jax.tree_util.tree_map(jnp.asarray, vb)
                vloss, vlog, _ = eval_step(host_state.params, host_state.batch_stats, vb)
                val_losses.append(float(vloss))
            if val_losses:
                logger.log_loss(float(np.mean(val_losses)), "Loss/valid", epoch)
                print(f"epoch {epoch} val loss: {np.mean(val_losses):.5f}")
        print(f"epoch {epoch} done in {time.time() - t_epoch:.1f}s -> {ckpt_path}")
    logger.close()


if __name__ == "__main__":
    main()
