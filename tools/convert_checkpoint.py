#!/usr/bin/env python
"""Convert a PyTorch checkpoint (.pth) to this framework's format.

Implements the reference's three provenance rename schemes
(reference: PoseEstimation.py:14-38, UpperBound.py:40-66) + the mmpose
adapter. Writes a msgpack checkpoint loadable by tools/valid.py via
MODEL.PRETRAINED.

    python tools/convert_checkpoint.py --config hrnet/w48_640 \
        --pth pose_higher_hrnet_w48_640.pth --out pretrained/w48_640.ckpt \
        [--scheme plain|strip1|strip2|strip_prefix2char] [--mmpose]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--pth", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--scheme", default="plain")
    p.add_argument("--mmpose", action="store_true")
    args, options = p.parse_known_args()

    import jax
    import jax.numpy as jnp

    from pemp_tpu.config import get_config, update_config, update_config_command
    from pemp_tpu.models import build_pose_model
    from pemp_tpu.models.hrnet import HRNetSpec
    from pemp_tpu.train import TrainState
    from pemp_tpu.train.checkpoint import save_checkpoint
    from pemp_tpu.train.convert import (
        convert_hrnet_state_dict,
        convert_mmpose_state_dict,
        load_torch_state_dict,
    )

    config = get_config()
    config = update_config(config, f"configs/{args.config}.yaml")
    config = update_config_command(config, options)

    sd = load_torch_state_dict(args.pth, args.scheme)
    spec = HRNetSpec.from_config(config)
    if args.mmpose or config.MODEL.KP == "mmpose_hrnet":
        bb_params, bb_stats = convert_mmpose_state_dict(sd, spec)
    else:
        bb_params, bb_stats = convert_hrnet_state_dict(sd, spec)

    # init the composite to get the full parameter template, then graft the
    # backbone weights in (feature_gather + MPN stay at init)
    model = build_pose_model(config)
    in_size = config.DATASET.INPUT_SIZE
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, in_size, in_size, 3)), train=False
    )
    import flax

    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables["batch_stats"])
    params["backbone"] = bb_params
    stats["backbone"] = bb_stats

    state = TrainState(params=params, batch_stats=stats, opt_state=None, step=0)
    save_checkpoint(args.out, state, epoch=0)
    n = sum(x.size for x in jax.tree_util.tree_leaves(bb_params))
    print(f"converted {n / 1e6:.1f}M backbone params -> {args.out}")


if __name__ == "__main__":
    main()
