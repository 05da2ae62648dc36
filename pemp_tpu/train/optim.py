"""Optimizer construction: split-LR Adam with backbone freezing.

Mirrors the reference's optimizer setup (reference: src/train.py:229-253):
Adam with separate parameter groups (MPN+feature_gather at TRAIN.LR, backbone
at TRAIN.KP_LR), MultiStepLR decay at TRAIN.LR_STEP epochs, and freeze modes
complete/stem/nothing/from_scratch (reference: PoseEstimation.py:113-139) —
expressed as optax.multi_transform partitions instead of requires_grad flags.
"""

from __future__ import annotations

import jax
import optax


_STEM_PREFIXES = ("conv1", "bn1", "conv2", "bn2", "layer1_")


def param_partition(params, freeze_mode: str, end_to_end: bool):
    """Label each parameter: 'mpn' (head lr), 'backbone' (kp lr), 'frozen'."""

    def label(path):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        top = names[0] if names else ""
        in_backbone = top == "backbone"
        if not in_backbone:
            return "mpn"
        if freeze_mode == "complete" or not end_to_end:
            return "frozen"
        if freeze_mode == "stem":
            sub = names[1] if len(names) > 1 else ""
            if any(sub == p or sub.startswith(p) for p in _STEM_PREFIXES):
                return "frozen"
            return "backbone"
        # "nothing" / "from_scratch": everything trains
        return "backbone"

    return jax.tree_util.tree_map_with_path(lambda p, _: label(p), params)


def multistep_schedule(base_lr: float, lr_steps, lr_factor: float, steps_per_epoch: int):
    """MultiStepLR: multiply by lr_factor at each epoch boundary in lr_steps."""
    boundaries = {int(e) * steps_per_epoch: lr_factor for e in lr_steps}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def build_optimizer(config, params, steps_per_epoch: int = 1000):
    """Split-LR Adam + MultiStepLR + freezing; returns (tx, labels)."""
    labels = param_partition(
        params, config.TRAIN.KP_FREEZE_MODE, config.TRAIN.END_TO_END
    )
    lr_mpn = multistep_schedule(
        config.TRAIN.LR, config.TRAIN.LR_STEP, config.TRAIN.LR_FACTOR, steps_per_epoch
    )
    lr_kp = multistep_schedule(
        config.TRAIN.KP_LR, config.TRAIN.LR_STEP, config.TRAIN.LR_FACTOR, steps_per_epoch
    )

    def adamw(lr, wd):
        if wd and wd > 0:
            return optax.adamw(lr, weight_decay=wd)
        return optax.adam(lr)

    tx = optax.multi_transform(
        {
            "mpn": adamw(lr_mpn, config.TRAIN.W_DECAY),
            "backbone": adamw(lr_kp, config.TRAIN.KP_W_DECAY),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    return tx, labels
