"""Checkpoint save/load + resume.

Equivalent of the reference's per-epoch torch.save({epoch, model/optimizer/
lr_scheduler state dicts}) checkpointing (reference: src/train.py:497-508, resume
at :256-263) using flax msgpack serialization. LR-schedule state lives in the
optax opt_state (step counts), so one file carries everything.
"""

from __future__ import annotations

import os

import flax.serialization as ser


def save_checkpoint(path, state, epoch: int):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "epoch": epoch,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    with open(path, "wb") as f:
        f.write(ser.to_bytes(payload))


def load_checkpoint(path, state):
    """Restore into a template TrainState; returns (state, epoch)."""
    with open(path, "rb") as f:
        data = f.read()
    template = {
        "epoch": 0,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    payload = ser.from_bytes(template, data)
    from pemp_tpu.train.train_step import TrainState

    new_state = TrainState(
        params=payload["params"],
        batch_stats=payload["batch_stats"],
        opt_state=payload["opt_state"],
        step=payload["step"],
    )
    return new_state, int(payload["epoch"])


def load_params_only(path, params_template, batch_stats_template):
    """Finetune restore: model weights only (reference: train.py:261-263)."""
    with open(path, "rb") as f:
        data = f.read()
    template = {
        "epoch": 0,
        "params": params_template,
        "batch_stats": batch_stats_template,
        "opt_state": None,
        "step": 0,
    }
    payload = ser.from_bytes(template, data)
    return payload["params"], payload["batch_stats"]
