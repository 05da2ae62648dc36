"""jit-compiled training step with data-parallel sharding.

Equivalent of the reference's make_train_func (reference: src/train.py:115-184)
— forward, graph-reduction edge masking, multi-loss, backward, Adam update —
as one pure function under jit. Batch-dim sharding over a jax Mesh gives
multi-chip data parallelism (gradient psum over ICI inserted by XLA); the
reference is single-GPU only.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from pemp_tpu.losses.factories import mask_node_connections


@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Any
    # running count of skipped (non-finite loss/grad) steps; the TPU analogue
    # of the reference's oom_counter abort guard (reference: src/train.py:276-299)
    fail_count: Any = 0


jax.tree_util.register_dataclass(
    TrainState,
    data_fields=["params", "batch_stats", "opt_state", "step", "fail_count"],
    meta_fields=[],
)


def make_train_step(model, loss_factory, tx, config, with_output=False):
    """Returns train_step(state, batch) -> (state, loss, logging).

    batch: dict with imgs (B,H,W,3), heatmaps [per-scale (B,h,w,J)],
    masks [per-scale (B,h,w)], keypoints (B,P,J,3), factors (B,P,J),
    ae_targets [per-scale (B,P,J,2)].

    with_output=True appends the model's forward output dict (preds/labels/
    masks/graph) to the return tuple, so callers that need train-time
    metrics (the overfit harness, reference: src/test/test_train_loop.py:
    121-216 prints metrics from the training forward) don't have to compile
    a separate eval step.
    """
    node_threshold = config.MODEL.MPN.NODE_THRESHOLD
    include_bordering = config.MODEL.LOSS.INCLUDE_BORDERING_NODES
    backbone_train = not config.TRAIN.FREEZE_BN

    def loss_fn(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        (scoremaps, output), mutated = model.apply(
            variables,
            batch["imgs"],
            keypoints_gt=batch["keypoints"],
            masks=batch["masks"][-1],
            factors=batch["factors"],
            heatmaps=batch.get("heatmaps"),
            train=True,
            backbone_train=backbone_train,
            mutable=["batch_stats"],
        )
        output["masks"]["heatmap"] = batch["masks"]
        output["labels"]["heatmap"] = batch["heatmaps"]
        output["labels"]["tag"] = batch.get("ae_targets")
        output["labels"]["keypoints"] = batch["keypoints"]
        output["labels"]["num_images"] = batch["imgs"].shape[0]

        # graph reduction: edge loss only between predicted/GT-positive nodes
        # (reference: train.py:140-154)
        edge_masks, edge_labels = [], []
        base_mask = output["masks"]["edge"]
        for i in range(len(output["preds"]["node"])):
            pred_node = output["preds"]["node"][i]
            m = mask_node_connections(
                jax.nn.sigmoid(jax.lax.stop_gradient(pred_node)),
                output["graph"]["edge_index"],
                node_threshold,
                output["labels"]["node"],
                include_bordering_nodes=include_bordering,
            )
            edge_labels.append(output["labels"]["edge"])
            edge_masks.append(base_mask * m.astype(jnp.float32))
        output["labels"]["edge"] = edge_labels
        output["masks"]["edge"] = edge_masks

        loss, logging = loss_factory(
            output["preds"], output["labels"], output["masks"], output["graph"]
        )
        return loss, (mutated["batch_stats"], logging, output)

    def train_step(state: TrainState, batch):
        (loss, (new_stats, logging, output)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        import optax

        new_params = optax.apply_updates(state.params, updates)

        # skip the update on non-finite loss/grads and count the failure —
        # the TPU-native form of the reference's catch-OOM-and-continue loop
        # (reference: src/train.py:285-299). The GPU failure mode there is OOM;
        # with static shapes ours is numeric blow-up, so guard on finiteness.
        finite = jnp.isfinite(loss)
        for g in jax.tree_util.tree_leaves(grads):
            finite &= jnp.all(jnp.isfinite(g))

        def _sel(new, old):
            return jnp.where(finite, new, old) if hasattr(new, "shape") else new

        new_state = TrainState(
            params=jax.tree_util.tree_map(_sel, new_params, state.params),
            batch_stats=jax.tree_util.tree_map(_sel, new_stats, state.batch_stats),
            opt_state=jax.tree_util.tree_map(_sel, new_opt_state, state.opt_state),
            step=state.step + 1,
            fail_count=state.fail_count + (1 - finite.astype(jnp.int32)),
        )
        logging = dict(logging)
        logging["skipped"] = 1.0 - finite.astype(jnp.float32)
        if with_output:
            return new_state, loss, logging, output
        return new_state, loss, logging

    return train_step


def make_eval_step(model, loss_factory, config):
    """No-grad validation step with the same loss plumbing
    (reference: train.py:351-495)."""
    node_threshold = config.MODEL.MPN.NODE_THRESHOLD
    include_bordering = config.MODEL.LOSS.INCLUDE_BORDERING_NODES

    def eval_step(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        scoremaps, output = model.apply(
            variables,
            batch["imgs"],
            keypoints_gt=batch["keypoints"],
            masks=batch["masks"][-1],
            factors=batch["factors"],
            heatmaps=batch.get("heatmaps"),
            train=False,
        )
        output["masks"]["heatmap"] = batch["masks"]
        output["labels"]["heatmap"] = batch["heatmaps"]
        output["labels"]["tag"] = batch.get("ae_targets")
        output["labels"]["keypoints"] = batch["keypoints"]
        output["labels"]["num_images"] = batch["imgs"].shape[0]
        edge_masks, edge_labels = [], []
        base_mask = output["masks"]["edge"]
        for i in range(len(output["preds"]["node"])):
            m = mask_node_connections(
                jax.nn.sigmoid(output["preds"]["node"][i]),
                output["graph"]["edge_index"],
                node_threshold,
                output["labels"]["node"],
                include_bordering_nodes=include_bordering,
            )
            edge_labels.append(output["labels"]["edge"])
            edge_masks.append(base_mask * m.astype(jnp.float32))
        output["labels"]["edge"] = edge_labels
        output["masks"]["edge"] = edge_masks
        loss, logging = loss_factory(
            output["preds"], output["labels"], output["masks"], output["graph"]
        )
        return loss, logging, output

    return eval_step
