"""Overfit-to-convergence: the whole loss/matching/masking stack must LEARN.

reference: src/test/test_train_loop.py:121-216 — the reference's sanity
harness trains on one fixed batch for 10k iterations and prints edge/node/
class precision/recall, expecting them to approach 1.0. This test pins that
contract: on one fixed synthetic batch a small end-to-end model must drive
edge/node precision/recall and class accuracy above hard thresholds within
a bounded iteration budget (VERDICT r3 #5).

Deliberately NOT just "loss decreases" (tests/test_pose_model.py covers
that): these metrics fail if label construction (method 6 matching), loss
masking, graph-reduction edge masking, or the head plumbing silently break
in a way that still lets the raw loss shrink.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pemp_tpu.config import get_config, update_config
from pemp_tpu.data.synthetic import make_batch
from pemp_tpu.eval import calc_metrics
from pemp_tpu.losses import dispatch_loss_func
from pemp_tpu.models.pose_estimation import build_pose_model
from pemp_tpu.train import (
    TrainState,
    build_optimizer,
    make_train_step,
)

pytestmark = pytest.mark.slow  # heavy compile + a few hundred train iters

MAX_ITERS = 400
CHECK_EVERY = 25
# The reference harness reaches ~1.0 after 10k iters; with a bounded budget
# on a tiny model we pin 0.9 — far above chance (edge positives are ~2-10%
# of valid edges, so prec/rec 0.9 cannot be reached by collapsed predictors).
THRESH = 0.9


def _config():
    cfg = get_config()
    cfg = update_config(cfg, "configs/hybrid_class_agnostic_end2end/model_58_4.yaml")
    cfg.defrost()
    # CPU-sized: 1-stack hourglass, short MPN, small padded graph
    cfg.MODEL.KP = "hourglass"
    cfg.MODEL.HG.NSTACK = 1
    cfg.MODEL.HG.INPUT_DIM = 32
    cfg.MODEL.HG.OUTPUT_DIM = 48
    cfg.MODEL.KP_OUTPUT_DIM = 32
    cfg.MODEL.MPN.STEPS = 3
    cfg.MODEL.MPN.NODE_INPUT_DIM = 64
    cfg.TPU.NODES_PER_TYPE = 6
    cfg.TPU.KNN_K = 8
    cfg.TRAIN.END_TO_END = True
    cfg.TRAIN.KP_FREEZE_MODE = "nothing"
    # greedy matcher: exact on the synthetic fixture's conflict-light OKS
    # matrices and ~25x faster per step on 1-vCPU XLA (the auction's serial
    # bid wars dominate the step there; auction-vs-Hungarian parity has its
    # own oracle tests in test_ops_matching.py)
    cfg.TPU.MATCHER = "greedy"
    cfg.MODEL.LOSS.NAME = ["edge", "node", "class"]
    cfg.DATASET.INPUT_SIZE = 64
    cfg.DATASET.OUTPUT_SIZE = [16, 16]
    cfg.freeze()
    return cfg


def _metrics(output):
    edge_pred = np.asarray(jax.nn.sigmoid(output["preds"]["edge"][-1])) > 0.5
    node_pred = np.asarray(jax.nn.sigmoid(output["preds"]["node"][-1])) > 0.5
    class_pred = np.asarray(output["preds"]["class"][-1]).argmax(-1)
    em = calc_metrics(
        edge_pred,
        np.asarray(output["labels"]["edge"][-1]),
        np.asarray(output["masks"]["edge"][-1]),
    )
    nm = calc_metrics(
        node_pred,
        np.asarray(output["labels"]["node"]),
        np.asarray(output["masks"]["node"]),
    )
    # class accuracy only over nodes that are true positives (the reference
    # computes class metrics on the matched subset, test_train_loop.py:196)
    node_mask = np.asarray(output["masks"]["node"]) == 1.0
    pos = node_mask & (np.asarray(output["labels"]["node"]) == 1.0)
    class_labels = np.asarray(output["labels"]["class"])
    class_acc = (
        float(np.mean(class_pred[pos] == class_labels[pos])) if pos.any() else 0.0
    )
    return em, nm, class_acc


def test_overfit_one_batch_converges():
    """Wall time on a 1-vCPU XLA-CPU box: ~3 min cold (compile ~1 min,
    ~0.3s/iter; measured 2026-08 — VERDICT r4 #6 budget is <5 min)."""
    cfg = _config()
    rng = np.random.RandomState(7)
    # Large people: OKS matching tolerance scales with person area, and at
    # the default scale_range on a 16px output grid the matchable radius of
    # the face joints drops below one pixel (see data/synthetic.py docstring)
    batch = make_batch(
        rng,
        batch_size=2,
        input_size=64,
        output_sizes=(16, 16),
        n_people=2,
        scale_range=(0.55, 0.8),
    )
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    model = build_pose_model(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["imgs"][:1],
        keypoints_gt=batch["keypoints"][:1],
        masks=batch["masks"][-1][:1],
        factors=batch["factors"][:1],
        train=False,
    )
    loss_factory = dispatch_loss_func(cfg)
    tx, _ = build_optimizer(cfg, variables["params"], steps_per_epoch=10**6)
    # ONE compiled function for train + metrics: the reference harness also
    # reads its metrics off the training forward (test_train_loop.py:196);
    # a separate eval step would double the dominant cost here (XLA-CPU
    # compile on a 1-vCPU box)
    step_fn = jax.jit(make_train_step(model, loss_factory, tx, cfg, with_output=True))

    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.int32(0),
        fail_count=jnp.int32(0),  # concrete dtype: avoids a re-trace at iter 2
    )

    # positive-label probe: the convergence assertion is vacuous unless the
    # fixed batch actually contains positive edge/node labels under the mask
    state, _, _, out0 = step_fn(state, batch)
    edge_mask = np.asarray(out0["masks"]["edge"][-1]) == 1.0
    node_mask = np.asarray(out0["masks"]["node"]) == 1.0
    n_edge_pos = int((np.asarray(out0["labels"]["edge"][-1]) == 1.0)[edge_mask].sum())
    n_node_pos = int((np.asarray(out0["labels"]["node"]) == 1.0)[node_mask].sum())
    assert n_edge_pos >= 10, f"fixture has too few positive edges: {n_edge_pos}"
    assert n_node_pos >= 10, f"fixture has too few positive nodes: {n_node_pos}"

    history = []
    for i in range(1, MAX_ITERS + 1):
        state, loss, _, output = step_fn(state, batch)
        if i % CHECK_EVERY == 0:
            em, nm, class_acc = _metrics(output)
            em, nm = em or {}, nm or {}
            history.append(
                (
                    i,
                    round(float(loss), 4),
                    round(em.get("prec", 0.0), 3),
                    round(em.get("rec", 0.0), 3),
                    round(nm.get("prec", 0.0), 3),
                    round(nm.get("rec", 0.0), 3),
                    round(class_acc, 3),
                )
            )
            vals = (
                em.get("prec", 0.0),
                em.get("rec", 0.0),
                nm.get("prec", 0.0),
                nm.get("rec", 0.0),
                class_acc,
            )
            if all(v >= THRESH for v in vals):
                return  # converged

    raise AssertionError(
        "did not reach edge/node prec+rec and class acc >= "
        f"{THRESH} within {MAX_ITERS} iters; "
        "(iter, loss, e_prec, e_rec, n_prec, n_rec, cls_acc) = "
        f"{history}"
    )
