import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pemp_tpu.config import get_config, update_config
from pemp_tpu.data.synthetic import make_batch
from pemp_tpu.losses import ClassMultiLossFactory
from pemp_tpu.models.pose_estimation import build_pose_model
from pemp_tpu.train import TrainState, build_optimizer, make_train_step

pytestmark = pytest.mark.slow  # heavy compiles; excluded by -m 'not slow'


def small_config():
    cfg = get_config()
    cfg = update_config(cfg, "configs/hybrid_class_agnostic_end2end/model_58_4.yaml")
    cfg.defrost()
    # shrink for CPU tests: hourglass backbone, small graph
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
    cfg.MODEL.LOSS.NAME = ["edge", "node", "class"]
    cfg.DATASET.INPUT_SIZE = 64
    cfg.DATASET.OUTPUT_SIZE = [16, 16]
    cfg.freeze()
    return cfg


@pytest.fixture(scope="module")
def model_and_batch():
    cfg = small_config()
    model = build_pose_model(cfg)
    rng = np.random.RandomState(0)
    batch = make_batch(rng, batch_size=2, input_size=64, output_sizes=(16, 16))
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["imgs"],
        keypoints_gt=batch["keypoints"],
        masks=batch["masks"][-1],
        factors=batch["factors"],
        train=False,
    )
    return cfg, model, variables, batch


def test_forward_output_contract(model_and_batch):
    cfg, model, variables, batch = model_and_batch
    scoremaps, output = model.apply(
        model_and_batch[2],
        batch["imgs"],
        keypoints_gt=batch["keypoints"],
        masks=batch["masks"][-1],
        factors=batch["factors"],
        train=False,
    )
    n = 17 * 6 * 2  # J*K*B
    assert scoremaps.shape == (2, 16, 16, 17)
    assert output["graph"]["nodes"].shape == (n, 3)
    assert output["labels"]["node"].shape == (n,)
    assert output["preds"]["node"][-1].shape == (n,)
    assert output["preds"]["class"][-1].shape == (n, 17)
    assert output["preds"]["edge"][-1].shape[0] == output["graph"]["edge_index"].shape[1]
    assert bool(jnp.isfinite(output["preds"]["edge"][-1]).all())


def test_train_step_decreases_loss(model_and_batch):
    """Overfit one batch — the reference's test_train_loop smoke check
    (reference: src/test/test_train_loop.py:121-216), 30 iterations."""
    cfg, model, variables, batch = model_and_batch
    loss_factory = ClassMultiLossFactory(cfg)
    tx, _ = build_optimizer(cfg, variables["params"], steps_per_epoch=10**6)
    step_fn = jax.jit(make_train_step(model, loss_factory, tx, cfg))

    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.int32(0),
    )
    losses = []
    for _ in range(30):
        state, loss, logging = step_fn(state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses[::5]


def test_nonfinite_step_is_skipped_and_counted(model_and_batch):
    """NaN batch -> no parameter update, fail_count increments (the TPU
    analogue of the reference's OOM-skip loop, src/train.py:285-299)."""
    cfg, model, variables, batch = model_and_batch
    loss_factory = ClassMultiLossFactory(cfg)
    tx, _ = build_optimizer(cfg, variables["params"], steps_per_epoch=10**6)
    step_fn = jax.jit(make_train_step(model, loss_factory, tx, cfg))
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.int32(0),
        fail_count=jnp.int32(0),
    )
    bad = dict(batch)
    bad["imgs"] = batch["imgs"].at[0, 0, 0, 0].set(jnp.nan)
    new_state, loss, logging = step_fn(state, bad)
    assert not np.isfinite(float(loss))
    assert float(logging["skipped"]) == 1.0
    assert int(new_state.fail_count) == 1
    assert int(new_state.step) == 1
    for b, a in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(new_state.params),
    ):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    # a good batch still updates and does not increment the counter
    new_state2, loss2, logging2 = step_fn(new_state, batch)
    assert np.isfinite(float(loss2))
    assert float(logging2["skipped"]) == 0.0
    assert int(new_state2.fail_count) == 1


def test_freeze_complete_keeps_backbone_fixed(model_and_batch):
    cfg, model, variables, batch = model_and_batch
    cfg2 = small_config()
    cfg2.defrost()
    cfg2.TRAIN.END_TO_END = False
    cfg2.TRAIN.KP_FREEZE_MODE = "complete"
    cfg2.freeze()
    loss_factory = ClassMultiLossFactory(cfg2)
    tx, labels = build_optimizer(cfg2, variables["params"], steps_per_epoch=10**6)
    assert labels["backbone"] is not None
    flat = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda l: l == "frozen", labels["backbone"])
    )
    assert all(flat)

    step_fn = jax.jit(make_train_step(model, loss_factory, tx, cfg2))
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.int32(0),
    )
    state, _, _ = step_fn(state, batch)
    before = jax.tree_util.tree_leaves(variables["params"]["backbone"])
    after = jax.tree_util.tree_leaves(state.params["backbone"])
    for b, a in zip(before, after):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    # but the MPN moved
    b_mpn = jax.tree_util.tree_leaves(variables["params"]["mpn"])
    a_mpn = jax.tree_util.tree_leaves(state.params["mpn"])
    assert any(float(jnp.abs(x - y).max()) > 0 for x, y in zip(b_mpn, a_mpn))
