"""Loss formula parity vs torch oracles implementing the reference math."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pemp_tpu.losses import (
    ae_loss,
    bce_loss_with_logits,
    cross_entropy_with_logits,
    focal_loss,
    heatmap_loss,
    mask_node_connections,
    node_ae_loss,
)


def test_focal_loss_matches_reference_formula():
    """reference FocalLoss (loss.py:865-891): alpha*(1-pt)^gamma*BCE,
    masked mean = sum/mask.sum()."""
    rng = np.random.RandomState(0)
    logits = rng.randn(40).astype(np.float32)
    targets = (rng.rand(40) > 0.7).astype(np.float32)
    mask = (rng.rand(40) > 0.3).astype(np.float32)

    t_log = torch.from_numpy(logits)
    t_tgt = torch.from_numpy(targets)
    bce = torch.nn.functional.binary_cross_entropy_with_logits(
        t_log, t_tgt, reduction="none"
    )
    pt = torch.exp(-bce)
    f = 1.0 * (1 - pt) ** 2.0 * bce
    want = float((f * torch.from_numpy(mask)).sum() / mask.sum())

    got = float(
        focal_loss(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(mask),
                   alpha=1.0, gamma=2.0)
    )
    assert got == pytest.approx(want, rel=1e-5)


def test_bce_with_logits_mask_does_not_renormalize():
    """reference BCELossWtihLogits (loss.py:893-910): mean over ALL elements."""
    rng = np.random.RandomState(1)
    logits = rng.randn(30).astype(np.float32)
    targets = (rng.rand(30) > 0.5).astype(np.float32)
    mask = (rng.rand(30) > 0.5).astype(np.float32)
    bce = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets), reduction="none"
    )
    want = float((bce * torch.from_numpy(mask)).mean())
    got = float(bce_loss_with_logits(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(mask)))
    assert got == pytest.approx(want, rel=1e-5)


def test_cross_entropy_matches_torch():
    rng = np.random.RandomState(2)
    logits = rng.randn(20, 17).astype(np.float32)
    targets = rng.randint(0, 17, 20)
    mask = (rng.rand(20) > 0.4).astype(np.float32)
    ce = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(targets), reduction="none"
    )
    want = float((ce * torch.from_numpy(mask)).mean())
    got = float(
        cross_entropy_with_logits(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(mask))
    )
    assert got == pytest.approx(want, rel=1e-5)


def test_heatmap_loss_matches_reference():
    """reference HeatmapLoss (loss.py:17-27): masked MSE, per-image mean."""
    rng = np.random.RandomState(3)
    pred = rng.rand(2, 8, 8, 3).astype(np.float32)
    gt = rng.rand(2, 8, 8, 3).astype(np.float32)
    mask = (rng.rand(2, 8, 8) > 0.3).astype(np.float32)
    # torch oracle in NCHW
    tp = torch.from_numpy(pred.transpose(0, 3, 1, 2))
    tg = torch.from_numpy(gt.transpose(0, 3, 1, 2))
    tm = torch.from_numpy(mask)
    loss = ((tp - tg) ** 2) * tm[:, None, :, :].expand_as(tp)
    want = loss.mean(dim=3).mean(dim=2).mean(dim=1).numpy()
    got = np.asarray(heatmap_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def reference_ae_loss_single(pred_tag, joints, loss_type="exp"):
    """numpy oracle of reference AELoss.singleTagLoss (loss.py:42-85)."""
    tags, pull = [], 0.0
    for person in joints:
        tmp = [pred_tag[int(j[0])] for j in person if j[1] > 0]
        if not tmp:
            continue
        tmp = np.asarray(tmp)
        tags.append(tmp.mean())
        pull += ((tmp - tags[-1]) ** 2).mean()
    num = len(tags)
    if num == 0:
        return 0.0, 0.0
    if num == 1:
        return 0.0, pull / num
    tags = np.asarray(tags)
    diff = tags[None, :] - tags[:, None]
    push = np.exp(-(diff**2)).sum() - num
    return push / ((num - 1) * num) * 0.5, pull / num


def test_ae_loss_matches_oracle():
    rng = np.random.RandomState(4)
    res, j, p = 8, 3, 4
    tags_flat = rng.randn(j * res * res).astype(np.float32)
    joints = np.zeros((p, j, 2), np.int32)
    for pi in range(p - 1):  # last person empty
        for ji in range(j):
            if rng.rand() > 0.3:
                joints[pi, ji] = (rng.randint(0, j * res * res), 1)
    want_push, want_pull = reference_ae_loss_single(tags_flat, joints)
    push, pull = ae_loss(jnp.asarray(tags_flat)[None], jnp.asarray(joints)[None])
    assert float(push[0]) == pytest.approx(want_push, abs=1e-5)
    assert float(pull[0]) == pytest.approx(want_pull, abs=1e-5)


def test_node_ae_loss_push_pull():
    """Two tight clusters with distinct tags: pull ~0, push ~exp(-d^2)."""
    tags = jnp.asarray([1.0, 1.0, 5.0, 5.0])
    person = jnp.asarray([0, 0, 1, 1])
    batch = jnp.zeros(4, jnp.int32)
    valid = jnp.ones(4, bool)
    push, pull = node_ae_loss(tags, person, batch, valid, num_images=1, max_people=4)
    assert float(pull[0]) == pytest.approx(0.0, abs=1e-6)
    assert float(push[0]) == pytest.approx(np.exp(-16.0), abs=1e-6)


def test_mask_node_connections():
    """reference: train.py:103-112."""
    preds = jnp.asarray([0.9, 0.2, 0.8, 0.1])
    labels = jnp.asarray([0.0, 0.0, 0.0, 1.0])  # node 3 forced positive
    ei = jnp.asarray([[0, 0, 2], [1, 2, 3]])
    m = np.asarray(mask_node_connections(preds, ei, 0.5, labels))
    np.testing.assert_array_equal(m, [False, True, True])
    m2 = np.asarray(
        mask_node_connections(preds, ei, 0.5, labels, include_bordering_nodes=True)
    )
    np.testing.assert_array_equal(m2, [True, True, True])


def test_string_loss_name_dispatch():
    """Legacy string MODEL.LOSS.NAME values from the reference experiment
    YAMLs dispatch per test_train_loop.py:148-157's table."""
    from pemp_tpu.losses.factories import (
        BackgroundClassMultiLossFactory,
        ClassMPNLossFactory,
        MPNLossFactory,
        PureTagMultiLossFactory,
        TagMultiLossFactory,
        dispatch_loss_func,
    )

    table = {
        "edge_loss": MPNLossFactory,
        "node_edge_loss": ClassMPNLossFactory,
        "node_with_background_edge_loss": BackgroundClassMultiLossFactory,
        "tag_loss": TagMultiLossFactory,
        "pure_tag_loss": PureTagMultiLossFactory,
    }
    from pemp_tpu.config import get_config

    for name, cls in table.items():
        cfg = get_config()
        cfg.defrost()
        cfg.MODEL.LOSS.NAME = name
        cfg.freeze()
        assert isinstance(dispatch_loss_func(cfg), cls), name
