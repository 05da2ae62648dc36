"""Loss functions and factories.

Functional optax-style re-implementation of the reference's loss factories
(reference: src/Utils/loss.py). All losses take explicit masks; in the padded
TPU design the masks also carry node/edge validity so padding is inert.

Factory surface mirrors the reference:
  * ClassMultiLossFactory (flagship): heatmap + AE + node + edge + class + tag
    (loss.py:539-758)
  * MPNLossFactory (edge only, loss.py:761-783)
  * ClassMPNLossFactory (loss.py:785-862)
  * MultiLossFactory (edge + heatmap)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pemp_tpu.ops.segment import segment_mean


def sigmoid_bce_with_logits(logits, targets):
    """binary_cross_entropy_with_logits, elementwise."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def focal_loss(logits, targets, mask=None, alpha=1.0, gamma=2.0, reduction="mean"):
    """reference FocalLoss (loss.py:865-891): alpha*(1-pt)^gamma * BCE,
    mask-normalized mean (sum / mask.sum())."""
    bce = sigmoid_bce_with_logits(logits, targets)
    pt = jnp.exp(-bce)
    f = alpha * (1 - pt) ** gamma * bce
    if mask is not None:
        f = f * mask
        if reduction == "mean":
            return jnp.sum(f) / jnp.maximum(jnp.sum(mask), 1e-12)
    if reduction == "mean":
        return jnp.mean(f)
    if reduction == "sum":
        return jnp.sum(f)
    return f


def bce_loss_with_logits(logits, targets, mask=None, pos_weight=None):
    """reference BCELossWtihLogits (loss.py:893-910): plain mean over ALL
    elements (mask multiplies but does not renormalize)."""
    bce = sigmoid_bce_with_logits(logits, targets)
    if mask is not None:
        bce = bce * mask
    if pos_weight is not None:
        bce = jnp.where(targets == 1.0, bce * pos_weight, bce)
    return jnp.mean(bce)


def cross_entropy_with_logits(logits, targets, mask=None):
    """reference CrossEntropyLossWithLogits (loss.py:923-933): mean over all
    elements after mask multiply."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, targets[:, None].astype(jnp.int32), axis=1)[:, 0]
    if mask is not None:
        ce = ce * mask
    return jnp.mean(ce)


def heatmap_loss(pred, gt, mask):
    """Masked MSE, per-image mean over (H, W, J). NHWC.

    reference HeatmapLoss (loss.py:17-27).
    """
    loss = (pred - gt) ** 2 * mask[..., None]
    return loss.mean(axis=(1, 2, 3))


def ae_loss(tags_pred_flat, joints, loss_type="exp"):
    """Associative-embedding push/pull on tagmaps.

    tags_pred_flat: (B, L) flattened tagmaps (J*H*W); joints: (B, P, J, 2)
    int (flat_index, valid). reference AELoss (loss.py:37-98).
    Returns (push (B,), pull (B,)).
    """

    def single(tags, jts):
        idx = jts[:, :, 0].astype(jnp.int32)  # (P, J)
        v = jts[:, :, 1] > 0
        t = tags[jnp.clip(idx, 0, tags.shape[0] - 1)]  # (P, J)
        cnt = jnp.sum(v, axis=1)  # (P,)
        person_valid = cnt > 0
        safe_cnt = jnp.maximum(cnt, 1)
        mean_t = jnp.sum(jnp.where(v, t, 0.0), axis=1) / safe_cnt  # (P,)
        pull_pp = jnp.sum(jnp.where(v, (t - mean_t[:, None]) ** 2, 0.0), axis=1) / safe_cnt
        num_tags = jnp.sum(person_valid)
        pull = jnp.sum(jnp.where(person_valid, pull_pp, 0.0)) / jnp.maximum(num_tags, 1)

        diff = mean_t[:, None] - mean_t[None, :]
        pair_valid = person_valid[:, None] & person_valid[None, :]
        if loss_type == "exp":
            push_mat = jnp.where(pair_valid, jnp.exp(-(diff**2)), 0.0)
            push = jnp.sum(push_mat) - num_tags
        else:  # max
            push_mat = jnp.where(pair_valid, jnp.clip(1 - jnp.abs(diff), 0), 0.0)
            push = jnp.sum(push_mat) - num_tags
        denom = jnp.maximum((num_tags - 1) * num_tags, 1)
        push = jnp.where(num_tags > 1, push / denom * 0.5, 0.0)
        pull = jnp.where(num_tags > 0, pull, 0.0)
        return push, pull

    return jax.vmap(single)(tags_pred_flat, joints)


def node_ae_loss(tags, person_label, batch_index, node_valid, num_images, max_people=30, loss_type="exp"):
    """Push/pull on per-node predicted tags, per image.

    reference NodeAELoss (loss.py:101-159). ``person_label`` is -1 for
    unmatched nodes; only valid nodes with person >= 0 contribute (the caller
    pre-filters with node_labels == 1).
    """
    ok = node_valid & (person_label >= 0)
    seg = batch_index * max_people + jnp.clip(person_label, 0, max_people - 1)
    n_seg = num_images * max_people
    mean_t = segment_mean(tags[:, None], seg, n_seg, ok)[:, 0]  # (n_seg,)
    has = jax.ops.segment_sum(ok.astype(jnp.float32), seg, num_segments=n_seg) > 0
    sq = (tags - mean_t[seg]) ** 2
    pull_per_person = segment_mean(sq[:, None], seg, n_seg, ok)[:, 0]

    mean_t = mean_t.reshape(num_images, max_people)
    has = has.reshape(num_images, max_people)
    pull_per_person = pull_per_person.reshape(num_images, max_people)

    num_tags = jnp.sum(has, axis=1)  # (B,)
    pull = jnp.sum(jnp.where(has, pull_per_person, 0.0), axis=1)
    pull = jnp.where(num_tags > 0, pull / jnp.maximum(num_tags, 1), 0.0)

    diff = mean_t[:, :, None] - mean_t[:, None, :]
    pv = has[:, :, None] & has[:, None, :]
    if loss_type == "exp":
        push_mat = jnp.where(pv, jnp.exp(-(diff**2)), 0.0)
    else:
        push_mat = jnp.where(pv, jnp.clip(1 - jnp.abs(diff), 0), 0.0)
    push = jnp.sum(push_mat, axis=(1, 2)) - num_tags
    denom = jnp.maximum((num_tags - 1) * num_tags, 1)
    push = jnp.where(num_tags > 1, push / denom * 0.5, 0.0)
    return push, pull


def mask_node_connections(preds_nodes_sigmoid, edge_index, threshold, node_labels=None,
                          include_bordering_nodes=False):
    """Graph-reduction mask for the edge loss.

    reference: src/train.py:103-112.
    """
    tp = preds_nodes_sigmoid > threshold
    if node_labels is not None:
        tp = tp | (node_labels == 1.0)
    src, dst = edge_index[0], edge_index[1]
    if include_bordering_nodes:
        return tp[src] | tp[dst]
    return tp[src] & tp[dst]


class ClassMultiLossFactory:
    """Flagship multi-loss. reference: loss.py:539-758.

    Stateless callable; settings pulled from the config tree.
    """

    def __init__(self, config):
        losses = config.MODEL.LOSS.NAME
        self.num_joints = config.MODEL.HRNET.NUM_JOINTS
        self.with_heatmap = "heatmap" in losses
        self.with_tagmap = "tagmap" in losses
        self.with_edge = "edge" in losses
        self.with_node = "node" in losses
        self.with_class = "class" in losses
        self.with_tag_loss = "tag_loss" in losses
        self.edge_weight = config.MODEL.LOSS.EDGE_WEIGHT
        self.node_weight = config.MODEL.LOSS.NODE_WEIGHT
        self.class_weight = config.MODEL.LOSS.CLASS_WEIGHT
        self.tag_weight = config.MODEL.LOSS.TAG_WEIGHT
        self.alpha = config.MODEL.LOSS.FOCAL_ALPHA
        self.gamma = config.MODEL.LOSS.FOCAL_GAMMA
        self.use_focal = config.MODEL.LOSS.USE_FOCAL
        self.node_use_focal = config.MODEL.LOSS.NODE_USE_FOCAL
        self.edge_with_logits = config.MODEL.LOSS.EDGE_WITH_LOGITS
        self.edge_pos_weight = config.MODEL.LOSS.EDGE_BCE_POS_WEIGHT
        self.kp = config.MODEL.KP
        if self.kp in ("hrnet", "mmpose_hrnet"):
            self.with_heatmaps_loss = tuple(config.MODEL.HRNET.LOSS.WITH_HEATMAPS_LOSS)
            self.heatmaps_loss_factor = tuple(config.MODEL.HRNET.LOSS.HEATMAPS_LOSS_FACTOR)
        else:
            nstack = config.MODEL.HG.NSTACK
            self.with_heatmaps_loss = (True,) * nstack
            self.heatmaps_loss_factor = (1.0,) * nstack
        self.with_ae = tuple(config.TRAIN.WITH_AE_LOSS)
        self.ae_loss_type = config.MODEL.HRNET.LOSS.AE_LOSS_TYPE
        self.push_factor = tuple(config.MODEL.HRNET.LOSS.PUSH_LOSS_FACTOR)
        self.pull_factor = tuple(config.MODEL.HRNET.LOSS.PULL_LOSS_FACTOR)
        self.max_people = config.DATASET.MAX_NUM_PEOPLE

    def __call__(self, outputs, labels, masks, graph):
        logging = {}
        total = 0.0

        heatmap_total = 0.0
        if self.with_heatmap:
            for idx, pred in enumerate(outputs["heatmap"]):
                if idx < len(self.with_heatmaps_loss) and self.with_heatmaps_loss[idx]:
                    hl = heatmap_loss(
                        pred[..., : self.num_joints],
                        labels["heatmap"][idx],
                        masks["heatmap"][idx],
                    )
                    heatmap_total += jnp.mean(hl) * self.heatmaps_loss_factor[idx]
        total += heatmap_total
        logging["heatmap"] = heatmap_total

        ae_total = 0.0
        if self.with_tagmap:
            for idx, pred in enumerate(outputs["heatmap"]):
                if idx < len(self.with_ae) and self.with_ae[idx]:
                    tags_pred = pred[..., self.num_joints :]
                    b = tags_pred.shape[0]
                    # flatten in the reference's CHW order: (J, H, W)
                    flat = jnp.transpose(tags_pred, (0, 3, 1, 2)).reshape(b, -1)
                    push, pull = ae_loss(flat, labels["tag"][idx], self.ae_loss_type)
                    ae_total += (
                        jnp.mean(push) * self.push_factor[idx]
                        + jnp.mean(pull) * self.pull_factor[idx]
                    )
        total += ae_total
        logging["tag_loss"] = ae_total

        node_total = 0.0
        if self.with_node:
            preds = outputs["node"]
            for p in preds:
                if self.node_use_focal:
                    node_total += focal_loss(
                        p, labels["node"], masks["node"], self.alpha, self.gamma
                    )
                else:
                    raise NotImplementedError
            node_total = node_total / max(len(preds), 1)
        node_total = node_total * self.node_weight
        total += node_total
        logging["node"] = node_total

        edge_total = 0.0
        if self.with_edge:
            preds = outputs["edge"]
            for i, p in enumerate(preds):
                m = masks["edge"][i] if isinstance(masks["edge"], (list, tuple)) else masks["edge"]
                lbl = labels["edge"][i] if isinstance(labels["edge"], (list, tuple)) else labels["edge"]
                if self.use_focal:
                    step = focal_loss(p, lbl, m, self.alpha, self.gamma)
                else:
                    step = bce_loss_with_logits(p, lbl, m, self.edge_pos_weight)
                # nan (empty mask) contributes zero like the reference's
                # isnan guard (loss.py:682-684)
                edge_total += jnp.where(jnp.isnan(step), 0.0, step)
            edge_total = edge_total / max(len(preds), 1)
        edge_total = edge_total * self.edge_weight
        total += edge_total
        logging["edge"] = edge_total

        class_total = 0.0
        if self.with_class and outputs["class"] is not None:
            preds = outputs["class"]
            for p in preds:
                class_total += cross_entropy_with_logits(
                    p, labels["class"], masks["class"]
                )
            class_total = class_total / max(len(preds), 1)
        class_total = class_total * self.class_weight
        total += class_total
        logging["class_loss"] = class_total

        tag_total = 0.0
        if self.with_tag_loss and outputs["tag"][-1] is not None:
            node_labels = labels["node"]
            sel = node_labels == 1.0
            node_valid = masks.get("node_valid") if isinstance(masks, dict) else None
            if node_valid is not None:
                sel = sel & node_valid
            push, pull = node_ae_loss(
                outputs["tag"][-1],
                jnp.where(node_labels == 1.0, labels["person"], -1),
                labels["batch_index"],
                sel,
                num_images=int(labels["num_images"]),
                max_people=self.max_people,
                loss_type=self.ae_loss_type,
            )
            tag_total = jnp.mean(push) + jnp.mean(pull)
        tag_total = tag_total * self.tag_weight
        total += tag_total

        logging["loss"] = total
        return total, logging


class MPNLossFactory:
    """Edge-only focal loss. reference: loss.py:761-783."""

    def __init__(self, config):
        assert config.MODEL.LOSS.USE_FOCAL
        self.alpha = config.MODEL.LOSS.FOCAL_ALPHA
        self.gamma = config.MODEL.LOSS.FOCAL_GAMMA

    def __call__(self, outputs, labels, masks):
        preds = outputs["edge"]
        total = 0.0
        for i, p in enumerate(preds):
            m = masks["edge"][i] if isinstance(masks["edge"], (list, tuple)) else masks["edge"]
            lbl = labels["edge"][i] if isinstance(labels["edge"], (list, tuple)) else labels["edge"]
            total += focal_loss(p, lbl, m, self.alpha, self.gamma)
        total = total / max(len(preds), 1)
        return total, {"loss": total}


class ClassMPNLossFactory:
    """node+edge+class with loss weights. reference: loss.py:785-862."""

    def __init__(self, config):
        self.loss_weights = list(config.MODEL.LOSS.LOSS_WEIGHTS)
        assert len(self.loss_weights) in (2, 3)
        self.alpha = config.MODEL.LOSS.FOCAL_ALPHA
        self.gamma = config.MODEL.LOSS.FOCAL_GAMMA
        self.use_focal = config.MODEL.LOSS.USE_FOCAL
        self.node_use_focal = config.MODEL.LOSS.NODE_USE_FOCAL
        self.node_pos_weight = config.MODEL.LOSS.NODE_BCE_POS_WEIGHT

    def __call__(self, outputs, labels, masks):
        node_total = 0.0
        for p in outputs["node"]:
            if self.node_use_focal:
                node_total += focal_loss(p, labels["node"], masks["node"], self.alpha, self.gamma)
            else:
                node_total += bce_loss_with_logits(p, labels["node"], masks["node"], self.node_pos_weight)
        node_total /= max(len(outputs["node"]), 1)

        edge_total = 0.0
        n_edge = 0
        for i, p in enumerate(outputs["edge"]):
            if p is None:
                continue
            m = masks["edge"][i] if isinstance(masks["edge"], (list, tuple)) else masks["edge"]
            lbl = labels["edge"][i] if isinstance(labels["edge"], (list, tuple)) else labels["edge"]
            edge_total += focal_loss(p, lbl, m, self.alpha, self.gamma)
            n_edge += 1
        edge_total = edge_total / max(len(outputs["edge"]), 1)
        edge_total = jnp.where(jnp.isnan(edge_total), 0.0, edge_total)

        class_total = 0.0
        if outputs["class"] is not None:
            for p in outputs["class"]:
                class_total += cross_entropy_with_logits(p, labels["class"], masks["class"])
            class_total /= max(len(outputs["class"]), 1)

        if len(self.loss_weights) == 3:
            class_total = class_total * self.loss_weights[2]
        total = self.loss_weights[0] * node_total + self.loss_weights[1] * edge_total + class_total
        return total, {
            "node": node_total,
            "edge": edge_total,
            "class_loss": class_total,
            "loss": total,
        }


class MultiLossFactory:
    """edge (+heatmap) loss used by the older configs. reference: loss.py:162-215."""

    def __init__(self, config):
        self.inner = MPNLossFactory(config)

    def __call__(self, outputs, labels, masks):
        return self.inner(outputs, labels, masks)


def dispatch_loss_func(config):
    """reference: src/train.py:186-204."""
    losses = set(config.MODEL.LOSS.NAME)
    if "node" in losses:
        return ClassMultiLossFactory(config)
    if losses == {"edge", "heatmap"}:
        return MultiLossFactory(config)
    if losses == {"edge_loss"} or losses == {"edge"}:
        return MPNLossFactory(config)
    raise NotImplementedError(sorted(losses))
