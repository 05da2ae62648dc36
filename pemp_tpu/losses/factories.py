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
    pre-filters with node_labels == 1). Reference semantics replicated
    exactly: the per-image person count is ``max(person_label) + 1`` — person
    ids with NO nodes still count as tags with mean 0 (scatter_mean fills
    empty rows with zeros, loss.py:111-122) and enter the push pairs and the
    pull denominator.
    """
    ok = node_valid & (person_label >= 0)
    seg = batch_index * max_people + jnp.clip(person_label, 0, max_people - 1)
    n_seg = num_images * max_people
    mean_t = segment_mean(tags[:, None], seg, n_seg, ok)[:, 0]  # (n_seg,)
    sq = (tags - mean_t[seg]) ** 2
    pull_per_person = segment_mean(sq[:, None], seg, n_seg, ok)[:, 0]

    mean_t = mean_t.reshape(num_images, max_people)
    pull_per_person = pull_per_person.reshape(num_images, max_people)

    # reference num_tags: scatter_mean output length = max person id + 1
    pid = jnp.where(ok, person_label, -1)
    max_pid = jax.ops.segment_max(
        pid.astype(jnp.int32), batch_index, num_segments=num_images
    )
    num_tags = jnp.maximum(max_pid + 1, 0)  # (B,), 0 when no valid node
    slot = jnp.arange(max_people, dtype=jnp.int32)[None, :]
    in_range = slot < num_tags[:, None]

    pull = jnp.sum(jnp.where(in_range, pull_per_person, 0.0), axis=1)
    pull = jnp.where(num_tags > 0, pull / jnp.maximum(num_tags, 1), 0.0)

    diff = mean_t[:, :, None] - mean_t[:, None, :]
    pv = in_range[:, :, None] & in_range[:, None, :]
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
                    # the reference also raises for non-focal node loss in
                    # ClassMultiLossFactory (loss.py:618-621)
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
                jnp.where(sel, labels["person"], -1),
                labels["batch_index"],
                sel,
                num_images=int(labels["num_images"]),
                max_people=self.max_people,
                loss_type=self.ae_loss_type,
            )
            # reference guards on any positive node (loss.py:712-716)
            has_pos = jnp.sum(sel) > 0
            tag_total = jnp.where(has_pos, jnp.mean(push) + jnp.mean(pull), 0.0)
        tag_total = tag_total * self.tag_weight
        total += tag_total

        logging["loss"] = total
        return total, logging


class _HeatmapAEMixin:
    """Shared heatmap-MSE + tagmap-AE block (reference: the identical
    preds_heatmaps/ae loop at loss.py:259-290, 367-400, 485-510, 625-660)."""

    def _init_heatmap_ae(self, config, with_heatmap=True, with_tagmap=True):
        self.num_joints = config.MODEL.HRNET.NUM_JOINTS
        self.kp = config.MODEL.KP
        self.with_heatmap = with_heatmap
        self.with_tagmap = with_tagmap
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

    def _heatmap_ae(self, outputs, labels, masks):
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
        ae_total = 0.0
        if self.with_tagmap:
            for idx, pred in enumerate(outputs["heatmap"]):
                if idx < len(self.with_ae) and self.with_ae[idx]:
                    tags_pred = pred[..., self.num_joints :]
                    b = tags_pred.shape[0]
                    flat = jnp.transpose(tags_pred, (0, 3, 1, 2)).reshape(b, -1)
                    push, pull = ae_loss(flat, labels["tag"][idx], self.ae_loss_type)
                    ae_total += (
                        jnp.mean(push) * self.push_factor[idx]
                        + jnp.mean(pull) * self.pull_factor[idx]
                    )
        return heatmap_total, ae_total


class BackgroundClassMultiLossFactory(_HeatmapAEMixin):
    """heatmap + AE + focal edge + CE class with [edge, class] weights.

    Backs the WITH_BACKGROUND config family. reference: loss.py:218-319.
    """

    def __init__(self, config):
        self._init_heatmap_ae(config)
        self.loss_weights = list(config.MODEL.LOSS.LOSS_WEIGHTS)
        assert len(self.loss_weights) == 2
        assert config.MODEL.LOSS.USE_FOCAL  # reference raises otherwise (:251-254)
        self.alpha = config.MODEL.LOSS.FOCAL_ALPHA
        self.gamma = config.MODEL.LOSS.FOCAL_GAMMA

    def __call__(self, outputs, labels, masks, graph=None):
        heatmap_total, ae_total = self._heatmap_ae(outputs, labels, masks)

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
            class_total = class_total / max(len(outputs["class"]), 1)

        logging = {
            "heatmap": heatmap_total,
            "tag_loss": ae_total,
            "edge": edge_total,
            "node": None,
            "class_loss": class_total,
        }
        total = (
            edge_total * self.loss_weights[0]
            + heatmap_total
            + ae_total
            + class_total * self.loss_weights[1]
        )
        logging["loss"] = total
        return total, logging


class TagMultiLossFactory(_HeatmapAEMixin):
    """heatmap + AE + focal node + per-node tag AE + class.

    Backs the tag-regression MPN configs. reference: loss.py:322-432.
    """

    def __init__(self, config):
        self._init_heatmap_ae(config)
        self.loss_weights = list(config.MODEL.LOSS.LOSS_WEIGHTS)
        assert len(self.loss_weights) in (2, 3)
        assert config.MODEL.LOSS.NODE_USE_FOCAL  # reference raises otherwise (:355-358)
        self.alpha = config.MODEL.LOSS.FOCAL_ALPHA
        self.gamma = config.MODEL.LOSS.FOCAL_GAMMA
        self.max_people = config.DATASET.MAX_NUM_PEOPLE

    def __call__(self, outputs, labels, masks, graph=None):
        heatmap_total, ae_total = self._heatmap_ae(outputs, labels, masks)

        node_total = 0.0
        for p in outputs["node"]:
            node_total += focal_loss(p, labels["node"], masks["node"], self.alpha, self.gamma)
        node_total = node_total / max(len(outputs["node"]), 1)

        node_labels = labels["node"]
        sel = node_labels == 1.0
        if isinstance(masks, dict) and masks.get("node_valid") is not None:
            sel = sel & masks["node_valid"]
        tag_total = 0.0
        for t in outputs["tag"]:
            if t is None:
                continue
            push, pull = node_ae_loss(
                t,
                jnp.where(sel, labels["person"], -1),
                labels["batch_index"],
                sel,
                num_images=int(labels["num_images"]),
                max_people=self.max_people,
                loss_type=self.ae_loss_type,
            )
            has_pos = jnp.sum(sel) > 0
            tag_total += jnp.where(has_pos, jnp.mean(push) + jnp.mean(pull), 0.0)

        class_total = 0.0
        if outputs["class"] is not None:
            # reference uses node_labels as the class mask here (:420)
            for p in outputs["class"]:
                class_total += cross_entropy_with_logits(p, labels["class"], node_labels)
            class_total = class_total / max(len(outputs["class"]), 1)

        logging = {
            "heatmap": heatmap_total,
            "tag_loss": ae_total,
            "tag": tag_total,
            "node": node_total,
            "class_loss": class_total,
        }
        if len(self.loss_weights) == 3:
            class_total = class_total * self.loss_weights[2]
        total = (
            self.loss_weights[0] * node_total
            + tag_total * self.loss_weights[1]
            + heatmap_total
            + ae_total
            + class_total
        )
        logging["loss"] = total
        return total, logging


class PureTagMultiLossFactory(_HeatmapAEMixin):
    """heatmap + AE + per-node tag AE only. reference: loss.py:434-536."""

    def __init__(self, config):
        self._init_heatmap_ae(config)
        self.sync_tags = bool(config.MODEL.LOSS.SYNC_TAGS)
        self.loss_weight = config.MODEL.LOSS.TAG_WEIGHT
        self.max_people = config.DATASET.MAX_NUM_PEOPLE

    def __call__(self, outputs, labels, masks, graph=None):
        heatmap_total, ae_total = self._heatmap_ae(outputs, labels, masks)

        node_labels = labels["node"]
        batch_index = labels["batch_index"]
        person = labels["person"]
        sel = node_labels == 1.0
        if isinstance(masks, dict) and masks.get("node_valid") is not None:
            sel = sel & masks["node_valid"]

        preds_tags = list(outputs["tag"])
        sel_all, person_all, batch_all = sel, person, batch_index
        if self.sync_tags:
            # sample the stage-0 tagmap (upsampled to stage-1 res) at the
            # detections and pool it with the MPN tags per person
            # (reference: loss.py:511-527)
            assert len(preds_tags) == 1 and graph is not None
            hm0 = outputs["heatmap"][0][..., self.num_joints :]
            target_hw = outputs["heatmap"][1].shape[1:3]
            hm0 = jax.image.resize(
                hm0, (hm0.shape[0],) + tuple(target_hw) + (hm0.shape[3],),
                method="bilinear",
            )
            det = graph["nodes"]
            ht = hm0[
                batch_index,
                jnp.clip(det[:, 1], 0, target_hw[0] - 1),
                jnp.clip(det[:, 0], 0, target_hw[1] - 1),
                jnp.clip(det[:, 2], 0, hm0.shape[-1] - 1),
            ]
            preds_tags[-1] = jnp.concatenate([preds_tags[-1], ht])
            sel_all = jnp.concatenate([sel, sel])
            person_all = jnp.concatenate([person, person])
            batch_all = jnp.concatenate([batch_index, batch_index])

        tag_total = 0.0
        for t in preds_tags:
            if t is None:
                continue
            push, pull = node_ae_loss(
                t,
                jnp.where(sel_all, person_all, -1),
                batch_all,
                sel_all,
                num_images=int(labels["num_images"]),
                max_people=self.max_people,
                loss_type=self.ae_loss_type,
            )
            has_pos = jnp.sum(sel) > 0
            tag_total += jnp.where(has_pos, jnp.mean(push) + jnp.mean(pull), 0.0)

        logging = {"heatmap": heatmap_total, "tag_loss": ae_total, "tag": tag_total}
        total = tag_total * self.loss_weight + heatmap_total + ae_total
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
    """reference: src/train.py:186-204 (node -> ClassMulti; {heatmap, tag} ->
    PureTagMulti; {edge, heatmap} -> Multi) and the legacy string-name table
    (test_train_loop.py:148-157) used by the older experiment YAMLs, where
    MODEL.LOSS.NAME is a plain string. Edge-only kept as an extension for
    the VanillaMPN configs."""
    name = config.MODEL.LOSS.NAME
    if isinstance(name, str):
        table = {
            "edge_loss": MPNLossFactory,
            "node_edge_loss": ClassMPNLossFactory,
            "node_with_background_edge_loss": BackgroundClassMultiLossFactory,
            "tag_loss": TagMultiLossFactory,
            "pure_tag_loss": PureTagMultiLossFactory,
        }
        if name in table:
            return table[name](config)
        raise NotImplementedError(name)
    losses = set(name)
    if "node" in losses:
        return ClassMultiLossFactory(config)
    if losses == {"heatmap", "tag"}:
        return PureTagMultiLossFactory(config)
    if losses == {"edge", "heatmap"}:
        return MultiLossFactory(config)
    if losses == {"edge_loss"} or losses == {"edge"}:
        return MPNLossFactory(config)
    raise NotImplementedError(sorted(losses))
