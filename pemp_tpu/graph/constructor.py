"""Batched, static-shape graph construction + training-label construction.

TPU-native re-design of the reference's NaiveGraphConstructor
(reference: src/graph_constructor/ConstructGraph.py:9-1158). The reference
loops over images in python, builds variable-size graphs with
torch_geometric, and runs scipy Hungarian matching on the host every forward
pass. Here everything is batched, padded to (B, N=J*K nodes, E edges) with
validity masks, and runs on-device inside one jit:

  * detection: ops.detection.joint_det_from_scoremaps (NMS + per-type top-K)
  * graph: ops.knn fixed-shape edge builders
  * labels: OKS similarity matrices + on-device auction assignment
    (semi-agnostic two-pass matching of EDGE_LABEL_METHOD 6, plus methods
    1-4 and 7)

The per-image graphs are flattened into one big disjoint graph by offsetting
node indices (as the reference does at ConstructGraph.py:221-231), so the MPN
runs once over (B*N, B*E).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from pemp_tpu.ops.detection import joint_det_from_scoremaps
from pemp_tpu.ops.knn import (
    feature_knn_edges,
    fully_connected_edges,
    knn_edges,
    top_k_per_type_edges,
)
from pemp_tpu.ops.matching import auction_assignment, greedy_assignment


@dataclasses.dataclass(frozen=True)
class GCConfig:
    """Static settings extracted from config.MODEL.GC (+ TPU sizing)."""

    num_joints: int = 17
    nodes_per_type: int = 40
    knn_k: int = 50
    target_major: bool = True   # blocked in-edge layout (fast aggregation)
    knn_cap_in: int = 50        # capacity for asymmetric transpose edges
    pool_kernel: int = 3
    detect_threshold: float | None = 0.1
    hybrid_k: int = 5
    graph_type: str = "knn"
    edge_features: tuple = ("position", "connection_type")
    norm_node_distance: bool = False
    matching_radius: float = 0.5
    inclusion_radius: float = 0.75
    node_matching_radius: float = 0.5
    node_inclusion_radius: float = 0.7
    edge_label_method: int = 6
    use_gt: bool = False
    use_neighbours: bool = False
    with_background: bool = False
    mask_crowds: bool = True
    matcher: str = "auction"  # auction | greedy
    knn_symmetric: bool = False  # symmetric cap truncation (einsum msg path)
    node_dropout: float = 0.0
    weight_class_loss: bool = False
    image_centric: bool = False

    @classmethod
    def from_config(cls, config) -> "GCConfig":
        gc = config.MODEL.GC
        th = gc.DETECT_THRESHOLD if gc.DETECT_THRESHOLD <= 1.5 else None
        cap_in = config.TPU.KNN_CAP_IN if "KNN_CAP_IN" in config.TPU else 32
        msg_pass = config.TPU.MSG_PASS if "MSG_PASS" in config.TPU else "auto"
        if msg_pass == "auto":
            # the symmetric layout exists to serve the reverse-permutation
            # einsum message path; on TPU the fused kernel is faster AND the
            # symmetric bookkeeping costs ~2.4 img/s on the w48/640 bench,
            # so auto resolves by backend
            import jax as _jax

            msg_pass = "einsum" if _jax.default_backend() != "tpu" else "pallas"
        return cls(
            num_joints=config.DATASET.NUM_JOINTS,
            nodes_per_type=config.TPU.NODES_PER_TYPE,
            knn_k=config.TPU.KNN_K,
            target_major=bool(config.TPU.TARGET_MAJOR) if "TARGET_MAJOR" in config.TPU else True,
            knn_cap_in=cap_in if cap_in > 0 else config.TPU.KNN_K,
            pool_kernel=gc.POOL_KERNEL_SIZE,
            detect_threshold=th,
            hybrid_k=gc.HYBRID_K,
            graph_type=gc.GRAPH_TYPE,
            edge_features=tuple(gc.EDGE_FEATURES_TO_USE),
            norm_node_distance=gc.NORM_NODE_DISTANCE,
            matching_radius=gc.MATCHING_RADIUS,
            inclusion_radius=gc.INCLUSION_RADIUS,
            node_matching_radius=gc.NODE_MATCHING_RADIUS,
            node_inclusion_radius=gc.NODE_INCLUSION_RADIUS,
            edge_label_method=gc.EDGE_LABEL_METHOD,
            use_gt=gc.USE_GT,
            use_neighbours=gc.USE_NEIGHBOURS,
            with_background=gc.WITH_BACKGROUND,
            mask_crowds=gc.MASK_CROWDS,
            knn_symmetric=msg_pass in ("einsum", "hybrid"),
            matcher="greedy" if config.TPU.MATCHER == "greedy" else "auction",
            node_dropout=gc.NODE_DROPOUT,
            weight_class_loss=gc.WEIGHT_CLASS_LOSS,
            image_centric=bool(gc.IMAGE_CENTRIC_SAMPLING),
        )


@dataclasses.dataclass
class GraphBatch:
    """Flattened batch graph (pytree). Shapes: N* = B*J*K, E* = B*E_img."""

    x: Any                 # (N*, C) node features
    edge_attr: Any         # (E*, F)
    edge_index: Any        # (2, E*) into flattened node ids
    joint_det: Any         # (N*, 3) x, y, type
    joint_scores: Any      # (N*,)
    joint_tags: Any        # (N*,)
    batch_index: Any       # (N*,)
    node_valid: Any        # (N*,) bool
    edge_valid: Any        # (E*,) bool
    edge_labels: Any = None    # (E*,)
    node_labels: Any = None    # (N*,)
    node_classes: Any = None   # (N*,)
    node_persons: Any = None   # (N*,)
    label_mask: Any = None     # (E*,)
    label_mask_node: Any = None  # (N*,)
    class_mask: Any = None     # (N*,)
    edge_src_local: Any = None  # (E*,) source index WITHIN its image
    # (pre-offset; saves an E-sized int remainder in the fused-step MPN)


jax.tree_util.register_dataclass(
    GraphBatch,
    data_fields=[f.name for f in dataclasses.fields(GraphBatch)],
    meta_fields=[],
)


def _build_edges(cfg: GCConfig, det, valid, scores, node_feats):
    pos = det[:, :2].astype(jnp.float32)
    if cfg.graph_type == "knn":
        if cfg.target_major:
            from pemp_tpu.ops.knn import knn_edges_target_major

            return knn_edges_target_major(
                pos, valid, cfg.knn_k, cfg.knn_cap_in,
                symmetric=cfg.knn_symmetric,
            )
        return knn_edges(pos, valid, cfg.knn_k)
    if cfg.graph_type == "fully":
        return fully_connected_edges(valid)
    if cfg.graph_type == "feature_knn":
        return feature_knn_edges(node_feats, valid, cfg.knn_k)
    if cfg.graph_type == "topk":
        return top_k_per_type_edges(pos, valid, det[:, 2], cfg.num_joints, 10)
    if cfg.graph_type == "score_based":
        from pemp_tpu.ops.knn import score_based_edges

        return score_based_edges(pos, valid, scores, 75)
    if cfg.graph_type == "score_based_per_type":
        from pemp_tpu.ops.knn import score_based_per_type_edges

        return score_based_per_type_edges(
            pos, valid, det[:, 2], scores, cfg.num_joints, 2, cfg.nodes_per_type
        )
    raise NotImplementedError(cfg.graph_type)


def _edge_features(cfg: GCConfig, det, scores, tags_at_det, edge_index, hw):
    """reference: ConstructGraph.py:288-359

    All per-node attributes are packed into one wide f32 row and gathered
    once per endpoint: N narrow s32 gathers cost ~3ms each at flagship
    shapes on TPU, while a single wide row gather costs ~0.3ms.
    """
    src, dst = edge_index[0], edge_index[1]
    norm = float(max(hw)) if cfg.norm_node_distance else 1.0
    j = cfg.num_joints

    tags2d = tags_at_det if tags_at_det.ndim == 2 else tags_at_det[:, None]
    feats = set(cfg.edge_features)
    need_tags = bool(feats & {"ae", "ae_normed", "ae_tracking_1"})
    # packed row: [x, y] (+ type one-hot when not index-derivable)
    # (+ score, tags for the ae modes)
    cols = [det[:, :2].astype(jnp.float32)]
    if cfg.use_gt:
        # GT-as-detections is person-major — types must ride the gather
        cols.append(jax.nn.one_hot(det[:, 2], j, dtype=jnp.float32))
    if need_tags:
        cols.append(scores[:, None].astype(jnp.float32))
        cols.append(tags2d.astype(jnp.float32))
    row = jnp.concatenate(cols, axis=-1) if len(cols) > 1 else cols[0]
    rs = row[src]
    # target-major blocked layout: dst == slot // C — the target-side lookup
    # is a static repeat, halving the per-edge gather row count (TPU gathers
    # cost ~4.5ns/row regardless of width)
    n_nodes = row.shape[0]
    e_total = edge_index.shape[1]
    if (
        cfg.graph_type == "knn"
        and cfg.target_major
        and e_total % n_nodes == 0
    ):
        rd = jnp.repeat(row, e_total // n_nodes, axis=0)
    else:
        rd = row[dst]
    xs, ys, xd, yd = rs[:, 0], rs[:, 1], rd[:, 0], rd[:, 1]
    if cfg.use_gt:
        hot_s, hot_d = rs[:, 2:2 + j], rd[:, 2:2 + j]
        off = 2 + j
    else:
        # type-blocked detections: type(n) == (n // K) mod J — free index
        # arithmetic instead of widening every edge gather by J one-hot
        # columns; the mod makes it hold for flat batch ids too (N = J*K)
        hot_s = jax.nn.one_hot((src // cfg.nodes_per_type) % j, j, dtype=jnp.float32)
        hot_d = jax.nn.one_hot((dst // cfg.nodes_per_type) % j, j, dtype=jnp.float32)
        off = 2
    if need_tags:
        score_s = rs[:, off]
        tag_s, tag_d = rs[:, off + 1:], rd[:, off + 1:]

    dx = (xd - xs) / norm
    dy = (yd - ys) / norm

    e = edge_index.shape[1]
    conn = jnp.clip(hot_s + hot_d, 0.0, 1.0)
    # same-type edges get a single hot at that type (reference sets the same
    # position twice -> stays 1); clip keeps that semantics for distinct types

    feats = set(cfg.edge_features)
    if feats == {"position", "connection_type"}:
        return jnp.concatenate([dx[:, None], dy[:, None], conn], axis=-1)
    if feats == {"connection_type"}:
        return conn
    if feats == {"position"}:
        return jnp.stack([dx, dy], axis=-1)
    if feats == {"nothing"}:
        return jnp.zeros((e, 1), jnp.float32)
    if feats == {"position", "angle", "connection_type"}:
        ax = xs - xd
        ay = ys - yd
        denom = jnp.sqrt(ax * ax + ay * ay)
        theta = jnp.abs(jnp.arccos(jnp.where(denom > 0, ax / jnp.maximum(denom, 1e-12), 1.0)))
        theta = jnp.where(denom > 0, theta, 0.0)
        return jnp.concatenate([dx[:, None], dy[:, None], theta[:, None], conn], axis=-1)
    # AE distances are vector norms over the tag channel dim (multi-scale/
    # flip TTA concatenates tag channels — reference ConstructGraph.py:336-357
    # `.norm(p=None, dim=1)` over possibly multi-dim joint tags)

    def tag_dist():
        diff = tag_d - tag_s
        return jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))

    if feats == {"ae"}:
        return tag_dist()[:, None]
    if feats == {"ae_normed"}:
        d = jnp.round(tag_dist()) * 100.0 - score_s
        return d[:, None]
    if feats == {"ae_tracking_1"}:
        t_a = 1.8425
        return (((t_a - tag_dist()) / t_a))[:, None]
    if feats == {"position", "connection_type", "ae_normed"}:
        d = tag_dist()
        return jnp.concatenate([dx[:, None], dy[:, None], conn, d[:, None]], axis=-1)
    raise NotImplementedError(cfg.edge_features)


def _similarity(det, det_valid, joints_gt, factors, hw):
    """OKS-style similarity between every GT joint and every detection.

    rows: flattened (person, joint) GT entries; cols: detections.
    reference: ConstructGraph.py:775-782.
    """
    p, j = joints_gt.shape[:2]
    gt = joints_gt.reshape(p * j, 3)
    gt_valid = gt[:, 2] > 0
    fac = factors.reshape(p * j)
    gt_type = jnp.tile(jnp.arange(j, dtype=det.dtype), p)
    gt_person = jnp.repeat(jnp.arange(p, dtype=det.dtype), j)

    clamp_max = float(max(hw))
    gt_xy = jnp.clip(jnp.round(gt[:, :2]), 0, clamp_max)
    d2 = jnp.sum(
        (gt_xy[:, None, :] - det[None, :, :2].astype(jnp.float32)) ** 2, axis=-1
    )
    sim = jnp.exp(-d2 / jnp.maximum(fac[:, None], 1e-12))
    sim = jnp.where(gt_valid[:, None] & det_valid[None, :], sim, 0.0)
    same_type = jnp.equal(gt_type[:, None], det[None, :, 2])
    return sim, same_type, gt_valid, gt_person, gt_type


def _assign(cfg: GCConfig, sim):
    if cfg.matcher == "greedy":
        return greedy_assignment(sim)
    return auction_assignment(sim)


def _labels_from_matching(num_det, col_of_row, row_valid, gt_person, gt_type):
    """Scatter matched GT attributes onto detections.

    Two GT rows can claim the same detection (a same-type match of one row
    colliding with the cross-type fill-in of another — reference method 2
    branch, ConstructGraph.py:808-829); the reference's index_put writes rows
    in ascending order so the LARGEST row index wins (ConstructGraph.py:
    929-940). Replicated here with a deterministic segment max.
    """
    matched = row_valid & (col_of_row >= 0)
    r = col_of_row.shape[0]
    row_ids = jnp.arange(r, dtype=jnp.int32)
    tgt = jnp.where(matched, col_of_row, num_det)  # park invalid rows
    winner = (
        jnp.full((num_det + 1,), -1, jnp.int32)
        .at[tgt]
        .max(jnp.where(matched, row_ids, -1))[:num_det]
    )
    has = winner >= 0
    w = jnp.clip(winner, 0, r - 1)
    node_labels = jnp.where(has, 1.0, 0.0)
    node_persons = jnp.where(has, gt_person[w].astype(jnp.int32), -1)
    node_classes = jnp.where(has, gt_type[w].astype(jnp.int32), 0)
    return node_labels, node_persons, node_classes


def _edge_labels_from_persons(node_persons, edge_index):
    """Edge label 1 iff both endpoints matched to the same person.

    reference match_cc: ConstructGraph.py:1095-1134.
    """
    src, dst = edge_index[0], edge_index[1]
    ps, pd = node_persons[src], node_persons[dst]
    return jnp.where((ps >= 0) & (ps == pd), 1.0, 0.0)


def _construct_labels(cfg: GCConfig, det, det_valid, edge_index, joints_gt, factors, hw,
                      **kwargs):
    """EDGE_LABEL_METHODs on-device.

    Method 6 (flagship, semi-agnostic two-pass; ConstructGraph.py:769-942):
      pass 1a: Hungarian on same-type similarity (threshold matching_radius)
      pass 1b: Hungarian on cross-type similarity; rows unmatched in 1a are
               filled from 1b
      pass 2 (USE_NEIGHBOURS): unmatched detections within inclusion_radius
               of exactly one matched GT join it; claimed-by-many detections
               are loss-masked (ambiguous)
    Methods 3/4: single same-type pass (+ neighbours), differing in outputs.
    """
    n = det.shape[0]
    sim, same_type, gt_valid, gt_person, gt_type = _similarity(
        det, det_valid, joints_gt, factors, hw
    )
    method = cfg.edge_label_method

    if method in (1, 2):
        # use_gt modes: detections are the GT joints themselves; same-type
        # nearest matching (radius node_matching_radius for 1)
        radius = cfg.node_matching_radius if method == 1 else cfg.matching_radius
        sim_m = jnp.where(same_type, sim, 0.0)
        sim_m = jnp.where(sim_m < radius, 0.0, sim_m)
        col = _assign(cfg, sim_m)
        node_labels, node_persons, node_classes = _labels_from_matching(
            n, col, gt_valid, gt_person, gt_type
        )
        edge_labels = _edge_labels_from_persons(node_persons, edge_index)
        has_gt = jnp.sum(gt_valid) >= 2
        label_mask = jnp.where(
            has_gt & (jnp.max(edge_labels) > 0),
            jnp.ones_like(edge_labels),
            jnp.zeros_like(edge_labels),
        )
        ones_n = jnp.ones((n,), jnp.float32)
        return dict(
            edge_labels=edge_labels, node_labels=node_labels,
            node_classes=node_classes, node_persons=node_persons,
            label_mask=label_mask, label_mask_node=ones_n,
            class_mask=node_labels,
        )

    if method in (3, 4, 5):
        radius = cfg.node_matching_radius if method == 5 else cfg.matching_radius
        sim_m = jnp.where(same_type, sim, 0.0)
        sim_orig = sim_m
        sim_m = jnp.where(sim_m < radius, 0.0, sim_m)
        col = _assign(cfg, sim_m)
        matched_row = gt_valid & (col >= 0)
        col_person, col_class = gt_person, gt_type
        node_labels, node_persons, node_classes = _labels_from_matching(
            n, col, gt_valid, gt_person, gt_type
        )
        ambiguous = jnp.zeros((n,), bool)
        if cfg.use_neighbours:
            inc = cfg.node_inclusion_radius if method == 5 else cfg.inclusion_radius
            node_labels, node_persons, node_classes, ambiguous = _neighbour_pass(
                n, sim, col, matched_row, gt_person, gt_type, inc,
                node_labels, node_persons, node_classes,
            )
        edge_labels = _edge_labels_from_persons(node_persons, edge_index)
        label_mask = _loss_mask_from_ambiguous(ambiguous, edge_index)
        label_mask = jnp.where(jnp.max(edge_labels) > 0, label_mask, 0.0)
        if method == 3:
            # loss only on GT-node subgraph (ConstructGraph.py:619)
            on_gt = (node_labels[edge_index[0]] == 1.0) & (node_labels[edge_index[1]] == 1.0)
            label_mask = label_mask * on_gt.astype(jnp.float32)
        label_mask_node = jnp.ones((n,), jnp.float32)
        if method == 5:
            best = jnp.max(sim_orig, axis=0)
            label_mask_node = jnp.where(
                (best >= 0.1) & (best <= 0.8) & (jnp.sum(gt_valid) > 0),
                0.0,
                1.0,
            )
        return dict(
            edge_labels=edge_labels, node_labels=node_labels,
            node_classes=node_classes, node_persons=node_persons,
            label_mask=label_mask, label_mask_node=label_mask_node,
            class_mask=node_labels,
        )

    if method == 7:
        # GT-injection variant: injected slots are labelled directly; the
        # original detections get a pure-agnostic single-pass matching
        # (reference method==3 branch of _construct_edge_labels_7, :987-998)
        injected = kwargs.get("injected_mask")
        if injected is None:
            injected = jnp.zeros((n,), bool)
        sim_m = jnp.where(sim < cfg.matching_radius, 0.0, sim)
        sim_m = jnp.where(injected[None, :], 0.0, sim_m)  # match real dets only
        col = _assign(cfg, sim_m)
        node_labels, node_persons, node_classes = _labels_from_matching(
            n, col, gt_valid, gt_person, gt_type
        )
        # injected detections carry their own GT identity
        inj_person = kwargs.get("injected_person")
        inj_class = kwargs.get("injected_class")
        node_labels = jnp.where(injected, 1.0, node_labels)
        node_persons = jnp.where(injected, inj_person, node_persons)
        node_classes = jnp.where(injected, inj_class, node_classes)

        edge_labels = _edge_labels_from_persons(node_persons, edge_index)
        label_mask = jnp.where(jnp.max(edge_labels) > 0, 1.0, 0.0) * jnp.ones(
            (edge_index.shape[1],), jnp.float32
        )
        return dict(
            edge_labels=edge_labels, node_labels=node_labels,
            node_classes=node_classes, node_persons=node_persons,
            label_mask=label_mask, label_mask_node=jnp.ones((n,), jnp.float32),
            class_mask=node_labels,
        )

    if method == 6:
        # semi-agnostic two-pass (reference method==2 branch, :807-829)
        sim_same = jnp.where(same_type, sim, 0.0)
        sim_same = jnp.where(sim_same < cfg.matching_radius, 0.0, sim_same)
        sim_diff = jnp.where(same_type, 0.0, sim)
        sim_diff = jnp.where(sim_diff < cfg.matching_radius, 0.0, sim_diff)

        col_same = _assign(cfg, sim_same)
        col_diff = _assign(cfg, sim_diff)
        col = jnp.where(col_same >= 0, col_same, col_diff)
        matched_row = gt_valid & (col >= 0)
        col = jnp.where(matched_row, col, -1)

        node_labels, node_persons, node_classes = _labels_from_matching(
            n, col, gt_valid, gt_person, gt_type
        )
        ambiguous = jnp.zeros((n,), bool)
        if cfg.use_neighbours:
            node_labels, node_persons, node_classes, ambiguous = _neighbour_pass(
                n, sim, col, matched_row, gt_person, gt_type, cfg.inclusion_radius,
                node_labels, node_persons, node_classes,
            )

        edge_labels = _edge_labels_from_persons(node_persons, edge_index)
        label_mask = _loss_mask_from_ambiguous(ambiguous, edge_index)
        label_mask = jnp.where(jnp.max(edge_labels) > 0, label_mask, 0.0)

        node_mask = jnp.where(ambiguous, 0.0, 1.0)
        class_mask = node_labels * node_mask
        if cfg.with_background:
            node_classes = jnp.where(
                node_labels != 1.0, cfg.num_joints, node_classes
            ).astype(jnp.int32)
            class_mask = jnp.ones((n,), jnp.float32)

        return dict(
            edge_labels=edge_labels, node_labels=node_labels,
            node_classes=node_classes, node_persons=node_persons,
            label_mask=label_mask, label_mask_node=node_mask,
            class_mask=class_mask,
        )

    raise NotImplementedError(method)


def _neighbour_pass(n, sim, col, matched_row, gt_person, gt_type, inclusion_radius,
                    node_labels, node_persons, node_classes):
    """Second pass: include near-GT detections; mask ambiguous ones.

    reference: ConstructGraph.py:883-912.
    """
    r = sim.shape[0]
    cost = jnp.where(sim < inclusion_radius, 0.0, sim)
    # remove already-chosen columns
    chosen = jnp.zeros((n + 1,), bool).at[jnp.where(col >= 0, col, n)].set(True, mode="drop")[:n]
    cost = jnp.where(chosen[None, :], 0.0, cost)
    # ambiguity counts claims from ALL GT rows — including rows that failed
    # pass-1 matching; only the claiming itself is restricted to matched rows
    # (reference order: ConstructGraph.py:886-899 computes ambiguous_dets
    # before zeroing bad_rows at :900-903)
    claims = jnp.sum(cost > 0, axis=0)
    ambiguous = claims > 1
    cost = jnp.where(ambiguous[None, :], 0.0, cost)
    # rows that were not matched in pass 1 cannot adopt neighbours
    cost = jnp.where(matched_row[:, None], cost, 0.0)
    # each remaining nonzero (row, det) pair assigns the det to that row
    claimed = jnp.any(cost > 0, axis=0)
    claim_row = jnp.argmax(cost, axis=0)  # unique claimant where claimed
    node_labels = jnp.where(claimed, 1.0, node_labels)
    node_persons = jnp.where(
        claimed, gt_person[claim_row].astype(jnp.int32), node_persons
    )
    node_classes = jnp.where(
        claimed, gt_type[claim_row].astype(jnp.int32), node_classes
    )
    return node_labels, node_persons, node_classes, ambiguous


def _loss_mask_from_ambiguous(ambiguous, edge_index):
    """reference create_loss_mask: ConstructGraph.py:1136-1158"""
    bad = ambiguous[edge_index[0]] | ambiguous[edge_index[1]]
    return jnp.where(bad, 0.0, 1.0)


def construct_graph_batch(
    cfg: GCConfig,
    scoremaps,       # (B, H, W, J)  detached heatmaps
    features,        # (B, H, W, C)  feature-gather output
    tagmaps,         # (B, H, W, J) or (B, H, W, J, S) with TTA tag channels
    joints_gt=None,  # (B, P, J, 3) or None at test time
    factors=None,    # (B, P, J)
    masks=None,      # (B, H, W) crowd masks
    testing: bool = False,
    rng=None,        # PRNGKey for method-7 GT jitter / node dropout
    gt_heatmaps=None,  # (B, h, w, J) GT heatmaps for WEIGHT_CLASS_LOSS
) -> GraphBatch:
    """Batched graph construction; returns the flattened disjoint batch graph."""
    b, h, w, j = scoremaps.shape
    k = cfg.nodes_per_type
    n = j * k

    sm = jnp.transpose(scoremaps, (0, 3, 1, 2))  # (B, J, H, W)
    det, scores, valid = joint_det_from_scoremaps(
        sm, k, cfg.detect_threshold, cfg.pool_kernel,
        mask=masks if cfg.mask_crowds else None, hybrid_k=cfg.hybrid_k,
    )

    if cfg.use_gt and joints_gt is not None:
        # replace detections with the (padded) GT joints themselves
        # (reference: ConstructGraph.py:76-87)
        det, scores, valid = _gt_as_detections(cfg, joints_gt, (h, w), n)

    injected = inj_person = inj_class = None
    if (
        cfg.edge_label_method == 7
        and not testing
        and not cfg.use_gt
        and joints_gt is not None
    ):
        det, scores, valid, injected, inj_person, inj_class = _inject_gt_detections(
            cfg, det, scores, valid, sm, joints_gt, rng
        )

    def per_image(det_i, scores_i, valid_i, features_i, tagmaps_i, joints_i,
                  factors_i, inj_i=None, inj_p_i=None, inj_c_i=None):
        node_feats = features_i[det_i[:, 1], det_i[:, 0]]  # (N, C)
        tags_i_at = tagmaps_i[det_i[:, 1], det_i[:, 0], det_i[:, 2]]
        edge_index, edge_valid = _build_edges(cfg, det_i, valid_i, scores_i, node_feats)
        # edge features are computed once on the flattened batch graph below:
        # gathers inside this vmap lower to the slow batched-gather path
        # (~2ms each at flagship shapes vs ~0.5ms flat)
        out = dict(
            x=node_feats, edge_index=edge_index,
            edge_valid=edge_valid, tags_at=tags_i_at,
        )
        if joints_i is not None:
            out.update(
                _construct_labels(
                    cfg, det_i, valid_i, edge_index, joints_i, factors_i, (h, w),
                    injected_mask=inj_i, injected_person=inj_p_i,
                    injected_class=inj_c_i,
                )
            )
        return out

    if joints_gt is not None:
        if injected is not None:
            per = jax.vmap(per_image)(
                det, scores, valid, features, tagmaps, joints_gt, factors,
                injected, inj_person, inj_class,
            )
        else:
            per = jax.vmap(
                lambda d, s, v, f, t, g, fa: per_image(d, s, v, f, t, g, fa)
            )(det, scores, valid, features, tagmaps, joints_gt, factors)
    else:
        per = jax.vmap(
            lambda d, s, v, f, t: per_image(d, s, v, f, t, None, None)
        )(det, scores, valid, features, tagmaps)

    # image-centric sampling ablation: keep label-positive nodes + 3x as many
    # random negatives, rebuild the kNN graph on the kept subset, relabel with
    # method 4 (reference: ConstructGraph.py:182-204). The padded-static-shape
    # form masks instead of slicing: dropped nodes become invalid and the
    # edge set is rebuilt among kept nodes only.
    if (
        cfg.image_centric
        and not testing
        and joints_gt is not None
        and rng is not None
    ):
        cfg4 = dataclasses.replace(cfg, edge_label_method=4)
        ic_rngs = jax.random.split(jax.random.fold_in(rng, 2), b)

        def ic_image(rng_i, det_i, scores_i, valid_i, features_i, tags_at_i,
                     nl_i, joints_i, factors_i):
            pos = valid_i & (nl_i == 1.0)
            num_pos = jnp.sum(pos)
            num_pos = jnp.where(num_pos == 0, 20, num_pos)
            neg = valid_i & ~pos
            r = jax.random.uniform(rng_i, (n,))
            r = jnp.where(neg, r, jnp.inf)
            order = jnp.argsort(r)
            rank = jnp.zeros((n,), jnp.int32).at[order].set(
                jnp.arange(n, dtype=jnp.int32)
            )
            keep = pos | (neg & (rank < 3 * num_pos))
            node_feats = features_i[det_i[:, 1], det_i[:, 0]]
            ei, ev = _build_edges(cfg4, det_i, keep, scores_i, node_feats)
            lab = _construct_labels(
                cfg4, det_i, keep, ei, joints_i, factors_i, (h, w)
            )
            return dict(keep=keep, edge_index=ei, edge_valid=ev, **lab)

        ic = jax.vmap(ic_image)(
            ic_rngs, det, scores, valid, features, per["tags_at"],
            per["node_labels"], joints_gt, factors,
        )
        valid = ic.pop("keep")
        per = dict(per, **ic)

    # flatten the batch into one disjoint graph (ConstructGraph.py:221-231)
    e = per["edge_index"].shape[-1]
    offsets = (jnp.arange(b, dtype=jnp.int32) * n)[:, None, None]
    edge_index = (per["edge_index"] + offsets).transpose(1, 0, 2).reshape(2, b * e)

    def flat(x):
        return x.reshape((-1,) + x.shape[2:])

    batch_index = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
    # edge features on the flat disjoint graph: the edge order is image-major
    # with each image's slots target-major, so flat slot s targets node s // C
    # and all per-image identities carry over
    edge_attr = _edge_features(
        cfg, det.reshape(b * n, 3), scores.reshape(b * n),
        flat(per["tags_at"]), edge_index, (h, w),
    )
    gb = GraphBatch(
        x=flat(per["x"]),
        edge_attr=edge_attr,
        edge_index=edge_index,
        joint_det=det.reshape(b * n, 3),
        joint_scores=scores.reshape(b * n),
        joint_tags=flat(per["tags_at"]),
        batch_index=batch_index,
        node_valid=valid.reshape(b * n),
        edge_valid=flat(per["edge_valid"]),
        edge_src_local=per["edge_index"][:, 0, :].reshape(b * e),
    )
    if joints_gt is not None:
        gb.edge_labels = flat(per["edge_labels"])
        gb.node_labels = flat(per["node_labels"])
        gb.node_classes = flat(per["node_classes"])
        gb.node_persons = flat(per["node_persons"])
        gb.label_mask = flat(per["label_mask"])
        gb.label_mask_node = flat(per["label_mask_node"])
        gb.class_mask = flat(per["class_mask"])
        if cfg.weight_class_loss and gt_heatmaps is not None:
            # weight the class loss by the GT heatmap value at the detection
            # (min 0.1) — reference: ConstructGraph.py:171-176
            bi = gb.batch_index
            d = gb.joint_det
            cls = jnp.clip(gb.node_classes, 0, cfg.num_joints - 1)
            hh, ww = gt_heatmaps.shape[1:3]
            yy = jnp.clip(d[:, 1], 0, hh - 1)
            xx = jnp.clip(d[:, 0], 0, ww - 1)
            weights = gt_heatmaps[bi, yy, xx, cls]
            weights = jnp.maximum(weights, 0.1)
            gb.class_mask = gb.class_mask * weights
        if cfg.node_dropout > 0 and not testing and rng is not None:
            # drop label-positive nodes with prob p; edges touching a dropped
            # node become invalid (reference: ConstructGraph.py:152-168,
            # which rebuilds the subgraph — masking is the padded equivalent)
            drop_rng = jax.random.fold_in(rng, 1)
            rnd = jax.random.bernoulli(drop_rng, cfg.node_dropout, gb.node_labels.shape)
            keep = ~(rnd & (gb.node_labels == 1.0))
            gb.node_valid = gb.node_valid & keep
            src, dst = gb.edge_index[0], gb.edge_index[1]
            gb.edge_valid = gb.edge_valid & keep[src] & keep[dst]
    return gb


def _gt_as_detections(cfg: GCConfig, joints_gt, hw, n):
    """USE_GT mode: the padded GT joints become the node set."""
    b, p, j = joints_gt.shape[:3]
    clamp_max = max(hw) - 1
    gt = joints_gt.reshape(b, p * j, 3)
    gt_valid = gt[:, :, 2] > 0
    xy = jnp.clip(jnp.round(gt[:, :, :2]), 0, clamp_max).astype(jnp.int32)
    types = jnp.tile(jnp.arange(j, dtype=jnp.int32), p)[None, :].repeat(b, axis=0)
    det = jnp.concatenate([xy, types[:, :, None]], axis=-1)
    scores = jnp.where(gt_valid, 1.0, 0.0)
    # pad/truncate to the canonical node count n
    m = p * j
    if m < n:
        det = jnp.pad(det, ((0, 0), (0, n - m), (0, 0)))
        scores = jnp.pad(scores, ((0, 0), (0, n - m)))
        gt_valid = jnp.pad(gt_valid, ((0, 0), (0, n - m)))
    else:
        det, scores, gt_valid = det[:, :n], scores[:, :n], gt_valid[:, :n]
    return det, scores, gt_valid


def _inject_gt_detections(cfg: GCConfig, det, scores, valid, sm, joints_gt, rng):
    """Method-7 GT injection: jittered GT joints become extra detections.

    The reference concatenates them (dynamic shape,
    ConstructGraph.py:88-98); here each GT joint of type t is slotted into a
    *free padded slot* of type block t, keeping N = J*K static. GT joints of
    a type whose block is full are dropped (rare: blocks hold K slots and the
    threshold mode fills far fewer).

    Returns (det, scores, valid, injected_mask, injected_person, injected_class),
    all batched.
    """
    b, j, h, w = sm.shape
    k = cfg.nodes_per_type
    p = joints_gt.shape[1]
    clamp_max = max(h, w) - 1

    gt = joints_gt.reshape(b, p * j, 3)
    gt_valid = gt[:, :, 2] > 0
    gt_type = jnp.tile(jnp.arange(j, dtype=jnp.int32), p)[None].repeat(b, axis=0)
    gt_person = jnp.repeat(jnp.arange(p, dtype=jnp.int32), j)[None].repeat(b, axis=0)

    xy = jnp.round(gt[:, :, :2]).astype(jnp.int32)
    if rng is not None:
        jitter = jax.random.randint(rng, (b, p * j, 2), -2, 3)
        xy = xy + jitter
    xy = jnp.clip(xy, 0, clamp_max)

    def per_image(det_i, scores_i, valid_i, sm_i, xy_i, gt_valid_i, gt_type_i, gt_person_i):
        # rank of each GT entry within its type (among valid GT entries)
        order = jnp.argsort(jnp.where(gt_valid_i, gt_type_i, j), stable=True)
        t_sorted = jnp.where(gt_valid_i, gt_type_i, j)[order]
        counts = jnp.zeros((j + 1,), jnp.int32).at[t_sorted].add(1, mode="drop")
        starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
        rank_sorted = jnp.arange(p * j, dtype=jnp.int32) - starts[jnp.clip(t_sorted, 0, j)]

        # free slots per type block, in slot order
        vb = valid_i.reshape(j, k)
        free_order = jnp.argsort(vb, axis=1, stable=True)  # free (False) first
        n_free = (~vb).sum(axis=1)

        # destination slot for each sorted GT entry
        t_safe = jnp.clip(t_sorted, 0, j - 1)
        slot_in_block = free_order[t_safe, jnp.clip(rank_sorted, 0, k - 1)]
        ok = (t_sorted < j) & (rank_sorted < n_free[t_safe]) & (rank_sorted < k)
        dest = jnp.where(ok, t_safe * k + slot_in_block, j * k)

        xy_sorted = xy_i[order]
        person_sorted = gt_person_i[order]
        npix = j * k
        det_new = det_i.at[dest, 0].set(jnp.where(ok, xy_sorted[:, 0], 0), mode="drop")
        det_new = det_new.at[dest, 1].set(jnp.where(ok, xy_sorted[:, 1], 0), mode="drop")
        inj = jnp.zeros((npix,), bool).at[dest].set(ok, mode="drop")
        inj_person = jnp.full((npix,), -1, jnp.int32).at[dest].set(
            jnp.where(ok, person_sorted, -1), mode="drop"
        )
        valid_new = valid_i | inj
        # injected scores come from the scoremap at the injected position
        # (ConstructGraph.py:97)
        sc_at = sm_i[det_new[:, 2], det_new[:, 1], det_new[:, 0]]
        scores_new = jnp.where(inj, sc_at, scores_i)
        inj_class = det_new[:, 2].astype(jnp.int32)
        return det_new, scores_new, valid_new, inj, inj_person, inj_class

    return jax.vmap(per_image)(det, scores, valid, sm, xy, gt_valid, gt_type, gt_person)
