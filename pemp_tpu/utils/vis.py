"""Minimal pose visualization (matplotlib; no cv2).

reference: src/Utils/Utils.py:1180-1442 (save_valid_image / add_joints with
per-dataset skeleton tables). Ports the COCO and CrowdPose skeletons and the
image+pose overlay used by the draw scripts.
"""

from __future__ import annotations

import numpy as np

COCO_SKELETON = [
    (15, 13), (13, 11), (16, 14), (14, 12), (11, 12), (5, 11), (6, 12),
    (5, 6), (5, 7), (6, 8), (7, 9), (8, 10), (1, 2), (0, 1), (0, 2),
    (1, 3), (2, 4), (3, 5), (4, 6),
]
CROWDPOSE_SKELETON = [
    (0, 2), (1, 3), (2, 4), (3, 5), (0, 1), (6, 8), (7, 9), (8, 10),
    (9, 11), (6, 7), (0, 13), (1, 13), (12, 13),
]


def add_joints(ax, joints, color, skeleton):
    for a, b in skeleton:
        if a < len(joints) and b < len(joints):
            if joints[a, 2] > 0 and joints[b, 2] > 0:
                ax.plot(
                    [joints[a, 0], joints[b, 0]],
                    [joints[a, 1], joints[b, 1]],
                    color=color, linewidth=1.5,
                )
    vis = joints[:, 2] > 0
    ax.scatter(joints[vis, 0], joints[vis, 1], s=8, c=[color], zorder=3)


def save_valid_image(image, persons, fname, dataset="COCO", gt_persons=None):
    """Overlay predicted (and optionally GT) poses on the image and save."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    skeleton = COCO_SKELETON if dataset.upper() == "COCO" else CROWDPOSE_SKELETON
    fig, ax = plt.subplots(figsize=(8, 8 * image.shape[0] / max(image.shape[1], 1)))
    img = np.asarray(image)
    if img.max() > 1.5:
        img = img / 255.0
    ax.imshow(np.clip(img, 0, 1))
    cmap = plt.get_cmap("tab10")
    for i, person in enumerate(np.asarray(persons)):
        add_joints(ax, person, cmap(i % 10), skeleton)
    if gt_persons is not None:
        for person in np.asarray(gt_persons):
            add_joints(ax, person, (1.0, 1.0, 1.0, 0.8), skeleton)
    ax.axis("off")
    fig.savefig(fname, bbox_inches="tight", dpi=110)
    plt.close(fig)


def draw_detections(image, joint_det, valid, fname):
    """Scatter raw keypoint candidates colored by type.

    reference: draw_detection* (Utils.py:43-...).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    img = np.asarray(image)
    if img.max() > 1.5:
        img = img / 255.0
    ax.imshow(np.clip(img, 0, 1))
    det = np.asarray(joint_det)[np.asarray(valid)]
    cmap = plt.get_cmap("tab20")
    ax.scatter(det[:, 0], det[:, 1], s=10, c=[cmap(int(t) % 20) for t in det[:, 2]])
    ax.axis("off")
    fig.savefig(fname, bbox_inches="tight", dpi=110)
    plt.close(fig)


def _prep_axes(image):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    img = np.asarray(image)
    if img.max() > 1.5:
        img = img / 255.0
    ax.imshow(np.clip(img, 0, 1))
    ax.axis("off")
    return fig, ax, plt


def draw_detection_with_cluster(image, joint_det, person_labels, valid, fname,
                                num_joints: int = 17):
    """Detections colored by cluster id (reference: Utils.py:43-78 — HSV hue
    spread over clusters; here a categorical colormap)."""
    fig, ax, plt = _prep_axes(image)
    det = np.asarray(joint_det)
    lab = np.asarray(person_labels)
    v = np.asarray(valid)
    cmap = plt.get_cmap("tab20")
    ax.scatter(det[v, 0], det[v, 1], s=12,
               c=[cmap(int(l) % 20) for l in lab[v]])
    fig.savefig(f"{fname}_det_cluster.png", bbox_inches="tight", dpi=110)
    plt.close(fig)


def draw_detection_classification_result(image, joint_det, joint_labels, valid,
                                         fname):
    """Detections colored by binary node label: green = true keypoint,
    red = false positive (reference: Utils.py:231-258, hues [0, 120])."""
    fig, ax, plt = _prep_axes(image)
    det = np.asarray(joint_det)
    lab = np.asarray(joint_labels).astype(int)
    v = np.asarray(valid)
    colors = np.where(lab[v, None] > 0, [[0.1, 0.8, 0.1]], [[0.9, 0.1, 0.1]])
    ax.scatter(det[v, 0], det[v, 1], s=12, c=colors)
    fig.savefig(f"{fname}_det_fp.png", bbox_inches="tight", dpi=110)
    plt.close(fig)


def _edge_color(score):
    # reference buckets edge confidence into 4 hue bands (Utils.py:1292)
    if score > 0.75:
        return (0.1, 0.7, 0.1)
    if score > 0.5:
        return (0.6, 0.8, 0.1)
    if score > 0.25:
        return (0.95, 0.6, 0.1)
    return (0.9, 0.1, 0.1)


def draw_edges_conf(image, joint_det, person_labels, preds_nodes, edge_index,
                    preds_edges, valid, fname, focus_type: int = 0):
    """Per-cluster focus joint with its in-edges colored by edge confidence
    (reference: Utils.py:1270-1352). For each cluster, picks the
    highest-scoring node of ``focus_type`` and draws every incident edge."""
    fig, ax, plt = _prep_axes(image)
    det = np.asarray(joint_det)
    lab = np.asarray(person_labels)
    v = np.asarray(valid)
    ns = np.asarray(preds_nodes)
    ei = np.asarray(edge_index)
    es = np.asarray(preds_edges)
    for person in np.unique(lab[v]):
        sel = v & (lab == person)
        if sel.sum() < 2:
            continue
        scores = np.where(sel & (det[:, 2] == focus_type), ns, -1.0)
        if scores.max() <= -1.0:
            continue
        focus = int(np.argmax(scores))
        inc = ei[1] == focus
        for src, s in zip(ei[0][inc], es[inc]):
            if not v[src]:
                continue
            ax.plot([det[focus, 0], det[src, 0]], [det[focus, 1], det[src, 1]],
                    color=_edge_color(float(s)), linewidth=1.0, alpha=0.8)
        ax.scatter([det[focus, 0]], [det[focus, 1]], s=20, c="white", zorder=3)
    fig.savefig(f"{fname}_edge_conf.png", bbox_inches="tight", dpi=110)
    plt.close(fig)


def draw_inter_person_edge_conf(image, joint_det, person_labels, preds_nodes,
                                edge_index, preds_edges, valid, type_to_draw,
                                fname, num_joints: int = 17):
    """Edges from each cluster's best ``type_to_draw`` node to the best node
    of every type in *other* clusters, colored by edge confidence
    (reference: Utils.py:1355-1442)."""
    fig, ax, plt = _prep_axes(image)
    det = np.asarray(joint_det)
    lab = np.asarray(person_labels)
    v = np.asarray(valid)
    ns = np.asarray(preds_nodes)
    ei = np.asarray(edge_index)
    es = np.asarray(preds_edges)
    persons = np.unique(lab[v])
    for person in persons:
        sel = v & (lab == person)
        if sel.sum() < 2:
            continue
        scores = np.where(sel & (det[:, 2] == type_to_draw), ns, -1.0)
        if scores.max() <= -1.0:
            continue
        focus = int(np.argmax(scores))
        inc = ei[1] == focus
        src_idx = ei[0][inc]
        edge_sc = es[inc]
        for other in persons:
            if other == person:
                continue
            src_person = v[src_idx] & (lab[src_idx] == other)
            if src_person.sum() < 2:
                continue
            for other_type in range(num_joints):
                m = src_person & (det[src_idx, 2] == other_type)
                if not m.any():
                    continue
                k = int(np.argmax(np.where(m, ns[src_idx], -1.0)))
                s, si = float(edge_sc[k]), int(src_idx[k])
                ax.plot([det[focus, 0], det[si, 0]], [det[focus, 1], det[si, 1]],
                        color=_edge_color(s), linewidth=0.8, alpha=0.7)
        ax.scatter([det[focus, 0]], [det[focus, 1]], s=20, c="white", zorder=3)
    fig.savefig(f"{fname}_inter_per_edge_conf_{type_to_draw}.png",
                bbox_inches="tight", dpi=110)
    plt.close(fig)
