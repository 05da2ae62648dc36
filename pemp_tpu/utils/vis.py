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
