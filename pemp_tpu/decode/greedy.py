"""Greedy person construction (host-side).

reference: src/Utils/Utils.py:517-626 (greedy_person_construction) — the
CC_METHOD="greedy" decode mode: type-ordered greedy claiming over the
symmetrized edge-score adjacency with score-based reassignment. Inherently
sequential; runs on host over the (small) thresholded node set.
"""

from __future__ import annotations

import numpy as np


def greedy_person_construction(joint_det, preds_nodes, preds_edges, preds_classes,
                               edge_index, num_joints: int):
    """Returns (persons (P, J, 3), person_labels (N,))."""
    joint_det = np.asarray(joint_det).copy()
    preds_nodes = np.asarray(preds_nodes)
    preds_edges = np.asarray(preds_edges)
    edge_index = np.asarray(edge_index)
    if preds_classes is not None:
        joint_det[:, 2] = np.asarray(preds_classes).argmax(axis=1)

    n = len(joint_det)
    adj = np.zeros((n, n), dtype=np.float64)
    adj[edge_index[0], edge_index[1]] = preds_edges
    adj = (adj.T + adj) / 2.0
    adj[np.diag_indices(n)] = 1.0

    taken = np.zeros(n, dtype=np.int64) - 1
    for jtype in range(num_joints):
        type_joints = joint_det[:, 2] == jtype
        for i in range(n):
            if not type_joints[i] or taken[i] != -1:
                continue
            if preds_nodes[i] < 0.5:
                continue
            taken[i] = i
            for j in range(num_joints):
                if j == jtype:
                    continue
                other_type = joint_det[:, 2] != j
                tmp = adj[i, :].copy()
                tmp[other_type] = 0.0
                target_score = tmp.max()
                target_idx = int(tmp.argmax())
                if target_score == 0.0 or target_idx == i:
                    continue
                if taken[target_idx] != -1:
                    first_score = adj[taken[target_idx], target_idx]
                    if first_score > target_score:
                        continue
                    taken[target_idx] = i
                else:
                    taken[target_idx] = i

    persons = []
    for core in range(int(taken.max()) + 1 if taken.max() >= 0 else 0):
        sel = taken == core
        person_joints = joint_det[sel]
        person_scores = preds_nodes[sel]
        if len(person_joints) > 1:
            keypoints = np.zeros((num_joints, 3))
            for jtype in range(num_joints):
                m = person_joints[:, 2] == jtype
                if m.sum():
                    idx = int(np.argmax(person_scores[m]))
                    keypoints[jtype] = person_joints[m][idx]
                    keypoints[jtype, 2] = float(person_scores[m].max())
            if (keypoints[:, 2] > 0).sum() > 0:
                persons.append(keypoints)
    return np.asarray(persons, np.float64).reshape(-1, num_joints, 3), taken
