"""Associative-embedding grouping baseline (HigherHRNet-style).

``match_by_tag`` is a deliberately *faithful port* of the reference
algorithm (src/Utils/hr_utils/group.py:42-117 and src/Utils/Utils.py:
1493-1578 mpn_match_by_tag): its exact iteration order, tie-breaking,
group-key insertion and dtype promotion are load-bearing for AP parity,
and the reference-decode golden tests pin them bit-for-bit. NMS + top-k
run on device via pemp_tpu.ops; the sequential joint-order Munkres
matching runs on host (it is inherently sequential and tiny).

Used by the valid_hr backbone-parity path, the AE eval fallback for
tag-regression MPN variants, and the PlainTag/TagThreshold models.
"""

from __future__ import annotations

import numpy as np



def min_cost_match(cost: np.ndarray) -> np.ndarray:
    """Munkres complete min-cost assignment; returns (k, 2) row/col pairs.

    Runs the classical 6-step Munkres algorithm (pemp_tpu/decode/munkres.py)
    — the same algorithm family and deterministic scan order as the
    reference's munkres package (group.py:35-39 py_max_match) — so the
    tie-breaking between equally optimal assignments (common with the
    round(d)*100 - score cost form) follows the classical algorithm's
    order, not scipy's arbitrary internal order. Optimal-cost equality vs
    scipy and tie-order determinism are tested in
    tests/test_ae_grouping.py; the PyPI munkres package itself is not
    installable in this environment, so parity with it is structural
    (same steps, same scan order), not empirical.

    Rectangular costs with rows > cols are valid here: the callers pad
    with 1e10 columns first (group.py:84-91), and Munkres pads to square
    internally like the reference package.
    """
    if cost.size == 0:
        return np.zeros((0, 2), np.int32)
    from pemp_tpu.decode.munkres import min_cost_pairs

    return min_cost_pairs(cost)


class Params:
    """reference: group.py:120-133."""

    def __init__(self, cfg=None, num_joints=17, max_num_people=30):
        if cfg is not None:
            num_joints = cfg.DATASET.NUM_JOINTS
            max_num_people = cfg.DATASET.MAX_NUM_PEOPLE
        self.num_joints = num_joints
        self.max_num_people = max_num_people
        self.detection_threshold = 0.1
        self.tag_threshold = 1.0
        self.use_detection_val = True
        self.ignore_too_much = False
        if num_joints == 17:
            self.joint_order = [
                i - 1 for i in [1, 2, 3, 4, 5, 6, 7, 12, 13, 8, 9, 10, 11, 14, 15, 16, 17]
            ]
        else:
            self.joint_order = list(range(num_joints))


def match_by_tag(tag_k, loc_k, val_k, params: Params):
    """Sequential joint-order greedy/Munkres tag matching.

    tag_k: (J, K, D), loc_k: (J, K, 2), val_k: (J, K).
    reference: group.py:42-117. Returns (P, J, 3 + D).
    """
    default_ = np.zeros((params.num_joints, 3 + tag_k.shape[2]))
    joint_dict = {}
    tag_dict = {}
    for i in range(params.num_joints):
        idx = params.joint_order[i]
        tags = tag_k[idx]
        joints = np.concatenate((loc_k[idx], val_k[idx, :, None], tags), 1)
        mask = joints[:, 2] > params.detection_threshold
        tags = tags[mask]
        joints = joints[mask]
        if joints.shape[0] == 0:
            continue
        if i == 0 or len(joint_dict) == 0:
            for tag, joint in zip(tags, joints):
                key = tag[0]
                joint_dict.setdefault(key, np.copy(default_))[idx] = joint
                tag_dict[key] = [tag]
        else:
            grouped_keys = list(joint_dict.keys())[: params.max_num_people]
            grouped_tags = [np.mean(tag_dict[k], axis=0) for k in grouped_keys]
            if params.ignore_too_much and len(grouped_keys) == params.max_num_people:
                continue
            diff = joints[:, None, 3:] - np.array(grouped_tags)[None, :, :]
            diff_normed = np.linalg.norm(diff, ord=2, axis=2)
            diff_saved = np.copy(diff_normed)
            if params.use_detection_val:
                diff_normed = np.round(diff_normed) * 100 - joints[:, 2:3]
            num_added, num_grouped = diff.shape[0], diff.shape[1]
            if num_added > num_grouped:
                diff_normed = np.concatenate(
                    [diff_normed, np.zeros((num_added, num_added - num_grouped)) + 1e10],
                    axis=1,
                )
            pairs = min_cost_match(diff_normed)
            for row, col in pairs:
                if (
                    row < num_added
                    and col < num_grouped
                    and diff_saved[row][col] < params.tag_threshold
                ):
                    key = grouped_keys[col]
                    joint_dict[key][idx] = joints[row]
                    tag_dict[key].append(tags[row])
                else:
                    key = tags[row][0]
                    joint_dict.setdefault(key, np.copy(default_))[idx] = joints[row]
                    tag_dict[key] = [tags[row]]
    return np.array(list(joint_dict.values())).astype(np.float32).reshape(
        -1, params.num_joints, 3 + tag_k.shape[2]
    )


def mpn_match_by_tag(joint_det, tag_k, scores, params: Params):
    """match_by_tag on MPN node lists. reference: Utils.py:1493-1578.

    Joints stay in *natural node order* within each type (the reference
    iterates the raw detection list; sorting or truncating changes the
    Munkres tie-breaking and the group-key insertion order, which shifts
    assignments on crowded scenes — verified by the reference golden test).
    """
    j = params.num_joints
    per_type = [np.where(joint_det[:, 2] == t)[0] for t in range(j)]
    k = max(max((len(s) for s in per_type), default=1), 1)
    # dtype mix mirrors the reference exactly: tags stay float32 (group keys
    # and running tag means), while the joint rows promote to float64 via the
    # int64-coordinate concat — round()/threshold sit on exact boundaries
    tag_j = np.zeros((j, k, tag_k.shape[1]), np.float32)
    loc_j = np.zeros((j, k, 2), np.float64)
    val_j = np.zeros((j, k), np.float64)
    for t, sel in enumerate(per_type):
        n = len(sel)
        tag_j[t, :n] = tag_k[sel]
        loc_j[t, :n] = joint_det[sel, :2]
        val_j[t, :n] = scores[sel]
    ans = match_by_tag(tag_j, loc_j, val_j, params)
    return ans[:, :, :3]


class HeatmapParser:
    """AE baseline parser: NMS -> per-joint top-K -> tag matching.

    reference: group.py:135-301. Maps stay numpy here; the device variant of
    NMS/top-k lives in pemp_tpu.ops.detection and feeds this via arrays.
    """

    def __init__(self, cfg=None, num_joints=17, max_num_people=30, nms_kernel=5):
        self.params = Params(cfg, num_joints, max_num_people)
        self.nms_kernel = (
            cfg.TEST.NMS_KERNEL if cfg is not None and "NMS_KERNEL" in cfg.TEST else nms_kernel
        )
        self.tag_per_joint = True

    def top_k(self, det: np.ndarray, tag: np.ndarray):
        """det: (J, H, W); tag: (J, H, W) or (J, H, W, D)."""
        import jax.numpy as jnp

        from pemp_tpu.ops.detection import nms_mask

        j, h, w = det.shape
        peaks = np.asarray(nms_mask(jnp.asarray(det), self.nms_kernel))
        masked = det * peaks
        if tag.ndim == 3:
            tag = tag[..., None]
        k = self.params.max_num_people
        flat = masked.reshape(j, -1)
        ind = np.argsort(-flat, axis=1, kind="stable")[:, :k]
        # float64 loc/val: the reference's int64 torch indices promote the
        # matching's joint rows to float64 (tags stay float32) — round()/
        # threshold comparisons in match_by_tag sit on exact boundaries
        val_k = np.take_along_axis(flat, ind, axis=1).astype(np.float64)
        tag_flat = tag.reshape(j, h * w, -1)
        tag_k = np.stack(
            [np.take_along_axis(tag_flat[..., d], ind, axis=1) for d in range(tag_flat.shape[-1])],
            axis=-1,
        ).astype(np.float32)
        x = (ind % w).astype(np.float64)
        y = (ind // w).astype(np.float64)
        loc_k = np.stack([x, y], axis=-1)
        return tag_k, loc_k, val_k

    def adjust(self, ans, det):
        """Quarter-pixel shift. reference: group.py:191-210."""
        from pemp_tpu.decode.assembly import adjust_quarter
        import jax.numpy as jnp

        out = np.asarray(adjust_quarter(jnp.asarray(det), jnp.asarray(ans[:, :, :3])))
        ans = ans.copy()
        ans[:, :, :3] = out
        return ans

    def refine(self, det, tag, keypoints, fill_score=None):
        """Single-person AE refine. reference: group.py:212-275.

        ``fill_score``: score assigned to in-filled joints. None keeps the
        group.py behavior (heatmap value at the fill position); the MPN eval
        path passes 0.001 to match Utils.py refine (Utils.py:1026-1104,
        used by valid.py perd_to_ann_ae), which pins in-filled joints to a
        fixed low score so they barely affect the person's mean score.
        """
        if tag.ndim == 3:
            tag = tag[..., None]
        tags = [
            tag[i, int(keypoints[i, 1]), int(keypoints[i, 0])]
            for i in range(keypoints.shape[0])
            if keypoints[i, 2] > 0
        ]
        if not tags:
            return keypoints
        prev_tag = np.mean(tags, axis=0)
        ans = []
        for i in range(keypoints.shape[0]):
            tmp = det[i]
            tt = np.sqrt(((tag[i] - prev_tag[None, None, :]) ** 2).sum(axis=2))
            tmp2 = tmp - np.round(tt)
            y, x = np.unravel_index(np.argmax(tmp2), tmp.shape)
            val = tmp[y, x]
            xf, yf = x + 0.5, y + 0.5
            xf += 0.25 if tmp[y, min(x + 1, tmp.shape[1] - 1)] > tmp[y, max(x - 1, 0)] else -0.25
            yf += 0.25 if tmp[min(y + 1, tmp.shape[0] - 1), x] > tmp[max(y - 1, 0), x] else -0.25
            ans.append((xf, yf, val))
        ans = np.array(ans)
        keypoints = keypoints.copy()
        for i in range(det.shape[0]):
            if ans[i, 2] > 0 and keypoints[i, 2] == 0:
                keypoints[i, :2] = ans[i, :2]
                keypoints[i, 2] = ans[i, 2] if fill_score is None else fill_score
        return keypoints

    def parse(self, det, tag, adjust=True, refine=True, scoring="default"):
        """det: (J, H, W); tag: (J, H, W[, D]). Returns (persons, scores)."""
        ans = match_by_tag(*self.top_k(det, tag), self.params)
        if adjust and len(ans):
            ans = self.adjust(ans, det)
        if scoring == "default":
            scores = [p[:, 2].mean() for p in ans]
        else:
            scores = [
                p[p[:, 2] > 0.009, 2].mean() if (p[:, 2] > 0.009).any() else 0.0
                for p in ans
            ]
        if refine and len(ans):
            tag4 = tag if tag.ndim == 4 else tag[..., None]
            ans = np.stack([self.refine(det, tag4, p[:, :3]) for p in ans])
        else:
            ans = ans[:, :, :3] if len(ans) else ans
        return ans, scores


def cluster_cc(heatmaps, tagmaps, num_joints, nms_kernel=5, cc_method="GAEC",
               detect_threshold=0.1, max_per_type=30):
    """AE tags + correlation clustering grouping.

    reference: group.py:304-392. heatmaps (J, H, W); tagmaps (J, H, W[, D]).
    Returns persons (P, J, 3).
    """
    import jax.numpy as jnp

    from pemp_tpu.cluster import cluster_labels
    from pemp_tpu.ops.detection import nms_mask

    if tagmaps.ndim == 3:
        tagmaps = tagmaps[..., None]
    j, h, w = heatmaps.shape
    peaks = np.asarray(nms_mask(jnp.asarray(heatmaps), nms_kernel)) * heatmaps
    dets, det_scores, det_tags = [], [], []
    for t in range(j):
        ys, xs = np.nonzero(peaks[t] >= detect_threshold)
        order = np.argsort(-peaks[t][ys, xs])[:max_per_type]
        for o in order:
            dets.append((xs[o], ys[o], t))
            det_scores.append(peaks[t][ys[o], xs[o]])
            det_tags.append(tagmaps[t, ys[o], xs[o]])
    if len(dets) < 2:
        return np.zeros((0, num_joints, 3), np.float32)
    dets = np.array(dets)
    det_scores = np.array(det_scores)
    det_tags = np.array(det_tags)

    n = len(dets)
    src, dst, wts = [], [], []
    for a in range(n):
        for b in range(a + 1, n):
            d = np.linalg.norm(det_tags[a] - det_tags[b])
            # tag distance -> affinity in [0,1] -> shifted weight
            wts.append(0.5 - min(d / 2.0, 1.0))
            src.append(a)
            dst.append(b)
    labels = cluster_labels(
        np.stack([np.array(src), np.array(dst)]), np.array(wts), n, cc_method
    )
    persons = []
    for lab in np.unique(labels):
        sel = np.where(labels == lab)[0]
        if len(sel) < 2:
            continue
        kp = np.zeros((num_joints, 3), np.float32)
        for t in range(num_joints):
            cand = sel[dets[sel, 2] == t]
            if len(cand):
                best = cand[np.argmax(det_scores[cand])]
                kp[t] = (dets[best, 0], dets[best, 1], det_scores[best])
        if (kp[:, 2] > 0).sum() > 0:
            persons.append(kp)
    return np.array(persons, np.float32).reshape(-1, num_joints, 3)
