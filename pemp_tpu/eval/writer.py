"""Evaluation report writer + classification metrics.

reference: src/Utils/eval.py:7-139 (EvalWriter) and
src/Utils/Utils.py:963-979 (calc_metrics), :22-34 (topk_accuracy) — numpy
only (no sklearn / torch_geometric metrics).
"""

from __future__ import annotations

import os

import numpy as np

from pemp_tpu.eval.coco_eval import coco_eval, crowd_pose_eval

COCO_PART_LABELS = [
    "nose", "eye_l", "eye_r", "ear_l", "ear_r",
    "sho_l", "sho_r", "elb_l", "elb_r", "wri_l", "wri_r",
    "hip_l", "hip_r", "kne_l", "kne_r", "ank_l", "ank_r",
]
CROWDPOSE_PART_LABELS = [
    "sho_l", "sho_r", "elb_l", "elb_r", "wri_l", "wri_r",
    "hip_l", "hip_r", "kne_l", "kne_r", "ank_l", "ank_r", "head_1", "head_2",
]


def calc_metrics(output, targets, mask=None, num_classes: int = 2):
    """Binary prec/rec/acc/F1 of the positive class. reference: Utils.py:963-979."""
    if output is None:
        return None
    output = np.asarray(output)
    targets = np.asarray(targets)
    if mask is not None:
        mask = np.asarray(mask)
        output = output[mask == 1.0]
        targets = targets[mask == 1.0]
        if len(output) == 0:
            return None
    if num_classes == 2:
        tp = float(np.sum((output == 1) & (targets == 1)))
        fp = float(np.sum((output == 1) & (targets != 1)))
        fn = float(np.sum((output != 1) & (targets == 1)))
        prec = tp / (tp + fp) if tp + fp > 0 else 0.0
        rec = tp / (tp + fn) if tp + fn > 0 else 0.0
    else:
        precs, recs = [], []
        for c in range(num_classes):
            tp = float(np.sum((output == c) & (targets == c)))
            fp = float(np.sum((output == c) & (targets != c)))
            fn = float(np.sum((output != c) & (targets == c)))
            precs.append(tp / (tp + fp) if tp + fp > 0 else 0.0)
            recs.append(tp / (tp + fn) if tp + fn > 0 else 0.0)
        prec, rec = float(np.mean(precs)), float(np.mean(recs))
    acc = float(np.mean(output == targets))
    f1 = 2 * prec * rec / (prec + rec) if prec + rec > 0 else 0.0
    return {"acc": acc, "prec": prec, "rec": rec, "f1": f1}


def topk_accuracy(output, target, topk: int = 1, mask=None):
    """reference: Utils.py:22-34."""
    output = np.asarray(output)
    target = np.asarray(target)
    if mask is not None:
        m = np.asarray(mask) == 1.0
        output = output[m]
        target = target[m]
    if len(output) == 0:
        return 0.0
    top = np.argsort(-output, axis=1)[:, :topk]
    correct = (top == target[:, None]).any(axis=1)
    return float(np.mean(correct))


def roc_auc(labels, scores) -> float:
    """Rank-based AUC (Mann-Whitney), replaces sklearn.roc_auc_score."""
    labels = np.asarray(labels).astype(bool)
    scores = np.asarray(scores, dtype=np.float64)
    n_pos = labels.sum()
    n_neg = (~labels).sum()
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = scores.argsort(kind="mergesort")
    ranks = np.empty(len(scores))
    ranks[order] = np.arange(1, len(scores) + 1)
    # average ranks for ties
    sorted_scores = scores[order]
    i = 0
    while i < len(sorted_scores):
        j = i
        while j + 1 < len(sorted_scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        if j > i:
            ranks[order[i : j + 1]] = (i + j) / 2 + 1
        i = j + 1
    return float((ranks[labels].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


class EvalWriter:
    """reference: src/Utils/eval.py:7-139."""

    def __init__(self, config, fname=None):
        th = int(config.MODEL.MPN.NODE_THRESHOLD * 100)
        self.dir = config.LOG_DIR or "tmp"
        os.makedirs(self.dir, exist_ok=True)
        self.dataset = config.DATASET.DATASET
        self.num_joints = config.DATASET.NUM_JOINTS
        assert self.dataset in ("coco", "crowd_pose")
        path = os.path.join(self.dir, fname if fname else f"eval_{th:g}.txt")
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.f = open(path, "w")

    def eval_coco(self, coco, anns, ids, description, dt_file_name="dt.json"):
        print(description)
        if self.dataset == "coco":
            stats = coco_eval(coco, anns, ids, tmp_dir=self.dir, dt_file_name=dt_file_name)
            self.f.write(description + "\n")
            self.f.write(f"AP       : {stats[0]: 3f} \n")
            self.f.write(f"AP    0.5: {stats[1]: 3f} \n")
            self.f.write(f"AP   0.75: {stats[2]: 3f} \n")
            self.f.write(f"AP medium: {stats[3]: 3f} \n")
            self.f.write(f"AP  large: {stats[4]: 3f} \n")
        else:
            stats = crowd_pose_eval(coco, anns, ids, tmp_dir=self.dir, dt_file_name=dt_file_name)
            self.f.write(description + "\n")
            self.f.write(f"AP         : {stats[0]: 3f} \n")
            self.f.write(f"AP      0.5: {stats[1]: 3f} \n")
            self.f.write(f"AP     0.75: {stats[2]: 3f} \n")
            self.f.write(f"AR         : {stats[3]: 3f} \n")
            self.f.write(f"AP     easy: {stats[6]: 3f} \n")
            self.f.write(f"AP   medium: {stats[7]: 3f} \n")
            self.f.write(f"AP     hard: {stats[8]: 3f} \n")
        return stats

    def eval_metrics(self, eval_dict, description):
        out = {k: float(np.mean(v)) for k, v in eval_dict.items()}
        print(description)
        print(out)
        self.f.write(description + "\n")
        self.f.write(str(out) + "\n")

    def eval_metric(self, eval_list, description):
        value = float(np.mean(eval_list))
        print(description, value)
        self.f.write(description + "\n" + str(value) + "\n")

    def eval_speed(self, *args):
        assert len(args) % 2 == 0
        print("Runtime measurement")
        self.f.write("Runtime measurement\n")
        for i in range(0, len(args), 2):
            line = f"{args[i]}: {np.mean(args[i + 1])}"
            print(line)
            self.f.write(line + " \n")

    def eval_part_metrics(self, eval_dict, description):
        part_labels = (
            COCO_PART_LABELS if self.dataset == "coco" else CROWDPOSE_PART_LABELS
        )
        print(description)
        self.f.write(description + " \n")
        for i in range(self.num_joints):
            m = {k: float(np.mean(v)) for k, v in eval_dict[i].items()}
            line = (
                f"{part_labels[i]} acc: {m['acc']:3f} prec: {m['prec']:3f} "
                f"rec: {m['rec']:3f} f1: {m['f1']:3f}"
            )
            print(line)
            self.f.write(line + "\n")

    def eval_roc_auc(self, eval_dict, description):
        print(description)
        self.f.write(description + " \n")
        node = eval_dict.get("node")
        if node:
            pred = np.asarray(node["pred"])
            label = np.asarray(node["label"]).astype(int)
            line = f"node roc_auc: {roc_auc(label, pred)}"
            print(line)
            self.f.write(line + "\n")
            classes = np.asarray(node["class"])
            for i in range(self.num_joints):
                m = classes == i
                if m.sum() == 0:
                    continue
                line = f"{COCO_PART_LABELS[i]}  roc_auc: {roc_auc(label[m], pred[m])}"
                print(line)
                self.f.write(line + "\n")

    def close(self):
        self.f.close()
