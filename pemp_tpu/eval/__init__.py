from pemp_tpu.eval.coco_eval import (
    COCO_SIGMAS,
    CROWDPOSE_SIGMAS,
    KeypointEval,
    coco_eval,
    compute_oks,
    crowd_pose_eval,
)
from pemp_tpu.eval.writer import (
    EvalWriter,
    calc_metrics,
    roc_auc,
    topk_accuracy,
)

__all__ = [
    "COCO_SIGMAS",
    "CROWDPOSE_SIGMAS",
    "KeypointEval",
    "coco_eval",
    "compute_oks",
    "crowd_pose_eval",
    "EvalWriter",
    "calc_metrics",
    "roc_auc",
    "topk_accuracy",
]
