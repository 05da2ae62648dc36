from pemp_tpu.models.hourglass import PoseNet, hg_process_output
from pemp_tpu.models.hrnet import (
    HRNetSpec,
    PoseHigherResolutionNet,
    hr_process_output,
)
from pemp_tpu.models.mpn import get_mpn_model
from pemp_tpu.models.pose_estimation import PoseEstimationBaseline, build_pose_model

__all__ = [
    "PoseEstimationBaseline",
    "build_pose_model",
    "PoseNet",
    "hg_process_output",
    "HRNetSpec",
    "PoseHigherResolutionNet",
    "hr_process_output",
    "get_mpn_model",
]
