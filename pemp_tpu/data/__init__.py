from pemp_tpu.data.coco_api import COCO
from pemp_tpu.data.datasets import (
    CocoKeypoints,
    CocoKeypointsTest,
    CrowdPoseKeypoints,
    DataLoader,
    OCHumans,
    default_collate,
)
from pemp_tpu.data.targets import (
    HeatmapGenerator,
    JointsGenerator,
    ScaleAwareHeatmapGenerator,
    filter_visible,
    pack_for_batch,
)
from pemp_tpu.data.transforms import (
    FLIP_CONFIG,
    transforms_hr_train,
    transforms_to_tensor,
)

# reference-name aliases (data/__init__.py:1-6)
CocoKeypoints_hr = CocoKeypoints
CocoKeypoints_hg = CocoKeypoints
CocoKeypoints_test = CocoKeypointsTest

__all__ = [
    "COCO",
    "CocoKeypoints",
    "CocoKeypoints_hr",
    "CocoKeypoints_hg",
    "CocoKeypoints_test",
    "CocoKeypointsTest",
    "CrowdPoseKeypoints",
    "DataLoader",
    "OCHumans",
    "default_collate",
    "HeatmapGenerator",
    "JointsGenerator",
    "ScaleAwareHeatmapGenerator",
    "filter_visible",
    "pack_for_batch",
    "FLIP_CONFIG",
    "transforms_hr_train",
    "transforms_to_tensor",
]
