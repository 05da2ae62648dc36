"""Backbone-only model for the AE-grouping baseline eval (valid_hr path).

reference: src/Models/PoseEstimation/PoseEstimationAeGroup.py:8-249 and
PoseEstimationHourglass.py:15-202 — produce image-resolution heatmaps + tags
from the backbone alone; grouping happens in pemp_tpu.decode.ae_grouping.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from pemp_tpu.models.hourglass import PoseNet, hg_process_output
from pemp_tpu.models.hrnet import HRNetSpec, PoseHigherResolutionNet, hr_process_output


class PoseEstimationAeGroup(nn.Module):
    backbone_name: str
    hrnet_spec: Any
    hg_cfg: Any
    num_joints: int = 17
    scoremap_mode: str = "avg"
    dtype: Any = jnp.float32

    def setup(self):
        if self.backbone_name in ("hrnet", "mmpose_hrnet"):
            self.backbone = PoseHigherResolutionNet(self.hrnet_spec, dtype=self.dtype)
        else:
            nstack, inp_dim, oup_dim = self.hg_cfg
            self.backbone = PoseNet(nstack, inp_dim, oup_dim, dtype=self.dtype)

    def backbone_forward(self, imgs, train: bool = False, backbone_train=None):
        """TTAPipeline-compatible signature (no learned feature gather)."""
        bb_out, scoremaps, tags = self(imgs, train=train)
        return bb_out, scoremaps, jnp.zeros_like(scoremaps), tags

    def __call__(self, imgs, train: bool = False):
        bb_out, feat = self.backbone(imgs, train=train)
        if self.backbone_name in ("hrnet", "mmpose_hrnet"):
            scoremaps, features, tags = hr_process_output(
                bb_out, feat, self.num_joints, self.scoremap_mode
            )
        else:
            scoremaps, features, tags = hg_process_output(
                bb_out, feat, self.num_joints, self.scoremap_mode
            )
        return (
            bb_out,
            scoremaps.astype(jnp.float32),
            tags.astype(jnp.float32),
        )


def build_ae_group_model(config, dtype=jnp.float32) -> PoseEstimationAeGroup:
    """reference get_hr_model / get_hg_model: PoseEstimationAeGroup.py:8-26,
    PoseEstimationHourglass.py:15-31."""
    backbone_name = config.MODEL.KP
    hrnet_spec = None
    hg_cfg = None
    if backbone_name in ("hrnet", "mmpose_hrnet"):
        hrnet_spec = HRNetSpec.from_config(config)
    else:
        hg_cfg = (
            config.MODEL.HG.NSTACK,
            config.MODEL.HG.INPUT_DIM,
            config.MODEL.HG.OUTPUT_DIM,
        )
    return PoseEstimationAeGroup(
        backbone_name=backbone_name,
        hrnet_spec=hrnet_spec,
        hg_cfg=hg_cfg,
        num_joints=config.DATASET.NUM_JOINTS,
        scoremap_mode=config.MODEL.HRNET.SCOREMAP_MODE,
        dtype=dtype,
    )
