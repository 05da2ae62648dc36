"""Upper-bound model: GT labels passed through as predictions.

Measures the AP ceiling of the detection + graph + label-construction stack
independently of any learned MPN (reference: src/Models/PoseEstimation/
UpperBound.py:72-137). The feature gather is a 3x3 average pool instead of a
learned conv; edge/node predictions ARE the constructed labels.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from pemp_tpu.graph.constructor import GCConfig, construct_graph_batch
from pemp_tpu.models.hourglass import PoseNet, hg_process_output
from pemp_tpu.models.hrnet import HRNetSpec, PoseHigherResolutionNet, hr_process_output


class UpperBoundModel(nn.Module):
    backbone_name: str
    hrnet_spec: Any
    hg_cfg: Any
    gc: GCConfig
    num_joints: int = 17
    scoremap_mode: str = "avg"
    dtype: Any = jnp.float32

    def setup(self):
        if self.backbone_name in ("hrnet", "mmpose_hrnet"):
            self.backbone = PoseHigherResolutionNet(self.hrnet_spec, dtype=self.dtype)
        else:
            nstack, inp_dim, oup_dim = self.hg_cfg
            self.backbone = PoseNet(nstack, inp_dim, oup_dim, dtype=self.dtype)

    def __call__(self, imgs, keypoints_gt, masks=None, factors=None, heatmaps=None,
                 train: bool = False):
        bb_out, feat = self.backbone(imgs, train=False)
        if self.backbone_name in ("hrnet", "mmpose_hrnet"):
            scoremaps, features, tags = hr_process_output(
                bb_out, feat, self.num_joints, self.scoremap_mode
            )
        else:
            scoremaps, features, tags = hg_process_output(
                bb_out, feat, self.num_joints, self.scoremap_mode
            )
        # 3x3 avg-pool feature gather (UpperBound.py:78)
        features = jax.lax.reduce_window(
            features, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
        ) / 9.0

        gb = construct_graph_batch(
            self.gc,
            scoremaps.astype(jnp.float32),
            features.astype(jnp.float32),
            tags.astype(jnp.float32),
            joints_gt=keypoints_gt,
            factors=factors,
            masks=masks,
            testing=not train,
        )
        node_classes_onehot = (
            jax.nn.one_hot(gb.node_classes, self.num_joints)
            if gb.node_classes is not None
            else None
        )
        output = {
            "labels": {
                "edge": gb.edge_labels, "node": gb.node_labels,
                "class": gb.node_classes, "refine": gb.node_persons,
            },
            "masks": {"edge": gb.label_mask, "node": gb.label_mask_node},
            "preds": {
                "edge": gb.edge_labels, "node": gb.node_labels,
                "class": node_classes_onehot, "heatmap": bb_out[0],
            },
            "graph": {
                "nodes": gb.joint_det, "detector_scores": gb.joint_scores,
                "edge_index": gb.edge_index, "tags": tags,
                "node_valid": gb.node_valid, "edge_valid": gb.edge_valid,
            },
        }
        return scoremaps, output


def build_upper_bound_model(config, dtype=jnp.float32) -> UpperBoundModel:
    """reference get_upper_bound_model: UpperBound.py:38-70."""
    backbone_name = config.UB.KP
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
    return UpperBoundModel(
        backbone_name=backbone_name,
        hrnet_spec=hrnet_spec,
        hg_cfg=hg_cfg,
        gc=GCConfig.from_config(config),
        num_joints=config.DATASET.NUM_JOINTS,
        scoremap_mode=config.MODEL.HRNET.SCOREMAP_MODE,
        dtype=dtype,
    )
