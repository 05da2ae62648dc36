"""Composite model: backbone -> graph constructor -> MPN -> heads.

TPU-native re-design of the reference's PoseEstimationBaseline
(reference: src/Models/PoseEstimation/PoseEstimation.py:53-111). The whole
forward — CNN backbone, detection, graph construction, label matching, 10 MPN
steps and heads — is one jit-compiled static-shape program; the reference
crossed device<->host every batch for scipy matching.

Output pytree keys mirror the reference's dict contract so losses/decoding
port 1:1.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from pemp_tpu.graph.constructor import GCConfig, construct_graph_batch
from pemp_tpu.models.hourglass import PoseNet, hg_process_output
from pemp_tpu.models.hrnet import HRNetSpec, PoseHigherResolutionNet, hr_process_output
from pemp_tpu.models.mpn.models import get_mpn_model, mpn_cfg_from_config


class PoseEstimationBaseline(nn.Module):
    """backbone + feature_gather conv + graph constructor + MPN."""

    backbone_name: str               # "hrnet" | "hourglass" | "mmpose_hrnet"
    hrnet_spec: Any                  # HRNetSpec or None
    hg_cfg: tuple                    # (nstack, inp_dim, oup_dim) or None
    gc: GCConfig
    mpn_cfg: dict
    num_joints: int = 17
    feature_gather_kernel: int = 3
    node_input_dim: int = 128
    scoremap_mode: str = "avg"
    dtype: Any = jnp.float32

    def setup(self):
        if self.backbone_name in ("hrnet", "mmpose_hrnet"):
            self.backbone = PoseHigherResolutionNet(self.hrnet_spec, dtype=self.dtype)
        elif self.backbone_name == "hourglass":
            nstack, inp_dim, oup_dim = self.hg_cfg
            self.backbone = PoseNet(nstack, inp_dim, oup_dim, dtype=self.dtype)
        else:
            raise NotImplementedError(self.backbone_name)
        # reference: PoseEstimation.py:63-66
        self.feature_gather = nn.Conv(
            self.node_input_dim,
            (self.feature_gather_kernel,) * 2,
            padding="SAME",
            use_bias=True,
            dtype=self.dtype,
            name="feature_gather",
        )
        self.mpn = get_mpn_model(self.mpn_cfg, dtype=self.dtype)

    def backbone_forward(self, imgs, train: bool = False, backbone_train: bool | None = None):
        """Run backbone + process_output + feature_gather only.

        Used by the TTA path which aggregates over scales before graphing.
        Returns (bb_outputs, scoremaps, features, tags), all NHWC fp32.
        """
        bt = train if backbone_train is None else backbone_train
        bb_out, feat = self.backbone(imgs, train=bt)
        if self.backbone_name in ("hrnet", "mmpose_hrnet"):
            scoremaps, features, tags = hr_process_output(
                bb_out, feat, self.num_joints, self.scoremap_mode
            )
        else:
            scoremaps, features, tags = hg_process_output(
                bb_out, feat, self.num_joints, self.scoremap_mode
            )
        features = self.feature_gather(features)
        return bb_out, scoremaps.astype(jnp.float32), features.astype(jnp.float32), tags.astype(jnp.float32)

    def mpn_forward(self, gb, train: bool = False, with_logits: bool = True,
                    feature_maps=None):
        """Run the MPN on a constructed GraphBatch.

        ``feature_maps``: raw backbone feature map for the SelfAttention
        variant (reference kwarg plumbing: PoseEstimation.py:89-94).
        """
        preds = self.mpn(
            gb.x,
            gb.edge_attr,
            gb.edge_index,
            node_types=gb.joint_det[:, 2],
            node_valid=gb.node_valid,
            edge_valid=gb.edge_valid,
            joint_tags=gb.joint_tags,
            node_labels=gb.node_labels,
            batch_index=gb.batch_index,
            feature_maps=feature_maps,
            edge_src_local=gb.edge_src_local,
            train=train,
        )
        if not with_logits:
            if preds["edge"] and preds["edge"][-1] is not None:
                preds["edge"][-1] = jax.nn.sigmoid(preds["edge"][-1])
            if preds["node"] and preds["node"][-1] is not None:
                preds["node"][-1] = jax.nn.sigmoid(preds["node"][-1])
            if preds["class"] is not None and preds["class"]:
                preds["class"][-1] = jax.nn.softmax(preds["class"][-1], axis=-1)
        return preds

    def __call__(self, imgs, keypoints_gt=None, masks=None, factors=None,
                 heatmaps=None, train: bool = False, backbone_train: bool | None = None,
                 with_logits: bool = True, gc_rng=None):
        """reference forward: PoseEstimation.py:71-111."""
        bb_out, scoremaps, features, tags = self.backbone_forward(
            imgs, train=train, backbone_train=backbone_train
        )
        scoremaps_det = jax.lax.stop_gradient(scoremaps)

        if gc_rng is None and train and (
            self.gc.edge_label_method == 7 or self.gc.node_dropout > 0
        ):
            gc_rng = self.make_rng("gc") if self.has_rng("gc") else None

        gb = construct_graph_batch(
            self.gc,
            scoremaps_det,
            features,
            jax.lax.stop_gradient(tags),
            joints_gt=keypoints_gt,
            factors=factors,
            masks=masks,
            testing=not train,
            rng=gc_rng,
            gt_heatmaps=heatmaps[-1] if (heatmaps is not None and self.gc.weight_class_loss) else None,
        )
        preds = self.mpn_forward(
            gb, train=train, with_logits=with_logits, feature_maps=features
        )

        output = {
            "labels": {
                "edge": gb.edge_labels,
                "node": gb.node_labels,
                "class": gb.node_classes,
                "person": gb.node_persons,
                "batch_index": gb.batch_index,
            },
            "masks": {
                "edge": _and_mask(gb.label_mask, gb.edge_valid),
                "node": _and_mask(gb.label_mask_node, gb.node_valid),
                "class": _and_mask(gb.class_mask, gb.node_valid),
                "node_valid": gb.node_valid,
                "edge_valid": gb.edge_valid,
            },
            "preds": {
                "edge": preds["edge"],
                "node": preds["node"],
                "class": preds["class"],
                "heatmap": bb_out,
                "tag": preds["tag"],
            },
            "graph": {
                "nodes": gb.joint_det,
                "detector_scores": gb.joint_scores,
                "edge_index": gb.edge_index,
                "tags": tags,
                "node_valid": gb.node_valid,
                "edge_valid": gb.edge_valid,
                "batch_index": gb.batch_index,
            },
        }
        return scoremaps, output


def _and_mask(mask, valid):
    if mask is None:
        return None
    return mask * valid.astype(jnp.float32)


def build_pose_model(config, dtype=jnp.float32) -> PoseEstimationBaseline:
    """Factory from the config tree. reference get_pose_model: PoseEstimation.py:14-38
    (checkpoint loading lives in pemp_tpu.train.checkpoint)."""
    backbone_name = config.MODEL.KP
    hrnet_spec = None
    hg_cfg = None
    if backbone_name in ("hrnet", "mmpose_hrnet"):
        hrnet_spec = HRNetSpec.from_config(config)
        s2d = config.TPU.S2D_DECONV if "S2D_DECONV" in config.TPU else -1
        if s2d < 0:
            import jax as _jx

            s2d = 1 if _jx.default_backend() == "tpu" else 0
        if s2d:
            import dataclasses as _dc

            hrnet_spec = _dc.replace(hrnet_spec, s2d_eval=True)
    else:
        hg_cfg = (
            config.MODEL.HG.NSTACK,
            config.MODEL.HG.INPUT_DIM,
            config.MODEL.HG.OUTPUT_DIM,
        )
    gc = GCConfig.from_config(config)
    mpn_cfg = mpn_cfg_from_config(config.MODEL.MPN)
    if gc.target_major and gc.graph_type == "knn":
        # tell the MPN that edges arrive in target-major blocks so it uses
        # dense per-block aggregation instead of segment scatters (block size
        # must mirror the builder's internal k clamp)
        n_nodes = gc.num_joints * gc.nodes_per_type
        k_eff = min(gc.knn_k, max(n_nodes - 1, 1))
        mpn_cfg["_BLOCKED_C"] = k_eff + gc.knn_cap_in
        if not gc.use_gt:
            # detections are type-blocked (type(n) == (n // K) mod J), so
            # per-edge source types are pure index arithmetic — a TPU s32
            # gather of E elements costs ~3ms at flagship shapes, the
            # arithmetic is free. USE_GT swaps in person-major GT nodes,
            # which breaks the blocked-type identity.
            mpn_cfg["_NODES_PER_TYPE"] = gc.nodes_per_type
        import jax as _jax

        use_pallas = True
        if "USE_PALLAS" in config.TPU:
            use_pallas = bool(config.TPU.USE_PALLAS)
        mpn_cfg["_USE_PALLAS"] = use_pallas and _jax.default_backend() == "tpu"
        # typed message projection: the fused Pallas kernel wins on TPU
        # (54.9 vs 45.4 img/s measured on the w48/640 bench — its all-types
        # matmul waste is cheaper than the einsum path's extra E-sized HBM
        # gathers, and the symmetric layout the einsum path needs costs a
        # further 2.4 img/s of constructor bookkeeping); the reverse-
        # permutation einsum path replaces the plain all-types dots on
        # non-TPU backends. "auto" therefore resolves by backend — it MUST
        # stay consistent with GCConfig.from_config (the einsum path is only
        # correct on the symmetric layout).
        msg_pass = config.TPU.MSG_PASS if "MSG_PASS" in config.TPU else "auto"
        if msg_pass == "auto":
            if _jax.default_backend() != "tpu":
                msg_pass = "einsum"
            elif not bool(config.TPU.COLLECT_AUX):
                # eval entries (bench/valid/TTA) run COLLECT_AUX=False: the
                # fully-fused step kernel is the fastest TPU eval path
                # (72.2 vs 62.4 img/s on the w48/640 bench). Training keeps
                # the per-op kernel whose backward Pallas kernel is tuned
                # (the fused step's VJP is a jnp recompute).
                msg_pass = "fused_step"
            else:
                msg_pass = "pallas"
        if msg_pass in ("einsum", "hybrid") and mpn_cfg.get("_NODES_PER_TYPE"):
            # hybrid = rev_perm einsum projection + slim aggregation kernel;
            # einsum = full jnp path (kernel off)
            mpn_cfg["_TYPED_EINSUM"] = True
        if msg_pass in ("einsum", "dots"):
            mpn_cfg["_USE_PALLAS"] = False
        if msg_pass == "fused_step" and mpn_cfg.get("_NODES_PER_TYPE"):
            # fully-fused step kernel (x_j gather + edge MLP + typed message
            # + attention aggregation in one Pallas call per step)
            mpn_cfg["_FUSED_STEP"] = True
        unroll_cfg = config.TPU.SCAN_UNROLL if "SCAN_UNROLL" in config.TPU else -1
        budget = (
            config.TPU.COMPILE_BUDGET if "COMPILE_BUDGET" in config.TPU else "full"
        )
        if unroll_cfg < 0:
            # full unroll on TPU (XLA hoists the loop-invariant edge-MLP
            # halves: +3.7 img/s); rolled elsewhere to keep CPU test compiles
            # fast. TPU.COMPILE_BUDGET=low keeps the scan rolled on TPU too —
            # the unrolled 10-step flagship program is the dominant cold
            # XLA-compile cliff (IMPLEMENTATION_NOTES "Compile cost")
            mpn_cfg["_SCAN_UNROLL"] = (
                config.MODEL.MPN.STEPS
                if _jax.default_backend() == "tpu" and budget != "low"
                else 1
            )
        elif unroll_cfg > 1:
            mpn_cfg["_SCAN_UNROLL"] = unroll_cfg
    if "COLLECT_AUX" in config.TPU:
        mpn_cfg["_COLLECT_AUX"] = bool(config.TPU.COLLECT_AUX)
    return PoseEstimationBaseline(
        backbone_name=backbone_name,
        hrnet_spec=hrnet_spec,
        hg_cfg=hg_cfg,
        gc=gc,
        mpn_cfg=mpn_cfg,
        num_joints=config.DATASET.NUM_JOINTS,
        feature_gather_kernel=config.MODEL.FEATURE_GATHER_KERNEL,
        node_input_dim=config.MODEL.MPN.NODE_INPUT_DIM,
        scoremap_mode=config.MODEL.HRNET.SCOREMAP_MODE,
        dtype=dtype,
    )
