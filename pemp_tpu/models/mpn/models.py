"""MPN model zoo + factory on padded static-shape graphs.

All models share the reference's forward contract
(reference: src/Models/MessagePassingNetwork/NodeClassificationMPNSimple.py:62-97):

    (x, edge_attr, edge_index, node_types, ...) ->
        dict(edge=[(E,) logits per aux step], node=[(N,)], class=[(N, C)],
             tag=[(N,) or None])

with padded nodes/edges carried through and masked by validity. The
message-passing steps share weights, so they run under ``lax.scan`` via
``nn.scan`` — one compiled step body instead of 10 unrolled copies.

Factory name surface matches the reference's get_mpn_model
(reference: src/Models/MessagePassingNetwork/__init__.py:27-73) so experiment
YAMLs resolve unchanged; research-zoo ablations collapse onto the shared
implementations where architecturally identical.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from pemp_tpu.models.mpn.layers import (
    MLP,
    MPLayer,
    TypeAwareMPNLayer,
    num_summary_types,
    sum_node_types,
)


def _mlp_cfg(node, key, default=None):
    if key in node:
        return node[key]
    return default


class LateFusionEdgeMLP(nn.Module):
    """Position + connection-type fused late.

    reference: NodeClassificationMPNSimple.py:7-21.
    """

    output_sizes: tuple
    bn: bool
    end_with_relu: bool
    num_joints: int = 17
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, edge_attr, valid=None, train: bool = False):
        single = [s // 2 for s in self.output_sizes[:-1]]
        pos = edge_attr[:, :2]
        conn = edge_attr[:, 2:]
        p = MLP(single, bn=self.bn, end_with_relu=self.end_with_relu, dtype=self.dtype, name="pos_mlp")(
            pos, valid, train
        )
        c = MLP(single, bn=self.bn, end_with_relu=self.end_with_relu, dtype=self.dtype, name="edge_mlp")(
            conn, valid, train
        )
        h = nn.relu(jnp.concatenate([p, c], axis=-1))
        return nn.Dense(self.output_sizes[-1], dtype=self.dtype, name="out")(h)


class _StepBody(nn.Module):
    """One shared-weight message-passing step (scanned)."""

    mpn_cfg: dict
    num_types: int
    skip: bool
    dtype: Any = jnp.float32
    collect: bool = True  # stack per-step outputs (needed for aux losses)

    @nn.compact
    def __call__(self, carry, static):
        node_features, edge_features = carry
        init_nodes = static["init_nodes"]
        init_edges = static["init_edges"]
        edge_index = static["edge_index"]
        node_types = static["node_types"]
        edge_valid = static["edge_valid"]
        pre = static["pre"]
        c = self.mpn_cfg
        if self.skip:
            nf = jnp.concatenate([init_nodes, node_features], axis=-1)
            ef = jnp.concatenate([init_edges, edge_features], axis=-1)
        else:
            nf, ef = node_features, edge_features

        blocked_c = c.get("_BLOCKED_C", 0)
        if c["AGGR_TYPE"] == "agnostic":
            new_nodes, new_edges = MPLayer(
                c["NODE_FEATURE_DIM"],
                c["EDGE_FEATURE_DIM"],
                c["EDGE_FEATURE_HIDDEN"],
                aggr=c["AGGR"],
                use_node_update_mlp=c["USE_NODE_UPDATE_MLP"],
                edge_mlp=c["EDGE_MLP"],
                num_types=self.num_types,
                blocked_c=blocked_c,
                dtype=self.dtype,
                name="layer",
            )(nf, ef, edge_index, node_types, edge_valid, pre=pre)
        else:
            new_nodes, new_edges = TypeAwareMPNLayer(
                c["NODE_FEATURE_DIM"],
                c["EDGE_FEATURE_DIM"],
                c["EDGE_FEATURE_HIDDEN"],
                aggr=c["AGGR"],
                edge_mlp=c["EDGE_MLP"],
                num_types=self.num_types,
                aggr_sub=c["AGGR_SUB"],
                update_type=c["UPDATE_TYPE"],
                blocked_c=blocked_c,
                use_fused_kernel=c.get("_USE_PALLAS", False),
                pallas_interpret=c.get("_PALLAS_INTERPRET", False),
                raw_types=c["NUM_JOINTS"],
                nodes_per_type=c.get("_NODES_PER_TYPE", 0),
                dtype=self.dtype,
                name="layer",
            )(nf, ef, edge_index, node_types, edge_valid, pre=pre)

        ys = (new_nodes, new_edges) if self.collect else None
        return (new_nodes, new_edges), ys


def _run_steps(parent, mpn_cfg, num_types, skip, steps, node_features, edge_features,
               edge_index, node_types, edge_valid, dtype, name, collect=True,
               edge_src_local=None):
    """Scan the shared-weight step; returns per-step (nodes, edges) stacks.

    Loop-invariant inputs (edge index, per-edge source/target types and the
    kernel-layout casts of types/validity) are precomputed once and passed as
    a broadcast argument — inside the scan body they'd be regathered every
    step, which costs ~40% of the MPN's device time at flagship shapes.
    """
    j, i = edge_index[0], edge_index[1]
    blocked_c = mpn_cfg.get("_BLOCKED_C", 0)
    if blocked_c:
        dst_type = jnp.repeat(node_types, blocked_c, axis=0)
    else:
        dst_type = node_types[i]
    npt = mpn_cfg.get("_NODES_PER_TYPE", 0)
    if npt:
        # type-blocked detections: type(n) == (n // K) mod J — index
        # arithmetic instead of a (slow) s32 gather; summarization applied
        # to the derived raw types matches node_types exactly
        raw = (j // npt) % mpn_cfg["NUM_JOINTS"]
        src_type = sum_node_types(mpn_cfg["NODE_TYPE_SUMMARY"], raw)
    else:
        src_type = node_types[j]
    pre_extra = {}
    if skip:
        # with skip connections each step gathers x_j from concat(init, cur);
        # the init half is loop-invariant, so gather it once and let the
        # layer's split edge MLP consume it — halves the per-step gather bytes
        # matmul-transpose backward for the scatter-add in this gather's
        # autodiff transpose where the blocked layout allows (eligibility
        # rule lives in ops/gather_mm.py)
        from pemp_tpu.ops.gather_mm import gather_rows_mm_or_plain

        n_img_g = mpn_cfg["NUM_JOINTS"] * npt if npt else 0
        xj_init = gather_rows_mm_or_plain(node_features, j, n_img_g)
        pre_extra = {
            "xj_init": xj_init,
            "init_dim": node_features.shape[-1],
        }
    e = src_type.shape[0]
    pre = {
        "src_type": src_type,
        "dst_type": dst_type,
        "src_type2d": src_type.astype(jnp.int32).reshape(e, 1),
        **pre_extra,
    }
    if edge_valid is not None:
        pre["valid2d"] = edge_valid.astype(jnp.int32).reshape(e, 1)
    if (
        mpn_cfg.get("_FUSED_STEP")
        and blocked_c
        and npt
        and skip
        and edge_valid is not None
    ):
        # fully-fused step kernel: source indices local to their image (kNN
        # never crosses images and nodes are n_img-aligned, so j % n_img is
        # exact; the constructor's pre-offset indices skip even that) + the
        # edge-carry split point for the loop-invariant q half
        n_img = mpn_cfg["NUM_JOINTS"] * npt
        src_local = (
            edge_src_local if edge_src_local is not None else j % n_img
        )
        pre["src_local2d"] = src_local.astype(jnp.int32).reshape(e, 1)
        pre["init_edge_dim"] = edge_features.shape[-1]
        pre["fused_step"] = True
    if mpn_cfg.get("_TYPED_EINSUM") and blocked_c and npt and edge_valid is not None:
        # loop-invariant reverse-edge involution: enables the zero-waste
        # statically-type-blocked message projection (requires the symmetric
        # target-major layout, see GCConfig.knn_symmetric)
        from pemp_tpu.ops.knn import reverse_edge_perm

        num_nodes = node_features.shape[0]
        pre["rev_perm"] = reverse_edge_perm(j, edge_valid, num_nodes, blocked_c)
        summary = mpn_cfg["NODE_TYPE_SUMMARY"]
        if summary and summary != "not":
            pre["type_sum_map"] = sum_node_types(
                summary, jnp.arange(mpn_cfg["NUM_JOINTS"], dtype=jnp.int32)
            )
    static = {
        "init_nodes": node_features,
        "init_edges": edge_features,
        "edge_index": edge_index,
        "node_types": node_types,
        "edge_valid": edge_valid,
        "pre": pre,
    }
    scanned = nn.scan(
        _StepBody,
        variable_broadcast="params",
        split_rngs={"params": False},
        in_axes=nn.broadcast,
        length=steps,
        # unrolling lets XLA CSE/hoist the loop-invariant half of the edge
        # MLP (xj_init / init_edges projections recomputed every step under
        # a rolled scan) at the cost of a bigger compile (+3.7 img/s on the
        # w48/640 TPU bench)
        unroll=max(1, min(int(mpn_cfg.get("_SCAN_UNROLL", 1)), steps)),
    )(mpn_cfg, num_types, skip, dtype, collect, name=name, parent=parent)
    carry = (node_features, edge_features)
    carry, ys = scanned(carry, static)
    node_stack, edge_stack = ys if collect else (None, None)
    return carry[0], carry[1], node_stack, edge_stack


class NodeClassificationMPN(nn.Module):
    """Flagship: shared-weight MP steps + edge/node/class heads.

    reference: NodeClassificationMPNSimple.py:23-97.
    """

    mpn_cfg: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, edge_attr, edge_index, node_types, node_valid=None,
                 edge_valid=None, joint_tags=None, train: bool = False, **kwargs):
        c = self.mpn_cfg
        num_types = num_summary_types(c["NODE_TYPE_SUMMARY"], c["NUM_JOINTS"])
        types = sum_node_types(c["NODE_TYPE_SUMMARY"], node_types)

        if c["LATE_FUSION_POS"]:
            edge_features = LateFusionEdgeMLP(
                tuple(c["EDGE_EMB"]["OUTPUT_SIZES"]),
                c["EDGE_EMB"]["BN"],
                c["EDGE_EMB"].get("END_WITH_RELU", False),
                dtype=self.dtype,
                name="edge_embedding",
            )(edge_attr, edge_valid, train)
        else:
            edge_features = MLP(
                tuple(c["EDGE_EMB"]["OUTPUT_SIZES"]),
                bn=c["EDGE_EMB"]["BN"],
                end_with_relu=c["EDGE_EMB"].get("END_WITH_RELU", False),
                dtype=self.dtype,
                name="edge_embedding",
            )(edge_attr, edge_valid, train)
        node_features = MLP(
            tuple(c["NODE_EMB"]["OUTPUT_SIZES"]),
            bn=c["NODE_EMB"]["BN"],
            end_with_relu=c["NODE_EMB"].get("END_WITH_RELU", False),
            dtype=self.dtype,
            name="node_embedding",
        )(x, node_valid, train)

        steps = c["STEPS"]
        node_steps = c.get("NODE_STEPS", 0)
        aux = c["AUX_LOSS_STEPS"]

        # the fused kernel has a custom VJP (backward Pallas kernel), so the
        # fused path serves training and inference alike
        c_run = dict(c)
        # pure-eval entries set _COLLECT_AUX=False: only the final step feeds
        # decode, so the per-step output stacks (~570MB of HBM writes at
        # flagship shapes) and the aux head passes are skipped
        collect = train or c.get("_COLLECT_AUX", True)

        node_features, edge_features, node_stack, edge_stack = _run_steps(
            self, c_run, num_types, c["SKIP"], steps, node_features, edge_features,
            edge_index, types, edge_valid, self.dtype, "mpn", collect=collect,
            edge_src_local=kwargs.get("edge_src_local"),
        )

        edge_head = MLP(tuple(c["EDGE_CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="edge_classification")
        node_head = MLP(tuple(c["NODE_CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="node_classification")
        class_head = MLP(tuple(c["CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="classification")

        preds_edge, preds_node, preds_class = [], [], []
        if collect:
            for i in range(steps):
                if i >= steps - aux - 1:
                    preds_node.append(node_head(node_stack[i], node_valid, train)[..., 0])
                    preds_class.append(class_head(node_stack[i], node_valid, train))
                    preds_edge.append(edge_head(edge_stack[i], edge_valid, train)[..., 0])
        else:
            preds_edge.append(edge_head(edge_features, edge_valid, train)[..., 0])

        if node_steps:
            node_features, edge_features, _, _ = _run_steps(
                self, c_run, num_types, c["SKIP"], node_steps, node_features, edge_features,
                edge_index, types, edge_valid, self.dtype, "mpn_node",
            )
        preds_node.append(node_head(node_features, node_valid, train)[..., 0])
        preds_class.append(class_head(node_features, node_valid, train))

        return {
            "edge": preds_edge,
            "node": preds_node,
            "class": preds_class,
            "tag": [None],
        }


class VanillaMPN(nn.Module):
    """Edge-only classification MPN. reference: VanillaMPN.py:78-116.

    DROP_FEATURE (reference factory __init__.py:29-30 routes to a
    VanillaMPNFeatureDrop whose file is absent from the reference tree):
    'edge_dist' zeroes the dx/dy columns of the edge attributes — the
    feature-importance ablation the train/model_39_* configs run.
    """

    mpn_cfg: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, edge_attr, edge_index, node_types, node_valid=None,
                 edge_valid=None, joint_tags=None, train: bool = False, **kwargs):
        c = self.mpn_cfg
        drop = c.get("DROP_FEATURE", "")
        if drop == "edge_dist":
            # edge attrs lead with [dx, dy] (graph.constructor._edge_features)
            edge_attr = edge_attr.at[:, :2].set(0.0)
        elif drop:
            raise NotImplementedError(f"DROP_FEATURE={drop!r}")
        edge_features = MLP(
            tuple(c["EDGE_EMB"]["OUTPUT_SIZES"]), bn=c["BN"],
            end_with_relu=c["NODE_EMB"].get("END_WITH_RELU", False),
            dtype=self.dtype, name="edge_embedding",
        )(edge_attr, edge_valid, train)
        node_features = MLP(
            tuple(c["NODE_EMB"]["OUTPUT_SIZES"]), bn=c["BN"],
            end_with_relu=c["NODE_EMB"].get("END_WITH_RELU", False),
            dtype=self.dtype, name="node_embedding",
        )(x, node_valid, train)

        cfg = dict(c)
        cfg["AGGR_TYPE"] = "agnostic"
        _, _, node_stack, edge_stack = _run_steps(
            self, cfg, c["NUM_JOINTS"], c["SKIP"], c["STEPS"], node_features,
            edge_features, edge_index, node_types, edge_valid, self.dtype, "mpn",
        )
        edge_head = MLP(tuple(c["EDGE_CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="edge_classification")
        preds_edge = []
        for i in range(c["STEPS"]):
            if i >= c["STEPS"] - c["AUX_LOSS_STEPS"] - 1:
                preds_edge.append(edge_head(edge_stack[i], edge_valid, train)[..., 0])
        return {"edge": preds_edge, "node": [None], "class": None, "tag": [None]}


class JointTypeClassification(nn.Module):
    """Class-only model. reference: JointTypeClassification.py."""

    mpn_cfg: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, edge_attr, edge_index, node_types, node_valid=None,
                 edge_valid=None, joint_tags=None, train: bool = False, **kwargs):
        c = self.mpn_cfg
        num_types = num_summary_types(c["NODE_TYPE_SUMMARY"], c["NUM_JOINTS"])
        types = sum_node_types(c["NODE_TYPE_SUMMARY"], node_types)
        edge_features = MLP(
            tuple(c["EDGE_EMB"]["OUTPUT_SIZES"]), bn=c["EDGE_EMB"]["BN"],
            end_with_relu=c["EDGE_EMB"].get("END_WITH_RELU", False),
            dtype=self.dtype, name="edge_embedding",
        )(edge_attr, edge_valid, train)
        node_features = MLP(
            tuple(c["NODE_EMB"]["OUTPUT_SIZES"]), bn=c["NODE_EMB"]["BN"],
            end_with_relu=c["NODE_EMB"].get("END_WITH_RELU", False),
            dtype=self.dtype, name="node_embedding",
        )(x, node_valid, train)
        _, _, node_stack, _ = _run_steps(
            self, c, num_types, c["SKIP"], c["STEPS"], node_features, edge_features,
            edge_index, types, edge_valid, self.dtype, "mpn",
        )
        class_head = MLP(tuple(c["CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="classification")
        return {
            "edge": [None],
            "node": [None],
            "class": [class_head(node_stack[-1], node_valid, train)],
            "tag": [None],
        }


class NodeClassificationMPNTag(nn.Module):
    """MPN with a per-node tag regression head.

    reference: NodeClassificationMPNTag.py:7-90.
    """

    mpn_cfg: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, edge_attr, edge_index, node_types, node_valid=None,
                 edge_valid=None, joint_tags=None, train: bool = False, **kwargs):
        c = self.mpn_cfg
        num_types = num_summary_types(c["NODE_TYPE_SUMMARY"], c["NUM_JOINTS"])
        types = sum_node_types(c["NODE_TYPE_SUMMARY"], node_types)
        edge_features = MLP(
            tuple(c["EDGE_EMB"]["OUTPUT_SIZES"]), bn=c["EDGE_EMB"]["BN"],
            end_with_relu=c["EDGE_EMB"].get("END_WITH_RELU", False),
            dtype=self.dtype, name="edge_embedding",
        )(edge_attr, edge_valid, train)
        node_features = MLP(
            tuple(c["NODE_EMB"]["OUTPUT_SIZES"]), bn=c["NODE_EMB"]["BN"],
            end_with_relu=c["NODE_EMB"].get("END_WITH_RELU", False),
            dtype=self.dtype, name="node_embedding",
        )(x, node_valid, train)

        node_f, edge_f, _, _ = _run_steps(
            self, c, num_types, c["SKIP"], c["STEPS"], node_features, edge_features,
            edge_index, types, edge_valid, self.dtype, "mpn",
        )
        tag_head = MLP(tuple(c["NODE_TAG"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="tag_pred")
        tag = tag_head(node_f, node_valid, train)[..., 0]
        if c.get("TAG_SKIP", False) and joint_tags is not None:
            if joint_tags.ndim == 2:  # TTA tag channels: skip from their mean
                joint_tags = jnp.mean(joint_tags, axis=-1)
            tag = tag + joint_tags

        node_steps = c.get("NODE_STEPS", 0)
        if node_steps:
            node_f, edge_f, _, _ = _run_steps(
                self, c, num_types, c["SKIP"], node_steps, node_f, edge_f,
                edge_index, types, edge_valid, self.dtype, "mpn_node",
            )
        node_head = MLP(tuple(c["NODE_CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="node_classification")
        class_head = MLP(tuple(c["CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="classification")
        return {
            "edge": [None],
            "node": [node_head(node_f, node_valid, train)[..., 0]],
            "class": [class_head(node_f, node_valid, train)],
            "tag": [tag],
        }


class TagThreshold(nn.Module):
    """No-learning baseline: edge pred = tag-distance < 1.

    reference: TagThreshold.py.
    """

    mpn_cfg: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, edge_attr, edge_index, node_types, node_valid=None,
                 edge_valid=None, joint_tags=None, train: bool = False, **kwargs):
        return {
            "edge": [(edge_attr[:, 0] < 1.0).astype(jnp.float32)],
            "node": [None],
            "class": None,
            "tag": [None],
        }


class PlainTag(nn.Module):
    """No-learning baseline: edge pred = raw tag feature. reference: PlainTag.py."""

    mpn_cfg: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, edge_attr, edge_index, node_types, node_valid=None,
                 edge_valid=None, joint_tags=None, train: bool = False, **kwargs):
        return {
            "edge": [edge_attr[:, 0]],
            "node": [None],
            "class": None,
            "tag": [None],
        }


class LogisticEdgeClassifier(nn.Module):
    """Logistic regression on raw edge features. reference: LogisticEdgeClassifier.py."""

    mpn_cfg: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, edge_attr, edge_index, node_types, node_valid=None,
                 edge_valid=None, joint_tags=None, train: bool = False, **kwargs):
        logits = nn.Dense(1, dtype=self.dtype, name="linear")(edge_attr)[..., 0]
        return {"edge": [logits], "node": [None], "class": None, "tag": [None]}


# names the reference factory resolves (MessagePassingNetwork/__init__.py:27-73);
# architecturally-identical research ablations share an implementation, the
# genuinely distinct ones live in zoo.py
def _zoo(name):
    import pemp_tpu.models.mpn.zoo as zoo

    return getattr(zoo, name)


_MODELS = {
    "VanillaMPN": VanillaMPN,
    "VanillaMPN2": lambda cfg, dtype: _zoo("VanillaMPN2")(cfg, dtype=dtype),
    "ClassificationMPN": lambda cfg, dtype: _zoo("ClassificationMPN")(cfg, dtype=dtype),
    "ClassificationMPNSimple": lambda cfg, dtype: _zoo("ClassificationMPNSimple")(cfg, dtype=dtype),
    "ClassificationMPNSimple2": lambda cfg, dtype: _zoo("ClassificationMPNSimple2")(cfg, dtype=dtype),
    "NodeClassificationMPN": NodeClassificationMPN,
    # reference NodeClassificationMPNWithBackground.py is absent from the
    # reference tree (broken import, SURVEY §3 caveat); the background
    # behaviour is the flagship + WITH_BACKGROUND labels/losses
    "NodeClassificationMPNWithBackground": NodeClassificationMPN,
    "NodeClassificationMPNTypeBased": lambda cfg, dtype: _zoo("NodeClassificationMPNTypeBased")(cfg, dtype=dtype),
    "NodeClassificationMPNAttention": lambda cfg, dtype: _zoo("NodeClassificationMPNAttention")(cfg, dtype=dtype),
    "NodeClassificationMPNSelfAttention": lambda cfg, dtype: _zoo("NodeClassificationMPNSelfAttention")(cfg, dtype=dtype),
    "NodeClassificationMPNWithRef": lambda cfg, dtype: _zoo("NodeClassificationMPNSimpleWithRef")(cfg, dtype=dtype),
    "NodeClassificationMPNFPConstrained": lambda cfg, dtype: _zoo("NodeClassificationMPNFPConstrained")(cfg, dtype=dtype),
    "NodeClassificationMPNTypeConstrained": lambda cfg, dtype: _zoo("NodeClassificationMPNTypeConstrained")(cfg, dtype=dtype),
    "NodeClassificationMPNGroupBased": NodeClassificationMPN,  # overridden below
    "JointTypeClassification": JointTypeClassification,
    "NodeClassificationMPNTag": NodeClassificationMPNTag,
    "MPNTag": lambda cfg, dtype: _zoo("MPNTag")(cfg, dtype=dtype),
    "LogisticEdgeClassifier": LogisticEdgeClassifier,
    "TagThreshold": TagThreshold,
    "PlainTag": PlainTag,
}


def mpn_cfg_from_config(mpn_config) -> dict:
    """Freeze the open MPN config subtree into a plain dict for module attrs."""
    d = mpn_config.to_dict() if hasattr(mpn_config, "to_dict") else dict(mpn_config)
    d.setdefault("NODE_STEPS", 0)
    return d


def get_mpn_model(mpn_config, dtype=jnp.float32):
    """Factory. reference: MessagePassingNetwork/__init__.py:27-73."""
    cfg = mpn_cfg_from_config(mpn_config)
    name = cfg["NAME"]
    if name in ("ClassificationNaive", "NodeClassificationMPNGroupBasedHierach"):
        # the reference's own imports for these are broken: neither
        # ClassificationNaive.py nor NodeClassificationMPNGroupBasedHierach.py
        # exists in its tree (MessagePassingNetwork/__init__.py:6,16), so the
        # configs naming them cannot run there either
        raise NotImplementedError(
            f"{name}: class absent from the reference repository "
            "(broken import in its MessagePassingNetwork/__init__.py)"
        )
    if name not in _MODELS:
        raise NotImplementedError(name)
    return _MODELS[name](cfg, dtype=dtype)


class NodeClassificationMPNGroupBased(nn.Module):
    """Body-part sub-graph message passing: each step runs the shared layer
    on within-body-part edges, then on cross-part edges.

    reference: NodeClassificationMPNGroupBased.py:62-116 + get_sub_graphs
    (:105-116). Padded formulation: both passes run over the full edge list
    with complementary validity masks; edge features merge per-pass like the
    reference's out_edge_features scatter.
    """

    mpn_cfg: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, edge_attr, edge_index, node_types, node_valid=None,
                 edge_valid=None, joint_tags=None, train: bool = False, **kwargs):
        c = self.mpn_cfg
        num_types = num_summary_types(c["NODE_TYPE_SUMMARY"], c["NUM_JOINTS"])
        types = sum_node_types(c["NODE_TYPE_SUMMARY"], node_types)
        body_part = sum_node_types("per_body_part", node_types)

        if c["LATE_FUSION_POS"]:
            edge_features = LateFusionEdgeMLP(
                tuple(c["EDGE_EMB"]["OUTPUT_SIZES"]), c["EDGE_EMB"]["BN"],
                c["EDGE_EMB"].get("END_WITH_RELU", False), dtype=self.dtype,
                name="edge_embedding",
            )(edge_attr, edge_valid, train)
        else:
            edge_features = MLP(
                tuple(c["EDGE_EMB"]["OUTPUT_SIZES"]), bn=c["EDGE_EMB"]["BN"],
                end_with_relu=c["EDGE_EMB"].get("END_WITH_RELU", False),
                dtype=self.dtype, name="edge_embedding",
            )(edge_attr, edge_valid, train)
        node_features = MLP(
            tuple(c["NODE_EMB"]["OUTPUT_SIZES"]), bn=c["NODE_EMB"]["BN"],
            end_with_relu=c["NODE_EMB"].get("END_WITH_RELU", False),
            dtype=self.dtype, name="node_embedding",
        )(x, node_valid, train)

        src, dst = edge_index[0], edge_index[1]
        same_part = body_part[src] == body_part[dst]
        ev = edge_valid if edge_valid is not None else jnp.ones(src.shape[0], bool)
        mask_within = ev & same_part
        mask_cross = ev & ~same_part

        from pemp_tpu.models.mpn.layers import TypeAwareMPNLayer as _Layer

        layer = _Layer(
            c["NODE_FEATURE_DIM"], c["EDGE_FEATURE_DIM"], c["EDGE_FEATURE_HIDDEN"],
            aggr=c["AGGR"], edge_mlp=c["EDGE_MLP"], num_types=num_types,
            aggr_sub=c["AGGR_SUB"], update_type=c["UPDATE_TYPE"],
            blocked_c=c.get("_BLOCKED_C", 0), dtype=self.dtype, name="layer",
        )

        nf0, ef0 = node_features, edge_features
        nf, ef = node_features, edge_features
        for _ in range(c["STEPS"]):
            nf_in = jnp.concatenate([nf0, nf], -1) if c["SKIP"] else nf
            ef_in = jnp.concatenate([ef0, ef], -1) if c["SKIP"] else ef
            nf, e1 = layer(nf_in, ef_in, edge_index, types, mask_within)
            nf_in2 = jnp.concatenate([nf0, nf], -1) if c["SKIP"] else nf
            nf, e2 = layer(nf_in2, ef_in, edge_index, types, mask_cross)
            ef = jnp.where(mask_within[:, None], e1, jnp.where(mask_cross[:, None], e2, 0.0))

        edge_head = MLP(tuple(c["EDGE_CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="edge_classification")
        node_head = MLP(tuple(c["NODE_CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="node_classification")
        class_head = MLP(tuple(c["CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="classification")
        preds_edge = [edge_head(ef, edge_valid, train)[..., 0]]

        node_steps = c.get("NODE_STEPS", 0)
        for _ in range(node_steps):
            nf_in = jnp.concatenate([nf0, nf], -1) if c["SKIP"] else nf
            ef_in = jnp.concatenate([ef0, ef], -1) if c["SKIP"] else ef
            nf, ef = layer(nf_in, ef_in, edge_index, types, ev)
        preds_node = [node_head(nf, node_valid, train)[..., 0]]
        preds_class = [class_head(nf, node_valid, train)]
        return {"edge": preds_edge, "node": preds_node, "class": preds_class, "tag": [None]}


_MODELS["NodeClassificationMPNGroupBased"] = NodeClassificationMPNGroupBased
