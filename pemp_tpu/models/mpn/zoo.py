"""Research-zoo MPN variants with genuinely distinct architectures.

Padded static-shape re-designs of the reference ablation models that do NOT
reduce to the flagship:

  * ClassificationMPN — two-phase node/grouping passes with separate layer
    weights and a TP-subgraph mask between them
    (reference: ClassificationMPN.py:53-111)
  * NodeClassificationMPNSelfAttention — per-step spatial attention from node
    keys into the backbone feature map (NodeClassificationMPNSelftAttention.py)
  * NodeClassificationMPNAttention — per-type node-embedding bank re-mixed
    each step by the class softmax (NodeClassificationMPNAttention.py:1-86)
  * NodeClassificationMPNTypeBased — per-type node embedding MLPs
    (NodeClassificationMPNTypeBased.py)
  * NodeClassificationMPNTypeConstrained — final edge scores softmax-
    normalized per (target, source type) (NodeClassificationMPNTypeConstrained.py:1-95)
  * NodeClassificationMPNFPConstrained — edge logits penalized by endpoint
    FP probability (NodeClassificationMPNFPConstrained.py:50-72)
  * NodeClassificationMPNSimpleWithRef — edge-trunk features fed back into
    the node phase (NodeClassificationMPNSimpleWithRef.py:50-84)

All share the padded forward contract of models.py (valid masks carried
through; python-unrolled steps with shared module instances = the
reference's shared-weight loops).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from pemp_tpu.models.mpn.layers import (
    MLP,
    MaskedBatchNorm,
    MPLayer,
    TypeAwareMPNLayer,
    num_summary_types,
    sum_node_types,
)


def _skip_cat(initial, current, use_skip):
    if use_skip:
        return jnp.concatenate([initial, current], axis=-1)
    return current


def _make_layer(c, num_types, dtype, name, use_node_update_mlp=None):
    if c["AGGR_TYPE"] == "agnostic":
        return MPLayer(
            c["NODE_FEATURE_DIM"], c["EDGE_FEATURE_DIM"], c["EDGE_FEATURE_HIDDEN"],
            aggr=c["AGGR"],
            use_node_update_mlp=(
                c["USE_NODE_UPDATE_MLP"] if use_node_update_mlp is None
                else use_node_update_mlp
            ),
            edge_mlp=c["EDGE_MLP"], num_types=num_types,
            blocked_c=c.get("_BLOCKED_C", 0), dtype=dtype, name=name,
        )
    return TypeAwareMPNLayer(
        c["NODE_FEATURE_DIM"], c["EDGE_FEATURE_DIM"], c["EDGE_FEATURE_HIDDEN"],
        aggr=c["AGGR"], edge_mlp=c["EDGE_MLP"], num_types=num_types,
        aggr_sub=c.get("AGGR_SUB", "None"), update_type=c.get("UPDATE_TYPE", "mlp"),
        blocked_c=c.get("_BLOCKED_C", 0), dtype=dtype, name=name,
    )


class ClassificationMPN(nn.Module):
    """Two-phase: STEPS_NODE node passes -> node head -> TP-masked grouping
    subgraph -> STEPS_GROUP passes with a second layer -> edge head.

    reference: ClassificationMPN.py:53-111. The subgraph restriction becomes
    an edge-validity mask (padded graphs keep static shapes).
    """

    mpn_cfg: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, edge_attr, edge_index, node_types, node_valid=None,
                 edge_valid=None, joint_tags=None, node_labels=None,
                 train: bool = False, **kwargs):
        c = self.mpn_cfg
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
        nf0, ef0 = node_features, edge_features
        skip = c["SKIP"]

        node_layer = _make_layer(
            {**c, "AGGR_TYPE": "agnostic"}, c["NUM_JOINTS"], self.dtype, "mpn_node_cls"
        )
        group_layer = _make_layer(
            {**c, "AGGR_TYPE": "agnostic"}, c["NUM_JOINTS"], self.dtype, "mpn_grouping"
        )
        node_head = MLP(tuple(c["NODE_CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="node_classification")
        edge_head = MLP(tuple(c["EDGE_CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="edge_classification")

        nf, ef = node_features, edge_features
        for _ in range(c.get("STEPS_NODE", c["STEPS"])):
            nf, ef = node_layer(
                _skip_cat(nf0, nf, skip), _skip_cat(ef0, ef, skip),
                edge_index, node_types, edge_valid,
            )
        preds_node = [node_head(nf, node_valid, train)[..., 0]]

        # TP subgraph: sigmoid > 0.5, labels forced positive at train time
        # (reference: ClassificationMPN.py:95-99)
        tp = jax.nn.sigmoid(preds_node[-1]) > 0.5
        if train and node_labels is not None:
            tp = tp | (node_labels == 1.0)
        src, dst = edge_index[0], edge_index[1]
        ev = edge_valid if edge_valid is not None else jnp.ones(src.shape[0], bool)
        sub_valid = ev & tp[src] & tp[dst]

        for _ in range(c.get("STEPS_GROUP", 0)):
            nf, ef = group_layer(
                _skip_cat(nf0, nf, skip), _skip_cat(ef0, ef, skip),
                edge_index, node_types, sub_valid,
            )
        preds_edge = [edge_head(ef, edge_valid, train)[..., 0]]
        return {"edge": preds_edge, "node": preds_node, "class": None, "tag": [None]}


class NodeClassificationMPNSelfAttention(nn.Module):
    """Each step augments node features with spatial attention into the
    backbone feature map (key per node, query/value 1x1 projections).

    reference: NodeClassificationMPNSelftAttention.py:64-141. The attention
    runs per image sequentially (lax.map) to bound the (N, H*W) score matrix.
    """

    mpn_cfg: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, edge_attr, edge_index, node_types, node_valid=None,
                 edge_valid=None, joint_tags=None, feature_maps=None,
                 batch_index=None, train: bool = False, **kwargs):
        c = self.mpn_cfg
        assert feature_maps is not None and batch_index is not None, (
            "SelfAttention MPN needs backbone feature_maps + batch_index"
        )
        edge_features = MLP(
            tuple(c["EDGE_EMB"]["OUTPUT_SIZES"]), bn=c["EDGE_EMB"]["BN"],
            end_with_relu=c["NODE_EMB"].get("END_WITH_RELU", False),
            dtype=self.dtype, name="edge_embedding",
        )(edge_attr, edge_valid, train)
        node_features = MLP(
            tuple(c["NODE_EMB"]["OUTPUT_SIZES"]), bn=c["NODE_EMB"]["BN"],
            end_with_relu=c["NODE_EMB"].get("END_WITH_RELU", False),
            dtype=self.dtype, name="node_embedding",
        )(x, node_valid, train)
        nf0, ef0 = node_features, edge_features
        skip = c["SKIP"]

        layer = _make_layer(
            {**c, "AGGR_TYPE": "agnostic"}, c["NUM_JOINTS"], self.dtype,
            "mpn_node_cls", use_node_update_mlp=False,
        )
        key_tf = nn.Dense(16, dtype=self.dtype, name="key_transform")
        query_tf = nn.Dense(16, dtype=self.dtype, name="query_transform")
        value_tf = nn.Dense(16, dtype=self.dtype, name="value_transform")

        b = feature_maps.shape[0]
        hw = feature_maps.shape[1] * feature_maps.shape[2]
        fm = feature_maps.reshape(b, hw, feature_maps.shape[-1])
        queries = query_tf(fm)   # (B, HW, 16)
        values = value_tf(fm)    # (B, HW, 16)
        n = x.shape[0]
        n_per = n // b

        def attend(nf):
            key = key_tf(nf).reshape(b, n_per, 16)          # (B, n, 16)

            def one(args):
                k, q, v = args
                attn = jax.nn.softmax(k @ q.T, axis=-1)     # (n, HW)
                return attn @ v                              # (n, 16)

            res = jax.lax.map(one, (key, queries, values))
            return res.reshape(n, 16)

        nf, ef = node_features, edge_features
        for _ in range(c["STEPS"]):
            nf_att = jnp.concatenate([nf, attend(nf)], axis=-1)
            nf, ef = layer(
                _skip_cat(nf0, nf_att, skip), _skip_cat(ef0, ef, skip),
                edge_index, node_types, edge_valid,
            )

        edge_head = MLP(tuple(c["EDGE_CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="edge_classification")
        node_head = MLP(tuple(c["NODE_CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="node_classification")
        class_head = MLP(tuple(c["CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="classification")
        return {
            "edge": [edge_head(ef, edge_valid, train)[..., 0]],
            "node": [node_head(nf, node_valid, train)[..., 0]],
            "class": [class_head(nf, node_valid, train)],
            "tag": [None],
        }


class _NodeMlpBank(nn.Module):
    """17 parallel node-embedding MLPs -> (N, T, D) bank. reference:
    NodeClassificationMPNAttention.py:10-25."""

    output_sizes: tuple
    bn: bool
    end_with_relu: bool
    num_types: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, valid=None, train: bool = False):
        outs = []
        for i in range(self.num_types):
            outs.append(
                MLP(self.output_sizes, bn=self.bn, end_with_relu=self.end_with_relu,
                    dtype=self.dtype, name=f"mlp_{i}")(x, valid, train)
            )
        return jnp.stack(outs, axis=1)  # (N, T, D)


class NodeClassificationMPNAttention(nn.Module):
    """Class-softmax re-mixes a per-type embedding bank into the skip input
    each step. reference: NodeClassificationMPNAttention.py:27-86."""

    mpn_cfg: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, edge_attr, edge_index, node_types, node_valid=None,
                 edge_valid=None, joint_tags=None, train: bool = False, **kwargs):
        c = self.mpn_cfg
        bank = _NodeMlpBank(
            tuple(c["NODE_EMB"]["OUTPUT_SIZES"]), c["NODE_EMB"]["BN"],
            c["NODE_EMB"].get("END_WITH_RELU", False), c["NUM_JOINTS"],
            dtype=self.dtype, name="node_embedding",
        )(x, node_valid, train)                      # (N, T, D)
        node_features = jnp.take_along_axis(
            bank, node_types[:, None, None], axis=1
        )[:, 0]
        edge_features = MLP(
            tuple(c["EDGE_EMB"]["OUTPUT_SIZES"]), bn=c["EDGE_EMB"]["BN"],
            end_with_relu=c["NODE_EMB"].get("END_WITH_RELU", False),
            dtype=self.dtype, name="edge_embedding",
        )(edge_attr, edge_valid, train)
        skip = c["SKIP"]

        layer = _make_layer(
            {**c, "AGGR_TYPE": "agnostic"}, c["NUM_JOINTS"], self.dtype, "mpn_node_cls"
        )
        edge_head = MLP(tuple(c["EDGE_CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="edge_classification")
        node_head = MLP(tuple(c["NODE_CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="node_classification")
        class_head = MLP(tuple(c["CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="classification")

        nf0, ef0 = node_features, edge_features
        nf, ef = node_features, edge_features
        preds_class = []
        for _ in range(c["STEPS"]):
            nf, ef = layer(
                _skip_cat(nf0, nf, skip), _skip_cat(ef0, ef, skip),
                edge_index, node_types, edge_valid,
            )
            cls = class_head(nf, node_valid, train)
            preds_class.append(cls)
            attn = jax.nn.softmax(cls, axis=1)
            nf0 = jnp.sum(bank * attn[:, :, None], axis=1)  # re-mixed skip

        preds_edge = [edge_head(ef, edge_valid, train)[..., 0]]
        for _ in range(c.get("NODE_STEPS", 0)):
            nf, ef = layer(
                _skip_cat(nf0, nf, skip), _skip_cat(ef0, ef, skip),
                edge_index, node_types, edge_valid,
            )
        preds_node = [node_head(nf, node_valid, train)[..., 0]]
        return {"edge": preds_edge, "node": preds_node, "class": preds_class, "tag": [None]}


class NodeClassificationMPNTypeBased(nn.Module):
    """Per-type node embedding (type-selected MLP). reference:
    NodeClassificationMPNTypeBased.py."""

    mpn_cfg: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, edge_attr, edge_index, node_types, node_valid=None,
                 edge_valid=None, joint_tags=None, train: bool = False, **kwargs):
        c = self.mpn_cfg
        bank = _NodeMlpBank(
            tuple(c["NODE_EMB"]["OUTPUT_SIZES"]), c["NODE_EMB"]["BN"],
            c["NODE_EMB"].get("END_WITH_RELU", False), c["NUM_JOINTS"],
            dtype=self.dtype, name="node_embedding",
        )(x, node_valid, train)
        node_features = jnp.take_along_axis(
            bank, node_types[:, None, None], axis=1
        )[:, 0]
        edge_features = MLP(
            tuple(c["EDGE_EMB"]["OUTPUT_SIZES"]), bn=c["EDGE_EMB"]["BN"],
            end_with_relu=c["EDGE_EMB"].get("END_WITH_RELU", False),
            dtype=self.dtype, name="edge_embedding",
        )(edge_attr, edge_valid, train)
        skip = c["SKIP"]
        layer = _make_layer(c, c["NUM_JOINTS"], self.dtype, "mpn_node_cls")

        nf0, ef0 = node_features, edge_features
        nf, ef = node_features, edge_features
        for _ in range(c["STEPS"]):
            nf, ef = layer(
                _skip_cat(nf0, nf, skip), _skip_cat(ef0, ef, skip),
                edge_index, node_types, edge_valid,
            )
        edge_head = MLP(tuple(c["EDGE_CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="edge_classification")
        node_head = MLP(tuple(c["NODE_CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="node_classification")
        class_head = MLP(tuple(c["CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="classification")
        return {
            "edge": [edge_head(ef, edge_valid, train)[..., 0]],
            "node": [node_head(nf, node_valid, train)[..., 0]],
            "class": [class_head(nf, node_valid, train)],
            "tag": [None],
        }


class NodeClassificationMPNTypeConstrained(nn.Module):
    """Final edge scores: per-(target, source-type) softmax of a node-embed
    dot product, times sigmoid(edge logit).

    reference: NodeClassificationMPNTypeConstrained.py:41-82. Output edge
    preds are probabilities, not logits (reference quirk kept).
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
        skip = c["SKIP"]
        layer = _make_layer(c, num_types, self.dtype, "mpn_node_cls")

        nf0, ef0 = node_features, edge_features
        nf, ef = node_features, edge_features
        for _ in range(c["STEPS"]):
            nf, ef = layer(
                _skip_cat(nf0, nf, skip), _skip_cat(ef0, ef, skip),
                edge_index, types, edge_valid,
            )
        edge_head = MLP(tuple(c["EDGE_CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="edge_classification")
        node_head = MLP(tuple(c["NODE_CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="node_classification")
        class_head = MLP(tuple(c["CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="classification")

        preds_node = [node_head(nf, node_valid, train)[..., 0]]
        preds_class = [class_head(nf, node_valid, train)]
        edge_logit = edge_head(ef, edge_valid, train)[..., 0]

        src, dst = edge_index[0], edge_index[1]
        src_cls = jax.lax.stop_gradient(
            jnp.argmax(preds_class[-1], axis=-1)
        )[src]
        emb = nn.Dense(c["NODE_FEATURE_DIM"], dtype=self.dtype, name="edge_const_emb")(nf)
        scores = jnp.sum(emb[src] * emb[dst], axis=-1)
        ev = edge_valid if edge_valid is not None else jnp.ones(src.shape[0], bool)

        # per-(target, source-class) masked softmax
        t = c["NUM_JOINTS"]
        seg = dst * t + jnp.clip(src_cls, 0, t - 1).astype(dst.dtype)
        nseg = x.shape[0] * t
        neg = -1e30
        sc = jnp.where(ev, scores, neg)
        mx = jax.ops.segment_max(sc, seg, num_segments=nseg)
        e = jnp.exp(sc - jnp.where(mx[seg] <= neg / 2, 0.0, mx[seg])) * ev
        den = jnp.maximum(jax.ops.segment_sum(e, seg, num_segments=nseg), 1e-16)
        edge_out = e / den[seg]

        preds_edge = [edge_out * jax.nn.sigmoid(edge_logit)]
        return {"edge": preds_edge, "node": preds_node, "class": preds_class, "tag": [None]}


class NodeClassificationMPNFPConstrained(nn.Module):
    """Edge logits penalized by endpoint false-positive probability:
    edge - (1 - p_src) - (1 - p_dst). reference:
    NodeClassificationMPNFPConstrained.py:50-72."""

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
        skip = c["SKIP"]
        layer = _make_layer(c, num_types, self.dtype, "mpn_node_cls")

        nf0, ef0 = node_features, edge_features
        nf, ef = node_features, edge_features
        for _ in range(c["STEPS"]):
            nf, ef = layer(
                _skip_cat(nf0, nf, skip), _skip_cat(ef0, ef, skip),
                edge_index, types, edge_valid,
            )
        edge_head = MLP(tuple(c["EDGE_CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="edge_classification")
        node_head = MLP(tuple(c["NODE_CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="node_classification")
        class_head = MLP(tuple(c["CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="classification")

        preds_node = [node_head(nf, node_valid, train)[..., 0]]
        preds_class = [class_head(nf, node_valid, train)]
        edge_logit = edge_head(ef, edge_valid, train)[..., 0]
        offset = 1.0 - jax.nn.sigmoid(preds_node[-1])
        src, dst = edge_index[0], edge_index[1]
        preds_edge = [edge_logit - offset[src] - offset[dst]]
        return {"edge": preds_edge, "node": preds_node, "class": preds_class, "tag": [None]}


class NodeClassificationMPNSimpleWithRef(nn.Module):
    """Edge phase -> edge-trunk features concatenated into the edge stream
    for the node phase (separate layer weights).

    reference: NodeClassificationMPNSimpleWithRef.py:28-84.
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
        skip = c["SKIP"]
        edge_layer = _make_layer(c, num_types, self.dtype, "mpn_edge_cls")
        node_layer = _make_layer(c, num_types, self.dtype, "mpn_node_cls")

        # edge classification trunk + final layer split (reference
        # _make_classification_mlp: WithRef.py:8-26)
        trunk_dims = tuple(c["EDGE_CLASS"]["OUTPUT_SIZES"][:-1])
        edge_trunk = MLP(trunk_dims, bn=c["BN"], end_with_relu=True, dtype=self.dtype, name="edge_out")
        edge_final = nn.Dense(
            c["EDGE_CLASS"]["OUTPUT_SIZES"][-1], dtype=self.dtype, name="edge_classification"
        )
        node_head = MLP(tuple(c["NODE_CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="node_classification")
        class_head = MLP(tuple(c["CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], dtype=self.dtype, name="classification")

        nf0, ef0 = node_features, edge_features
        nf, ef = node_features, edge_features
        for _ in range(c["STEPS"]):
            nf, ef = edge_layer(
                _skip_cat(nf0, nf, skip), _skip_cat(ef0, ef, skip),
                edge_index, types, edge_valid,
            )
        ef_out = edge_trunk(ef, edge_valid, train)
        preds_edge = [edge_final(ef_out)[..., 0]]

        nf0 = nf
        ef = jnp.concatenate([ef_out, ef], axis=-1)
        ef0 = ef
        for _ in range(c.get("NODE_STEPS", 0)):
            nf, ef = node_layer(
                _skip_cat(nf0, nf, skip), _skip_cat(ef0, ef, skip),
                edge_index, types, edge_valid,
            )
        preds_node = [node_head(nf, node_valid, train)[..., 0]]
        preds_class = [class_head(nf, node_valid, train)]
        return {"edge": preds_edge, "node": preds_node, "class": preds_class, "tag": [None]}


class ClassificationMPNSimple2(nn.Module):
    """One shared layer run STEPS times -> node head, then EDGE_STEPS more
    passes through the same layer -> edge head.

    reference: ClassificationMPNSimple2.py:53-101 (a single MPLayer shared
    across both phases, unlike ClassificationMPN's two separate layers).
    """

    mpn_cfg: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, edge_attr, edge_index, node_types, node_valid=None,
                 edge_valid=None, train: bool = False, **kwargs):
        c = self.mpn_cfg
        num_types = num_summary_types(c["NODE_TYPE_SUMMARY"], c["NUM_JOINTS"])
        types = sum_node_types(c["NODE_TYPE_SUMMARY"], node_types)
        edge_f = MLP(
            tuple(c["EDGE_EMB"]["OUTPUT_SIZES"]), bn=c["EDGE_EMB"]["BN"],
            end_with_relu=c["EDGE_EMB"].get("END_WITH_RELU", False),
            dtype=self.dtype, name="edge_embedding",
        )(edge_attr, edge_valid, train)
        node_f = MLP(
            tuple(c["NODE_EMB"]["OUTPUT_SIZES"]), bn=c["NODE_EMB"]["BN"],
            end_with_relu=c["NODE_EMB"].get("END_WITH_RELU", False),
            dtype=self.dtype, name="node_embedding",
        )(x, node_valid, train)
        init_n, init_e = node_f, edge_f
        layer = _make_layer(c, num_types, self.dtype, "layer")
        skip = c["SKIP"]

        for _ in range(c["STEPS"]):
            node_f, edge_f = layer(
                _skip_cat(init_n, node_f, skip), _skip_cat(init_e, edge_f, skip),
                edge_index, types, edge_valid,
            )
        node_head = MLP(
            tuple(c["NODE_CLASS"]["OUTPUT_SIZES"]), bn=c["BN"],
            dtype=self.dtype, name="node_classification",
        )
        preds_node = [node_head(node_f, node_valid, train)[..., 0]]

        for _ in range(c.get("EDGE_STEPS", 0)):
            node_f, edge_f = layer(
                _skip_cat(init_n, node_f, skip), _skip_cat(init_e, edge_f, skip),
                edge_index, types, edge_valid,
            )
        edge_head = MLP(
            tuple(c["EDGE_CLASS"]["OUTPUT_SIZES"]), bn=c["BN"],
            dtype=self.dtype, name="edge_classification",
        )
        preds_edge = [edge_head(edge_f, edge_valid, train)[..., 0]]
        return {"edge": preds_edge, "node": preds_node, "class": None, "tag": [None]}


class ClassificationMPNSimple(nn.Module):
    """One layer (agnostic MPLayer or per_type TypeAwareMPNLayer) run STEPS
    times -> node head, then EDGE_STEPS more passes through the same layer
    -> edge head. No class head, no aux-step predictions.

    reference: ClassificationMPNSimple.py:40-66. Faithful quirks preserved:
      * the edge embedding's end_with_relu comes from NODE_EMB
        (reference :28-29), its bn from EDGE_EMB;
      * forward sums node types with "not" regardless of NODE_TYPE_SUMMARY
        (reference :41) while the per-type layer is *sized* by
        NODE_TYPE_SUMMARY (reference :16-26) — all 64 experiment configs
        using this name leave NODE_TYPE_SUMMARY at its "not" default, where
        the two agree.
    """

    mpn_cfg: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, edge_attr, edge_index, node_types, node_valid=None,
                 edge_valid=None, train: bool = False, **kwargs):
        c = self.mpn_cfg
        num_types = num_summary_types(c["NODE_TYPE_SUMMARY"], c["NUM_JOINTS"])
        types = node_types  # sum_node_types("not", .) — reference :41
        edge_f = MLP(
            tuple(c["EDGE_EMB"]["OUTPUT_SIZES"]), bn=c["EDGE_EMB"]["BN"],
            end_with_relu=c["NODE_EMB"].get("END_WITH_RELU", False),
            dtype=self.dtype, name="edge_embedding",
        )(edge_attr, edge_valid, train)
        node_f = MLP(
            tuple(c["NODE_EMB"]["OUTPUT_SIZES"]), bn=c["NODE_EMB"]["BN"],
            end_with_relu=c["NODE_EMB"].get("END_WITH_RELU", False),
            dtype=self.dtype, name="node_embedding",
        )(x, node_valid, train)
        init_n, init_e = node_f, edge_f
        layer = _make_layer(c, num_types, self.dtype, "mpn_node_cls")
        skip = c["SKIP"]

        for _ in range(c["STEPS"]):
            node_f, edge_f = layer(
                _skip_cat(init_n, node_f, skip), _skip_cat(init_e, edge_f, skip),
                edge_index, types, edge_valid,
            )
        node_head = MLP(
            tuple(c["NODE_CLASS"]["OUTPUT_SIZES"]), bn=c["BN"],
            dtype=self.dtype, name="node_classification",
        )
        preds_node = [node_head(node_f, node_valid, train)[..., 0]]

        for _ in range(c.get("EDGE_STEPS", 0)):
            node_f, edge_f = layer(
                _skip_cat(init_n, node_f, skip), _skip_cat(init_e, edge_f, skip),
                edge_index, types, edge_valid,
            )
        edge_head = MLP(
            tuple(c["EDGE_CLASS"]["OUTPUT_SIZES"]), bn=c["BN"],
            dtype=self.dtype, name="edge_classification",
        )
        preds_edge = [edge_head(edge_f, edge_valid, train)[..., 0]]
        return {"edge": preds_edge, "node": preds_node, "class": None, "tag": [None]}


class MPNTag(nn.Module):
    """Tag-regression-only MPN: STEPS agnostic passes -> tag head; no node,
    edge, or class predictions.

    reference: MPNTag.py:30-48 (AGGR_TYPE must be agnostic, reference
    :12-17; TAG_SKIP/AUX_LOSS_STEPS are read at init but unused in its
    forward, so they are ignored here too).
    """

    mpn_cfg: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, edge_attr, edge_index, node_types, node_valid=None,
                 edge_valid=None, train: bool = False, **kwargs):
        c = self.mpn_cfg
        if c["AGGR_TYPE"] != "agnostic":
            raise NotImplementedError(
                "MPNTag supports AGGR_TYPE=agnostic only (reference MPNTag.py:17)"
            )
        edge_f = MLP(
            tuple(c["EDGE_EMB"]["OUTPUT_SIZES"]), bn=c["EDGE_EMB"]["BN"],
            end_with_relu=c["EDGE_EMB"].get("END_WITH_RELU", False),
            dtype=self.dtype, name="edge_embedding",
        )(edge_attr, edge_valid, train)
        node_f = MLP(
            tuple(c["NODE_EMB"]["OUTPUT_SIZES"]), bn=c["NODE_EMB"]["BN"],
            end_with_relu=c["NODE_EMB"].get("END_WITH_RELU", False),
            dtype=self.dtype, name="node_embedding",
        )(x, node_valid, train)
        init_n, init_e = node_f, edge_f
        layer = _make_layer(c, c["NUM_JOINTS"], self.dtype, "mpn_node_cls")
        skip = c["SKIP"]
        for _ in range(c["STEPS"]):
            node_f, edge_f = layer(
                _skip_cat(init_n, node_f, skip), _skip_cat(init_e, edge_f, skip),
                edge_index, node_types, edge_valid,
            )
        tag = MLP(
            tuple(c["NODE_TAG"]["OUTPUT_SIZES"]), bn=c["BN"],
            dtype=self.dtype, name="tag_pred",
        )(node_f, node_valid, train)[..., 0]
        return {"edge": [None], "node": [None], "class": None, "tag": [tag]}


class _VanillaMPLayer2(nn.Module):
    """VanillaMPN2's layer: single-Linear edge/node MLPs each followed by
    ReLU + BatchNorm (over edges — the node MLP runs per message).

    reference: VanillaMPN2.py:19-56 (mlp_edge = Linear/ReLU/BN1d,
    mlp_node = Linear/ReLU/BN1d applied in message(), optional
    node_update = Linear/ReLU/BN1d on the aggregate).
    """

    node_feature_dim: int
    edge_feature_dim: int
    aggr: str = "add"
    use_node_update_mlp: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, edge_attr, edge_index, node_valid=None,
                 edge_valid=None, train: bool = False):
        from pemp_tpu.ops.segment import segment_aggregate

        num_nodes = x.shape[0]
        j, i = edge_index[0], edge_index[1]  # message flows j -> i
        x_i, x_j = x[i], x[j]
        h = jnp.concatenate([x_i, x_j, edge_attr], axis=-1)
        h = nn.Dense(self.edge_feature_dim, dtype=self.dtype, name="mlp_edge_0")(h)
        h = nn.relu(h)
        new_edge = MaskedBatchNorm(dtype=self.dtype, name="mlp_edge_bn")(
            h, edge_valid, train
        )
        m = jnp.concatenate([x_i, new_edge], axis=-1)
        m = nn.Dense(self.node_feature_dim, dtype=self.dtype, name="mlp_node_0")(m)
        m = nn.relu(m)
        m = MaskedBatchNorm(dtype=self.dtype, name="mlp_node_bn")(m, edge_valid, train)
        aggr_out = segment_aggregate(m, i, num_nodes, self.aggr, edge_valid)
        if self.use_node_update_mlp:
            u = nn.Dense(self.node_feature_dim, dtype=self.dtype, name="update_mlp_0")(aggr_out)
            u = nn.relu(u)
            aggr_out = MaskedBatchNorm(dtype=self.dtype, name="update_mlp_bn")(
                u, node_valid, train
            )
        return aggr_out, new_edge


class VanillaMPN2(nn.Module):
    """Edge classification with SEPARATE layer weights per step (ModuleList,
    unlike VanillaMPN's shared layer) and aux edge predictions.

    reference: VanillaMPN2.py:58-93 (no skip connections — they are
    commented out in its forward; classification head gets init_trick).
    """

    mpn_cfg: dict
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, edge_attr, edge_index, node_types, node_valid=None,
                 edge_valid=None, train: bool = False, **kwargs):
        c = self.mpn_cfg
        edge_f = MLP(
            tuple(c["EDGE_EMB"]["OUTPUT_SIZES"]), bn=c["BN"],
            end_with_relu=c["EDGE_EMB"].get("END_WITH_RELU", False),
            dtype=self.dtype, name="edge_embedding",
        )(edge_attr, edge_valid, train)
        node_f = MLP(
            tuple(c["NODE_EMB"]["OUTPUT_SIZES"]), bn=c["BN"],
            end_with_relu=c["NODE_EMB"].get("END_WITH_RELU", False),
            dtype=self.dtype, name="node_embedding",
        )(x, node_valid, train)
        head = MLP(
            tuple(c["CLASS"]["OUTPUT_SIZES"]), bn=c["BN"], init_trick=True,
            dtype=self.dtype, name="classification",
        )
        steps = c["STEPS"]
        aux = c["AUX_LOSS_STEPS"]
        preds_edge = []
        for step in range(steps):
            node_f, edge_f = _VanillaMPLayer2(
                c["NODE_FEATURE_DIM"], c["EDGE_FEATURE_DIM"], aggr=c["AGGR"],
                use_node_update_mlp=c["USE_NODE_UPDATE_MLP"],
                dtype=self.dtype, name=f"mpn_{step}",
            )(node_f, edge_f, edge_index, node_valid, edge_valid, train)
            if step >= steps - aux - 1:
                preds_edge.append(head(edge_f, edge_valid, train)[..., 0])
        return {"edge": preds_edge, "node": [None], "class": None, "tag": [None]}
