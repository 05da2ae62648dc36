"""PyTorch checkpoint -> flax parameter conversion.

Ports released HigherHRNet ``.pth`` weights (and the reference's trained
composite checkpoints) into this framework's parameter tree, implementing
the reference's three provenance rename schemes
(reference: src/Models/PoseEstimation/PoseEstimation.py:14-38,
UpperBound.py:40-48, hrnet.py:546-579).

Layout conversions:
  Conv2d        OIHW        -> HWIO
  ConvTranspose (in,out,k,k) -> (k,k,out,in) with flax transpose_kernel=True
  Linear        (out,in)     -> (in,out)
  BatchNorm     weight/bias/running_mean/running_var -> scale/bias + stats
"""

from __future__ import annotations

import re

import numpy as np


def _conv(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _convT(w):
    # torch ConvTranspose2d (in, out, kh, kw) -> flax transpose_kernel=True
    # layout (kh, kw, out, in)
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _linear(w):
    return np.transpose(np.asarray(w), (1, 0))


def _put(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


def _bn(params, stats, flax_name, sd, torch_prefix):
    _put(params, (flax_name, "scale"), sd[f"{torch_prefix}.weight"])
    _put(params, (flax_name, "bias"), sd[f"{torch_prefix}.bias"])
    _put(stats, (flax_name, "mean"), sd[f"{torch_prefix}.running_mean"])
    _put(stats, (flax_name, "var"), sd[f"{torch_prefix}.running_var"])


def _conv_p(params, flax_name, sd, torch_prefix, bias=False, transpose=False):
    w = sd[f"{torch_prefix}.weight"]
    _put(params, (flax_name, "kernel"), _convT(w) if transpose else _conv(w))
    if bias and f"{torch_prefix}.bias" in sd:
        _put(params, (flax_name, "bias"), sd[f"{torch_prefix}.bias"])


def _basic_block(params, stats, flax_name, sd, tp):
    p = params.setdefault(flax_name, {})
    s = stats.setdefault(flax_name, {})
    _conv_p(p, "conv1", sd, f"{tp}.conv1")
    _conv_p(p, "conv2", sd, f"{tp}.conv2")
    _bn(p, s, "bn1", sd, f"{tp}.bn1")
    _bn(p, s, "bn2", sd, f"{tp}.bn2")
    if f"{tp}.downsample.0.weight" in sd:
        _conv_p(p, "downsample_conv", sd, f"{tp}.downsample.0")
        _bn(p, s, "downsample_bn", sd, f"{tp}.downsample.1")


def _bottleneck(params, stats, flax_name, sd, tp):
    p = params.setdefault(flax_name, {})
    s = stats.setdefault(flax_name, {})
    for i in (1, 2, 3):
        _conv_p(p, f"conv{i}", sd, f"{tp}.conv{i}")
        _bn(p, s, f"bn{i}", sd, f"{tp}.bn{i}")
    if f"{tp}.downsample.0.weight" in sd:
        _conv_p(p, "downsample_conv", sd, f"{tp}.downsample.0")
        _bn(p, s, "downsample_bn", sd, f"{tp}.downsample.1")


def convert_hrnet_state_dict(sd, spec):
    """torch PoseHigherResolutionNet state_dict -> (params, batch_stats)
    for pemp_tpu.models.hrnet.PoseHigherResolutionNet.

    ``spec``: HRNetSpec (drives stage/branch/block counts).
    """
    params: dict = {}
    stats: dict = {}

    _conv_p(params, "conv1", sd, "conv1")
    _conv_p(params, "conv2", sd, "conv2")
    _bn(params, stats, "bn1", sd, "bn1")
    _bn(params, stats, "bn2", sd, "bn2")
    for k in range(4):
        _bottleneck(params, stats, f"layer1_{k}", sd, f"layer1.{k}")

    prev_branches = 1
    prev_channels = [256]
    for si, (num_modules, num_branches, num_blocks, num_channels) in enumerate(spec.stages):
        t = si + 1
        for i in range(num_branches):
            if i < prev_branches:
                if prev_channels[i] != num_channels[i]:
                    _conv_p(params, f"transition{t}_{i}_conv", sd, f"transition{t}.{i}.0")
                    _bn(params, stats, f"transition{t}_{i}_bn", sd, f"transition{t}.{i}.1")
            else:
                for j in range(i + 1 - prev_branches):
                    _conv_p(params, f"transition{t}_{i}_{j}_conv", sd, f"transition{t}.{i}.{j}.0")
                    _bn(params, stats, f"transition{t}_{i}_{j}_bn", sd, f"transition{t}.{i}.{j}.1")
        for m in range(num_modules):
            mod = f"stage{si + 2}_{m}"
            tpm = f"stage{si + 2}.{m}"
            p = params.setdefault(mod, {})
            s = stats.setdefault(mod, {})
            for i in range(num_branches):
                for k in range(num_blocks[i]):
                    _basic_block(p, s, f"branches_{i}_{k}", sd, f"{tpm}.branches.{i}.{k}")
            last_module = m == num_modules - 1
            is_last_stage = si == len(spec.stages) - 1
            num_out = 1 if (is_last_stage and last_module) else num_branches
            for i in range(num_out):
                for j in range(num_branches):
                    if j == i:
                        continue
                    if j > i:
                        _conv_p(p, f"fuse_{i}_{j}_conv", sd, f"{tpm}.fuse_layers.{i}.{j}.0")
                        _bn(p, s, f"fuse_{i}_{j}_bn", sd, f"{tpm}.fuse_layers.{i}.{j}.1")
                    else:
                        for k in range(i - j):
                            _conv_p(p, f"fuse_{i}_{j}_{k}_conv", sd, f"{tpm}.fuse_layers.{i}.{j}.{k}.0")
                            _bn(p, s, f"fuse_{i}_{j}_{k}_bn", sd, f"{tpm}.fuse_layers.{i}.{j}.{k}.1")
        prev_branches = num_branches
        prev_channels = list(num_channels)

    _conv_p(params, "final_layers_0", sd, "final_layers.0", bias=True)
    for i in range(spec.num_deconvs):
        _conv_p(params, f"final_layers_{i + 1}", sd, f"final_layers.{i + 1}", bias=True)
        _conv_p(params, f"deconv_{i}_conv", sd, f"deconv_layers.{i}.0.0", transpose=True)
        _bn(params, stats, f"deconv_{i}_bn", sd, f"deconv_layers.{i}.0.1")
        for k in range(spec.deconv_num_basic_blocks):
            _basic_block(params, stats, f"deconv_{i}_block{k}", sd, f"deconv_layers.{i}.{k + 1}.0")

    return params, stats


RENAME_SCHEMES = {
    # reference: PoseEstimation.py:15-27 / UpperBound.py:40-48
    "plain": lambda k: k,
    "strip2": lambda k: ".".join(k.split(".")[2:]),   # "model.module.X" -> "X"
    "strip_prefix2char": lambda k: k[2:],              # "1." style prefixes
    "strip1": lambda k: ".".join(k.split(".")[1:]),
}


def load_torch_state_dict(path, scheme="plain"):
    """Load a .pth file (requires torch) and apply a rename scheme."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "model_state_dict" in sd:
        sd = sd["model_state_dict"]
    rename = RENAME_SCHEMES[scheme]
    return {rename(k): v.numpy() for k, v in sd.items()}


def convert_mmpose_state_dict(sd, spec):
    """mmpose BottomUp-HigherHRNet checkpoint -> flax params.

    The mmpose architecture (reference: src/Models/HigherHRNet/mmpose/
    backbone.py + keypoint_head.py) computes the same graph as the
    HigherHRNet implementation with different module names: the backbone
    lives under ``backbone.*`` and the heads under ``keypoint_head.
    {final_layers,deconv_layers}.*``. Strip the prefixes and reuse the main
    converter. (reference load path: PoseEstimation.py:31-32 — the mmpose
    checkpoint's state_dict is used as-is.)
    """
    renamed = {}
    for k, v in sd.items():
        if k.startswith("backbone."):
            renamed[k[len("backbone."):]] = v
        elif k.startswith("keypoint_head."):
            renamed[k[len("keypoint_head."):]] = v
        else:
            renamed[k] = v
    return convert_hrnet_state_dict(renamed, spec)


def convert_hourglass_state_dict(sd, nstack=4, depth=4):
    """torch PoseNet (reference: Hourglass.py:39-76, Layers.py:44-88)
    state_dict -> params for pemp_tpu.models.hourglass.PoseNet.

    Only bias-conv layers (bn=False default config); pre indices skip the
    MaxPool at pre.2.
    """
    params: dict = {}

    def conv(flax_name, torch_prefix):
        _put(params, (flax_name, "conv", "kernel"), _conv(sd[f"{torch_prefix}.weight"]))
        _put(params, (flax_name, "conv", "bias"), sd[f"{torch_prefix}.bias"])

    for flax_i, torch_i in zip(range(4), (0, 1, 3, 4)):
        conv(f"pre_{flax_i}", f"pre.{torch_i}.conv")

    def hg_block(tree, torch_prefix, n):
        for name in ("up1", "low1", "low3"):
            sub = tree.setdefault(name, {})
            sub["conv"] = {
                "kernel": _conv(sd[f"{torch_prefix}.{name}.conv.weight"]),
                "bias": np.asarray(sd[f"{torch_prefix}.{name}.conv.bias"]),
            }
        low2 = tree.setdefault("low2", {})
        if n > 1:
            hg_block(low2, f"{torch_prefix}.low2", n - 1)
        else:
            low2["conv"] = {
                "kernel": _conv(sd[f"{torch_prefix}.low2.conv.weight"]),
                "bias": np.asarray(sd[f"{torch_prefix}.low2.conv.bias"]),
            }

    for i in range(nstack):
        hg = params.setdefault(f"hg_{i}", {})
        hg_block(hg, f"features.{i}.0", depth)
        conv(f"feat_{i}_0", f"features.{i}.1.conv")
        conv(f"feat_{i}_1", f"features.{i}.2.conv")
        conv(f"outs_{i}", f"outs.{i}.conv")
        if i != nstack - 1:
            conv(f"merge_preds_{i}", f"merge_preds.{i}.conv.conv")
            conv(f"merge_features_{i}", f"merge_features.{i}.conv.conv")
    return params, {}


def _convert_mlp(sd, prefix, num_layers, bn_flags):
    """reference _make_mlp Sequential -> our MLP module names (lin{i}/bn{i}).

    ``bn_flags``: list of bools — whether a BN follows Linear i (mirrors
    _make_mlp construction, layers.py:8-29). Returns (params, stats) subtrees.
    """
    params: dict = {}
    stats: dict = {}
    seq = 0
    for i in range(num_layers):
        w = sd[f"{prefix}.{seq}.weight"]
        params[f"lin{i}"] = {"kernel": _linear(w)}
        if f"{prefix}.{seq}.bias" in sd:
            params[f"lin{i}"]["bias"] = np.asarray(sd[f"{prefix}.{seq}.bias"])
        seq += 1
        if i < num_layers - 1 or (bn_flags and len(bn_flags) > i and bn_flags[i] == "end"):
            seq += 1  # ReLU
        if bn_flags and i < len(bn_flags) and bn_flags[i] is True:
            params[f"bn{i}"] = {
                "scale": np.asarray(sd[f"{prefix}.{seq}.weight"]),
                "bias": np.asarray(sd[f"{prefix}.{seq}.bias"]),
            }
            stats[f"bn{i}"] = {
                "mean": np.asarray(sd[f"{prefix}.{seq}.running_mean"]),
                "var": np.asarray(sd[f"{prefix}.{seq}.running_var"]),
            }
            seq += 1
    return params, stats


def convert_flagship_mpn_state_dict(sd, mpn_cfg):
    """reference NodeClassificationMPNSimple weights -> our NodeClassificationMPN.

    Covers the flagship topology (TypeAwareMPNLayer, agnostic edge MLP,
    node_edge_attn). Reference module names from
    NodeClassificationMPNSimple.py:23-60 / layers.py:157-274.
    """
    params: dict = {}
    stats: dict = {}

    def emb(name, dims, bn):
        n = len(dims)
        bn_flags = [bn] * (n - 1) + [False]
        p, s = _convert_mlp(sd, name, n, bn_flags)
        return p, s

    p, s = emb("node_embedding", mpn_cfg["NODE_EMB"]["OUTPUT_SIZES"], mpn_cfg["NODE_EMB"]["BN"])
    params["node_embedding"], stats["node_embedding"] = p, s
    p, s = emb("edge_embedding", mpn_cfg["EDGE_EMB"]["OUTPUT_SIZES"], mpn_cfg["EDGE_EMB"]["BN"])
    params["edge_embedding"], stats["edge_embedding"] = p, s
    for head, key in (
        ("edge_classification", "EDGE_CLASS"),
        ("node_classification", "NODE_CLASS"),
        ("classification", "CLASS"),
    ):
        p, s = emb(head, mpn_cfg[key]["OUTPUT_SIZES"], mpn_cfg["BN"])
        params[head], stats[head] = p, s

    layer: dict = {}
    # agnostic edge MLP: Sequential(Linear, ReLU, Linear, ReLU)
    layer["mlp_edge_0"] = {
        "kernel": _linear(sd["mpn_node_cls.mlp_edge.0.weight"]),
        "bias": np.asarray(sd["mpn_node_cls.mlp_edge.0.bias"]),
    }
    layer["mlp_edge_1"] = {
        "kernel": _linear(sd["mpn_node_cls.mlp_edge.2.weight"]),
        "bias": np.asarray(sd["mpn_node_cls.mlp_edge.2.bias"]),
    }
    # TypeAwareNodeUpdate: 17 x Sequential(Linear, ReLU) -> stacked (T, in, out)
    t = mpn_cfg["NUM_JOINTS"]
    ws = [_linear(sd[f"mpn_node_cls.mlp_node.mlp.{i}.0.weight"]) for i in range(t)]
    bs = [np.asarray(sd[f"mpn_node_cls.mlp_node.mlp.{i}.0.bias"]) for i in range(t)]
    layer["mlp_node"] = {"kernel": np.stack(ws), "bias": np.stack(bs)}
    # attention net: Sequential(Linear)
    if "mpn_node_cls.attn_net.0.weight" in sd:
        layer["attn_net"] = {
            "kernel": _linear(sd["mpn_node_cls.attn_net.0.weight"]),
            "bias": np.asarray(sd["mpn_node_cls.attn_net.0.bias"]),
        }
    # update MLP: Sequential(Linear, ReLU)
    layer["update_mlp"] = {
        "kernel": _linear(sd["mpn_node_cls.update_mlp.0.weight"]),
        "bias": np.asarray(sd["mpn_node_cls.update_mlp.0.bias"]),
    }
    params["mpn"] = {"layer": layer}
    return params, stats


def convert_composite_state_dict(sd, config):
    """Full trained reference checkpoint (model_state_dict) -> our composite.

    reference structure: backbone.* + feature_gather.* + mpn.*
    (PoseEstimation.py:53-69).
    """
    from pemp_tpu.models.hrnet import HRNetSpec
    from pemp_tpu.models.mpn.models import mpn_cfg_from_config

    bb = {k[len("backbone."):]: v for k, v in sd.items() if k.startswith("backbone.")}
    mpn = {k[len("mpn."):]: v for k, v in sd.items() if k.startswith("mpn.")}

    spec = HRNetSpec.from_config(config)
    if config.MODEL.KP == "mmpose_hrnet":
        bb_params, bb_stats = convert_mmpose_state_dict(bb, spec)
    else:
        bb_params, bb_stats = convert_hrnet_state_dict(bb, spec)
    mpn_params, mpn_stats = convert_flagship_mpn_state_dict(
        mpn, mpn_cfg_from_config(config.MODEL.MPN)
    )
    params = {
        "backbone": bb_params,
        "mpn": mpn_params,
        "feature_gather": {
            "kernel": _conv(sd["feature_gather.weight"]),
            "bias": np.asarray(sd["feature_gather.bias"]),
        },
    }
    stats = {"backbone": bb_stats, "mpn": mpn_stats}
    return params, stats


def _convert_agnostic_mp_layer(sd, prefix, use_node_update_mlp=False):
    """reference layers.MPLayer (agnostic edge MLP) -> our MPLayer names.

    reference module layout (layers.py:32-62): mlp_edge = Sequential(Linear,
    ReLU, Linear, ReLU) at indices 0/2; mlp_node = Sequential(Linear, ReLU);
    update_mlp = Sequential(Linear, ReLU).
    """
    layer = {
        "mlp_edge_0": {
            "kernel": _linear(sd[f"{prefix}.mlp_edge.0.weight"]),
            "bias": np.asarray(sd[f"{prefix}.mlp_edge.0.bias"]),
        },
        "mlp_edge_1": {
            "kernel": _linear(sd[f"{prefix}.mlp_edge.2.weight"]),
            "bias": np.asarray(sd[f"{prefix}.mlp_edge.2.bias"]),
        },
        "mlp_node": {
            "kernel": _linear(sd[f"{prefix}.mlp_node.0.weight"]),
            "bias": np.asarray(sd[f"{prefix}.mlp_node.0.bias"]),
        },
    }
    if use_node_update_mlp or f"{prefix}.update_mlp.0.weight" in sd:
        layer["update_mlp"] = {
            "kernel": _linear(sd[f"{prefix}.update_mlp.0.weight"]),
            "bias": np.asarray(sd[f"{prefix}.update_mlp.0.bias"]),
        }
    return layer


def _convert_type_aware_layer(sd, prefix, num_types):
    """reference layers.TypeAwareMPNLayer -> our TypeAwareMPNLayer names
    (same layout the flagship converter produces; layers.py:157-274)."""
    layer = {
        "mlp_edge_0": {
            "kernel": _linear(sd[f"{prefix}.mlp_edge.0.weight"]),
            "bias": np.asarray(sd[f"{prefix}.mlp_edge.0.bias"]),
        },
        "mlp_edge_1": {
            "kernel": _linear(sd[f"{prefix}.mlp_edge.2.weight"]),
            "bias": np.asarray(sd[f"{prefix}.mlp_edge.2.bias"]),
        },
    }
    ws = [_linear(sd[f"{prefix}.mlp_node.mlp.{i}.0.weight"]) for i in range(num_types)]
    bs = [np.asarray(sd[f"{prefix}.mlp_node.mlp.{i}.0.bias"]) for i in range(num_types)]
    layer["mlp_node"] = {"kernel": np.stack(ws), "bias": np.stack(bs)}
    if f"{prefix}.attn_net.0.weight" in sd:
        layer["attn_net"] = {
            "kernel": _linear(sd[f"{prefix}.attn_net.0.weight"]),
            "bias": np.asarray(sd[f"{prefix}.attn_net.0.bias"]),
        }
    if f"{prefix}.update_mlp.0.weight" in sd:
        layer["update_mlp"] = {
            "kernel": _linear(sd[f"{prefix}.update_mlp.0.weight"]),
            "bias": np.asarray(sd[f"{prefix}.update_mlp.0.bias"]),
        }
    return layer


def convert_classification_simple_state_dict(sd, mpn_cfg):
    """reference ClassificationMPNSimple weights -> our zoo.ClassificationMPNSimple.

    reference: ClassificationMPNSimple.py:8-38 (one mpn_node_cls layer —
    MPLayer or TypeAwareMPNLayer by AGGR_TYPE — plus embeddings and
    node/edge classification heads; no class head).
    """
    from pemp_tpu.models.mpn.layers import num_summary_types

    params: dict = {}
    stats: dict = {}

    def emb(name, dims, bn):
        n = len(dims)
        return _convert_mlp(sd, name, n, [bn] * (n - 1) + [False])

    p, s = emb("node_embedding", mpn_cfg["NODE_EMB"]["OUTPUT_SIZES"], mpn_cfg["NODE_EMB"]["BN"])
    params["node_embedding"], stats["node_embedding"] = p, s
    p, s = emb("edge_embedding", mpn_cfg["EDGE_EMB"]["OUTPUT_SIZES"], mpn_cfg["EDGE_EMB"]["BN"])
    params["edge_embedding"], stats["edge_embedding"] = p, s
    for head, key in (
        ("edge_classification", "EDGE_CLASS"),
        ("node_classification", "NODE_CLASS"),
    ):
        p, s = emb(head, mpn_cfg[key]["OUTPUT_SIZES"], mpn_cfg["BN"])
        params[head], stats[head] = p, s

    if mpn_cfg["AGGR_TYPE"] == "agnostic":
        params["mpn_node_cls"] = _convert_agnostic_mp_layer(
            sd, "mpn_node_cls", mpn_cfg["USE_NODE_UPDATE_MLP"]
        )
    else:
        t = num_summary_types(mpn_cfg["NODE_TYPE_SUMMARY"], mpn_cfg["NUM_JOINTS"])
        params["mpn_node_cls"] = _convert_type_aware_layer(sd, "mpn_node_cls", t)
    return params, stats


def convert_mpn_tag_state_dict(sd, mpn_cfg):
    """reference MPNTag weights -> our zoo.MPNTag.

    reference: MPNTag.py:10-25 (agnostic MPLayer + embeddings + tag head).
    """
    params: dict = {}
    stats: dict = {}

    def emb(name, dims, bn):
        n = len(dims)
        return _convert_mlp(sd, name, n, [bn] * (n - 1) + [False])

    p, s = emb("node_embedding", mpn_cfg["NODE_EMB"]["OUTPUT_SIZES"], mpn_cfg["NODE_EMB"]["BN"])
    params["node_embedding"], stats["node_embedding"] = p, s
    p, s = emb("edge_embedding", mpn_cfg["EDGE_EMB"]["OUTPUT_SIZES"], mpn_cfg["EDGE_EMB"]["BN"])
    params["edge_embedding"], stats["edge_embedding"] = p, s
    p, s = emb("tag_pred", mpn_cfg["NODE_TAG"]["OUTPUT_SIZES"], mpn_cfg["BN"])
    params["tag_pred"], stats["tag_pred"] = p, s
    params["mpn_node_cls"] = _convert_agnostic_mp_layer(
        sd, "mpn_node_cls", mpn_cfg["USE_NODE_UPDATE_MLP"]
    )
    return params, stats


def convert_vanilla_mpn2_state_dict(sd, mpn_cfg):
    """reference VanillaMPN2 weights -> our zoo.VanillaMPN2.

    reference: VanillaMPN2.py:58-75 — per-step ModuleList of
    VanillaMPLayer2 (mpn.{i}), each with mlp_edge/mlp_node =
    Sequential(Linear, ReLU, BatchNorm1d) and optional node_update_mlp.
    """
    params: dict = {}
    stats: dict = {}

    def emb(name, dims, bn):
        n = len(dims)
        return _convert_mlp(sd, name, n, [bn] * (n - 1) + [False])

    p, s = emb("node_embedding", mpn_cfg["NODE_EMB"]["OUTPUT_SIZES"], mpn_cfg["BN"])
    params["node_embedding"], stats["node_embedding"] = p, s
    p, s = emb("edge_embedding", mpn_cfg["EDGE_EMB"]["OUTPUT_SIZES"], mpn_cfg["BN"])
    params["edge_embedding"], stats["edge_embedding"] = p, s
    p, s = emb("classification", mpn_cfg["CLASS"]["OUTPUT_SIZES"], mpn_cfg["BN"])
    params["classification"], stats["classification"] = p, s

    for step in range(mpn_cfg["STEPS"]):
        tp = f"mpn.{step}"
        lp: dict = {}
        ls: dict = {}
        for ours, theirs in (("mlp_edge", "mlp_edge"), ("mlp_node", "mlp_node")):
            lp[f"{ours}_0"] = {
                "kernel": _linear(sd[f"{tp}.{theirs}.0.weight"]),
                "bias": np.asarray(sd[f"{tp}.{theirs}.0.bias"]),
            }
            _bn(lp, ls, f"{ours}_bn", sd, f"{tp}.{theirs}.2")
        if f"{tp}.node_update_mlp.0.weight" in sd:
            lp["update_mlp_0"] = {
                "kernel": _linear(sd[f"{tp}.node_update_mlp.0.weight"]),
                "bias": np.asarray(sd[f"{tp}.node_update_mlp.0.bias"]),
            }
            _bn(lp, ls, "update_mlp_bn", sd, f"{tp}.node_update_mlp.2")
        params[f"mpn_{step}"] = lp
        stats[f"mpn_{step}"] = ls
    return params, stats
