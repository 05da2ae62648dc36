"""Golden tests: zoo ClassificationMPNSimple / MPNTag / VanillaMPN2 vs the
ACTUAL reference implementations.

Same recipe as test_ref_mpn_golden.py: load the reference module through the
torch_scatter/torch_geometric shims (ref_shim.py), convert its
randomly-initialized weights, assert forward parity on a fixed random graph.

reference: src/Models/MessagePassingNetwork/ClassificationMPNSimple.py:40-66,
MPNTag.py:30-48, VanillaMPN2.py:58-93.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from pemp_tpu.config import ConfigNode, get_config
from pemp_tpu.models.mpn import get_mpn_model
from pemp_tpu.models.mpn.models import mpn_cfg_from_config
from pemp_tpu.train.convert import (
    convert_classification_simple_state_dict,
    convert_mpn_tag_state_dict,
    convert_vanilla_mpn2_state_dict,
)
from ref_shim import load_ref_module


def _random_graph(rng, n=40, e=240, num_types=17, edge_dim=19, node_dim=128):
    x = rng.randn(n, node_dim).astype(np.float32)
    edge_attr = rng.randn(e, edge_dim).astype(np.float32)
    types = rng.randint(0, num_types, n).astype(np.int64)
    src = rng.randint(0, n, e).astype(np.int64)
    dst = rng.randint(0, n, e).astype(np.int64)
    edge_index = np.stack([src, dst])
    return x, edge_attr, edge_index, types


def _randomize_bn_stats(model, seed=3):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.normal_(0.0, 0.5, generator=g)
            m.running_var.uniform_(0.5, 1.5, generator=g)


def _mpn_base(**overrides):
    """MPN config mirroring experiments/train/model_49.yaml:91-127."""
    cfg = get_config()
    cfg.defrost()
    m = cfg.MODEL.MPN
    m.NAME = "ClassificationMPNSimple"
    m.STEPS = 3
    m.NODE_FEATURE_DIM = 64
    m.EDGE_FEATURE_DIM = 64
    m.EDGE_FEATURE_HIDDEN = 64
    m.NODE_EMB.BN = False
    m.NODE_EMB.END_WITH_RELU = False
    m.NODE_EMB.OUTPUT_SIZES = [128, 64, 64]
    m.EDGE_EMB.BN = False
    m.EDGE_EMB.END_WITH_RELU = False
    m.EDGE_EMB.OUTPUT_SIZES = [32, 64, 64, 64]
    m.EDGE_CLASS = ConfigNode({"OUTPUT_SIZES": [64, 32, 1]}, new_allowed=True)
    m.NODE_CLASS = ConfigNode({"OUTPUT_SIZES": [64, 32, 1]}, new_allowed=True)
    m.BN = False
    m.AGGR = "max"
    m.SKIP = True
    m.AGGR_TYPE = "agnostic"
    m.EDGE_STEPS = 0
    for k, v in overrides.items():
        node = m
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    cfg.freeze()
    return cfg.MODEL.MPN


def _run_both(name, mpn_node, converter, edge_dim=19, node_dim=128, seed=1):
    mod = load_ref_module(name)
    torch.manual_seed(0)
    ref = getattr(mod, name)(mpn_node)
    ref.eval()
    _randomize_bn_stats(ref)

    rng = np.random.RandomState(seed)
    x, edge_attr, edge_index, types = _random_graph(
        rng, edge_dim=edge_dim, node_dim=node_dim
    )
    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x),
            torch.from_numpy(edge_attr),
            torch.from_numpy(edge_index),
            node_types=torch.from_numpy(types),
        )

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats = converter(sd, mpn_cfg_from_config(mpn_node))
    model = get_mpn_model(mpn_node)
    out = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x),
        jnp.asarray(edge_attr),
        jnp.asarray(edge_index),
        jnp.asarray(types),
        jnp.ones((x.shape[0],), bool),
        jnp.ones((edge_attr.shape[0],), bool),
        train=False,
    )
    return ref_out, out


@pytest.mark.parametrize("edge_steps", [0, 2])
def test_classification_mpn_simple_agnostic(edge_steps):
    mpn_node = _mpn_base(EDGE_STEPS=edge_steps)
    ref_out, out = _run_both(
        "ClassificationMPNSimple", mpn_node, convert_classification_simple_state_dict
    )
    pe, pn, pc, pt = ref_out
    assert pc is None and out["class"] is None
    assert pt == [None] and out["tag"] == [None]
    np.testing.assert_allclose(
        np.asarray(out["node"][0]), pn[0].numpy(), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["edge"][0]), pe[0].numpy(), atol=1e-4, rtol=1e-4
    )


@pytest.mark.parametrize("aggr_sub", ["node_edge_attn", "node_edge_attn_per_type"])
def test_classification_mpn_simple_per_type(aggr_sub):
    mpn_node = _mpn_base(AGGR_TYPE="per_type", AGGR="add", AGGR_SUB=aggr_sub)
    ref_out, out = _run_both(
        "ClassificationMPNSimple", mpn_node, convert_classification_simple_state_dict
    )
    pe, pn, _, _ = ref_out
    np.testing.assert_allclose(
        np.asarray(out["node"][0]), pn[0].numpy(), atol=1e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["edge"][0]), pe[0].numpy(), atol=1e-3, rtol=1e-3
    )


def test_mpn_tag():
    # mirrors experiments/hybrid_class_agnostic_end2end/model_58_5.yaml:91-123
    mpn_node = _mpn_base(
        **{
            "NAME": "MPNTag",
            "TAG_SKIP": False,
            "NODE_EMB.BN": True,
            "EDGE_EMB.BN": True,
            "NODE_TAG.BN": True,
            "NODE_TAG.OUTPUT_SIZES": [1],
        }
    )
    ref_out, out = _run_both("MPNTag", mpn_node, convert_mpn_tag_state_dict)
    pe, pn, pc, pt = ref_out
    assert pe == [None] and pn == [None] and pc is None
    assert out["edge"] == [None] and out["node"] == [None] and out["class"] is None
    np.testing.assert_allclose(
        np.asarray(out["tag"][0]), pt[0].numpy(), atol=1e-4, rtol=1e-4
    )


@pytest.mark.parametrize("aux_steps", [0, 2])
def test_vanilla_mpn2(aux_steps):
    # mirrors experiments/train/model_20.yaml:90-116
    cfg = get_config()
    cfg.defrost()
    m = cfg.MODEL.MPN
    m.NAME = "VanillaMPN2"
    m.STEPS = 4
    m.AUX_LOSS_STEPS = aux_steps
    m.NODE_FEATURE_DIM = 128
    m.EDGE_FEATURE_DIM = 128
    m.NODE_EMB.OUTPUT_SIZES = [128, 128, 128, 128]
    m.NODE_EMB.END_WITH_RELU = False
    m.EDGE_EMB.OUTPUT_SIZES = [19, 19, 128, 128]
    m.EDGE_EMB.END_WITH_RELU = False
    m.CLASS.OUTPUT_SIZES = [1]
    m.BN = True
    m.AGGR = "add"
    m.SKIP = False
    cfg.freeze()
    mpn_node = cfg.MODEL.MPN

    ref_out, out = _run_both(
        "VanillaMPN2", mpn_node, convert_vanilla_mpn2_state_dict
    )
    pe, _ = ref_out
    assert len(out["edge"]) == len(pe) == aux_steps + 1
    for step in range(len(pe)):
        np.testing.assert_allclose(
            np.asarray(out["edge"][step]), pe[step].numpy(), atol=1e-4, rtol=1e-4,
            err_msg=f"edge logits step {step}",
        )
