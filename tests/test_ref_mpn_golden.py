"""Golden test: our flagship MPN vs the ACTUAL reference implementation.

Loads the reference's real `NodeClassificationMPNSimple` + `TypeAwareMPNLayer`
(reference: src/Models/MessagePassingNetwork/NodeClassificationMPNSimple.py:23-97,
layers.py:157-303) through the torch_scatter/torch_geometric shims in
ref_shim.py, converts its randomly-initialized weights with
convert_flagship_mpn_state_dict, and asserts forward parity on a fixed random
graph — edge/node/class logits at every aux step, <=1e-3.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from pemp_tpu.config import get_config, update_config
from pemp_tpu.models.mpn import get_mpn_model
from pemp_tpu.models.mpn.models import mpn_cfg_from_config
from pemp_tpu.train.convert import convert_flagship_mpn_state_dict
from ref_shim import load_ref_module


def _flagship_mpn_config(aux_steps=2, steps=4):
    cfg = get_config()
    cfg = update_config(
        cfg, "configs/hybrid_class_agnostic_end2end/model_58_4.yaml"
    )
    cfg.defrost()
    # fewer steps keeps the test fast; the step body is identical every step
    cfg.MODEL.MPN.STEPS = steps
    cfg.MODEL.MPN.AUX_LOSS_STEPS = aux_steps
    cfg.freeze()
    return cfg.MODEL.MPN


def _random_graph(rng, n=40, e=240, num_types=17):
    x = rng.randn(n, 128).astype(np.float32)
    edge_attr = rng.randn(e, 19).astype(np.float32)
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


@pytest.mark.parametrize("aggr_sub", ["node_edge_attn", "None"])
def test_flagship_vs_reference_code(aggr_sub):
    mpn_node = _flagship_mpn_config()
    mpn_node.defrost()
    mpn_node.AGGR_SUB = aggr_sub
    mpn_node.freeze()

    ncs = load_ref_module("NodeClassificationMPNSimple")
    torch.manual_seed(0)
    ref = ncs.NodeClassificationMPNSimple(mpn_node)
    ref.eval()
    _randomize_bn_stats(ref)

    rng = np.random.RandomState(1)
    x, edge_attr, edge_index, types = _random_graph(rng)
    with torch.no_grad():
        pe, pn, pc, _ = ref(
            torch.from_numpy(x),
            torch.from_numpy(edge_attr),
            torch.from_numpy(edge_index),
            node_types=torch.from_numpy(types),
        )

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, stats = convert_flagship_mpn_state_dict(sd, mpn_cfg_from_config(mpn_node))
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

    assert len(out["edge"]) == len(pe)
    assert len(out["node"]) == len(pn)
    assert len(out["class"]) == len(pc)
    for step in range(len(pe)):
        np.testing.assert_allclose(
            np.asarray(out["edge"][step]), pe[step].numpy(), atol=1e-3, rtol=1e-3,
            err_msg=f"edge logits step {step}",
        )
    for step in range(len(pn)):
        np.testing.assert_allclose(
            np.asarray(out["node"][step]), pn[step].numpy(), atol=1e-3, rtol=1e-3,
            err_msg=f"node logits step {step}",
        )
    for step in range(len(pc)):
        np.testing.assert_allclose(
            np.asarray(out["class"][step]), pc[step].numpy(), atol=1e-3, rtol=1e-3,
            err_msg=f"class logits step {step}",
        )


def test_type_aware_layer_vs_reference_code():
    """One TypeAwareMPNLayer step, attention aggregation, exact semantics."""
    layers = load_ref_module("layers")
    torch.manual_seed(0)
    ref = layers.TypeAwareMPNLayer(
        64, 64, 64, aggr="add", skip=False, edge_mlp="agnostic",
        num_types=17, aggr_sub="node_edge_attn", update_type="mlp",
    )
    ref.eval()

    rng = np.random.RandomState(2)
    n, e = 34, 170
    x = rng.randn(n, 64).astype(np.float32)
    edge_attr = rng.randn(e, 64).astype(np.float32)
    types = rng.randint(0, 17, n).astype(np.int64)
    src = rng.randint(0, n, e).astype(np.int64)
    dst = rng.randint(0, n, e).astype(np.int64)
    edge_index = np.stack([src, dst])

    with torch.no_grad():
        ref_nodes, ref_edges = ref(
            torch.from_numpy(x),
            torch.from_numpy(edge_attr),
            torch.from_numpy(edge_index),
            node_types=torch.from_numpy(types),
        )

    from pemp_tpu.models.mpn.layers import TypeAwareMPNLayer

    sd = {f"mpn_node_cls.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    from pemp_tpu.train.convert import _linear

    layer_params = {
        "mlp_edge_0": {
            "kernel": _linear(sd["mpn_node_cls.mlp_edge.0.weight"]),
            "bias": sd["mpn_node_cls.mlp_edge.0.bias"],
        },
        "mlp_edge_1": {
            "kernel": _linear(sd["mpn_node_cls.mlp_edge.2.weight"]),
            "bias": sd["mpn_node_cls.mlp_edge.2.bias"],
        },
        "mlp_node": {
            "kernel": np.stack(
                [_linear(sd[f"mpn_node_cls.mlp_node.mlp.{i}.0.weight"]) for i in range(17)]
            ),
            "bias": np.stack(
                [sd[f"mpn_node_cls.mlp_node.mlp.{i}.0.bias"] for i in range(17)]
            ),
        },
        "attn_net": {
            "kernel": _linear(sd["mpn_node_cls.attn_net.0.weight"]),
            "bias": sd["mpn_node_cls.attn_net.0.bias"],
        },
        "update_mlp": {
            "kernel": _linear(sd["mpn_node_cls.update_mlp.0.weight"]),
            "bias": sd["mpn_node_cls.update_mlp.0.bias"],
        },
    }
    ours = TypeAwareMPNLayer(
        64, 64, 64, aggr="add", edge_mlp="agnostic", num_types=17,
        aggr_sub="node_edge_attn", update_type="mlp",
    )
    got_nodes, got_edges = ours.apply(
        {"params": layer_params},
        jnp.asarray(x), jnp.asarray(edge_attr), jnp.asarray(edge_index),
        jnp.asarray(types), jnp.ones((e,), bool),
    )
    np.testing.assert_allclose(np.asarray(got_edges), ref_edges.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_nodes), ref_nodes.numpy(), atol=1e-4, rtol=1e-4)
