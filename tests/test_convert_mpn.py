"""MPN weight-conversion validation.

torch_geometric is unavailable so the reference MPN cannot be instantiated;
instead: (a) numerically golden-test the _make_mlp conversion against a torch
Sequential built with the reference's exact layer rules, and (b) check the
flagship converter produces a tree that exactly covers our initialized
parameter structure.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from pemp_tpu.config import get_config, update_config
from pemp_tpu.models.mpn import MLP, get_mpn_model
from pemp_tpu.models.mpn.models import mpn_cfg_from_config
from pemp_tpu.train.convert import _convert_mlp, convert_flagship_mpn_state_dict

pytestmark = pytest.mark.slow  # heavy compiles; excluded by -m 'not slow'


def reference_make_mlp(input_dim, hidden_dims, bn=False, end_with_relu=False):
    """torch twin of reference _make_mlp (layers.py:8-29)."""
    layers = [torch.nn.Linear(input_dim, hidden_dims[0])]
    if len(hidden_dims) != 1:
        layers.append(torch.nn.ReLU())
    if bn and len(hidden_dims) != 1:
        layers.append(torch.nn.BatchNorm1d(hidden_dims[0]))
    for i in range(1, len(hidden_dims)):
        layers.append(torch.nn.Linear(hidden_dims[i - 1], hidden_dims[i]))
        if i != len(hidden_dims) - 1:
            layers.append(torch.nn.ReLU())
            if bn:
                layers.append(torch.nn.BatchNorm1d(hidden_dims[i]))
    if end_with_relu:
        layers.append(torch.nn.ReLU())
        if bn:
            layers.append(torch.nn.BatchNorm1d(hidden_dims[-1]))
    return torch.nn.Sequential(*layers)


@pytest.mark.parametrize("dims,bn", [([128, 64, 64], True), ([64, 32, 1], False), ([32], False)])
def test_mlp_conversion_numerical(dims, bn):
    torch.manual_seed(0)
    tm = reference_make_mlp(48, dims, bn=bn)
    tm.eval()
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
    sd = {f"m.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}
    bn_flags = [bn] * (len(dims) - 1) + [False]
    params, stats = _convert_mlp(sd, "m", len(dims), bn_flags)

    model = MLP(tuple(dims), bn=bn)
    x = np.random.RandomState(0).randn(10, 48).astype(np.float32)
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    else:
        init = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
        if "batch_stats" in init:
            variables["batch_stats"] = init["batch_stats"]
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_flagship_mpn_conversion_tree_matches_init():
    cfg = get_config()
    cfg = update_config(cfg, "configs/hybrid_class_agnostic_end2end/model_58_4.yaml")
    mpn_cfg = mpn_cfg_from_config(cfg.MODEL.MPN)
    # ignore the blocked flag for structure comparison
    model = get_mpn_model(cfg.MODEL.MPN)

    # synthesize a reference-named state dict with correct shapes
    t, dn, de, dh = 17, 64, 64, 64
    nf = 2 * dn  # skip=True doubles inputs
    ef = 2 * de
    rng = np.random.RandomState(0)
    sd = {}

    def seq_mlp(prefix, in_dim, dims, bn):
        seq = 0
        cur = in_dim
        for i, d in enumerate(dims):
            sd[f"{prefix}.{seq}.weight"] = rng.randn(d, cur).astype(np.float32)
            sd[f"{prefix}.{seq}.bias"] = rng.randn(d).astype(np.float32)
            seq += 1
            cur = d
            if i < len(dims) - 1:
                seq += 1  # relu
                if bn:
                    sd[f"{prefix}.{seq}.weight"] = np.ones(d, np.float32)
                    sd[f"{prefix}.{seq}.bias"] = np.zeros(d, np.float32)
                    sd[f"{prefix}.{seq}.running_mean"] = np.zeros(d, np.float32)
                    sd[f"{prefix}.{seq}.running_var"] = np.ones(d, np.float32)
                    seq += 1

    seq_mlp("node_embedding", 128, [128, 64, 64], True)
    seq_mlp("edge_embedding", 19, [32, 64, 64, 64], True)
    seq_mlp("edge_classification", de, [64, 32, 1], False)
    seq_mlp("node_classification", dn, [64, 32, 1], False)
    seq_mlp("classification", dn, [64, 32, 17], False)
    sd["mpn_node_cls.mlp_edge.0.weight"] = rng.randn(dh, nf * 2 + ef).astype(np.float32)
    sd["mpn_node_cls.mlp_edge.0.bias"] = rng.randn(dh).astype(np.float32)
    sd["mpn_node_cls.mlp_edge.2.weight"] = rng.randn(de, dh).astype(np.float32)
    sd["mpn_node_cls.mlp_edge.2.bias"] = rng.randn(de).astype(np.float32)
    for i in range(t):
        sd[f"mpn_node_cls.mlp_node.mlp.{i}.0.weight"] = rng.randn(dn, nf + de).astype(np.float32)
        sd[f"mpn_node_cls.mlp_node.mlp.{i}.0.bias"] = rng.randn(dn).astype(np.float32)
    sd["mpn_node_cls.attn_net.0.weight"] = rng.randn(1, de).astype(np.float32)
    sd["mpn_node_cls.attn_net.0.bias"] = rng.randn(1).astype(np.float32)
    sd["mpn_node_cls.update_mlp.0.weight"] = rng.randn(dn, t * dn).astype(np.float32)
    sd["mpn_node_cls.update_mlp.0.bias"] = rng.randn(dn).astype(np.float32)

    params, stats = convert_flagship_mpn_state_dict(sd, mpn_cfg)

    # structure must exactly cover the initialized tree
    rngk = jax.random.PRNGKey(0)
    n, e = 12, 40
    init = model.init(
        rngk,
        jnp.zeros((n, 128)), jnp.zeros((e, 19)),
        jnp.zeros((2, e), jnp.int32), jnp.zeros((n,), jnp.int32),
        jnp.ones((n,), bool), jnp.ones((e,), bool), train=False,
    )
    import flax

    def keyset(tree, prefix=""):
        out = set()
        for k, v in tree.items():
            if isinstance(v, dict):
                out |= keyset(v, prefix + k + "/")
            else:
                out.add(prefix + k + ":" + "x".join(map(str, np.shape(v))))
        return out

    init_p = flax.core.unfreeze(init["params"])
    assert keyset(params) == keyset(init_p)
