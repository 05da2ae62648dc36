import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pemp_tpu.config import get_config, update_config
from pemp_tpu.models.mpn import get_mpn_model, mpn_cfg_from_config

pytestmark = pytest.mark.slow  # heavy compiles; excluded by -m 'not slow'


def flagship_cfg():
    cfg = get_config()
    cfg = update_config(cfg, "configs/hybrid_class_agnostic_end2end/model_58_4.yaml")
    return cfg


def tiny_graph(rng, n_valid=12, n_pad=20, e_pad=80, num_types=17):
    x = rng.randn(n_pad, 128).astype(np.float32)
    node_types = rng.randint(0, num_types, n_pad).astype(np.int32)
    node_valid = np.zeros(n_pad, bool)
    node_valid[:n_valid] = True
    # random edges among valid nodes
    e_valid_count = 40
    src = rng.randint(0, n_valid, e_valid_count)
    dst = rng.randint(0, n_valid, e_valid_count)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    e = len(src)
    edge_index = np.zeros((2, e_pad), np.int32)
    edge_index[0, :e] = src
    edge_index[1, :e] = dst
    edge_valid = np.zeros(e_pad, bool)
    edge_valid[:e] = True
    edge_attr = rng.randn(e_pad, 19).astype(np.float32)
    return x, edge_attr, edge_index, node_types, node_valid, edge_valid


@pytest.fixture(scope="module")
def flagship_model():
    cfg = flagship_cfg()
    model = get_mpn_model(cfg.MODEL.MPN)
    rng = np.random.RandomState(0)
    g = tiny_graph(rng)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(g[0]), jnp.asarray(g[1]), jnp.asarray(g[2]),
        jnp.asarray(g[3]), jnp.asarray(g[4]), jnp.asarray(g[5]),
        train=False,
    )
    return model, variables


def test_flagship_output_shapes(flagship_model):
    model, variables = flagship_model
    rng = np.random.RandomState(1)
    g = tiny_graph(rng)
    out = model.apply(
        variables,
        jnp.asarray(g[0]), jnp.asarray(g[1]), jnp.asarray(g[2]),
        jnp.asarray(g[3]), jnp.asarray(g[4]), jnp.asarray(g[5]),
        train=False,
    )
    # aux_loss_steps=0: one edge pred; node/class get the in-loop + final copy
    assert len(out["edge"]) == 1
    assert len(out["node"]) == 2
    assert len(out["class"]) == 2
    assert out["edge"][0].shape == (80,)
    assert out["node"][0].shape == (20,)
    assert out["class"][0].shape == (20, 17)
    assert out["tag"] == [None]
    for k in ("edge", "node", "class"):
        for p in out[k]:
            assert bool(jnp.isfinite(p).all())


def test_flagship_padding_invariance(flagship_model):
    """Predictions on valid elements must not depend on padding size."""
    model, variables = flagship_model
    rng = np.random.RandomState(2)
    x, ea, ei, nt, nv, ev = tiny_graph(rng)

    out1 = model.apply(
        variables, jnp.asarray(x), jnp.asarray(ea), jnp.asarray(ei),
        jnp.asarray(nt), jnp.asarray(nv), jnp.asarray(ev), train=False,
    )

    # extend padding: 12 more nodes, 40 more edges, all invalid with junk data
    x2 = np.concatenate([x, rng.randn(12, 128).astype(np.float32)])
    nt2 = np.concatenate([nt, rng.randint(0, 17, 12).astype(np.int32)])
    nv2 = np.concatenate([nv, np.zeros(12, bool)])
    ei2 = np.concatenate(
        [ei, rng.randint(0, 32, (2, 40)).astype(np.int32)], axis=1
    )
    ev2 = np.concatenate([ev, np.zeros(40, bool)])
    ea2 = np.concatenate([ea, rng.randn(40, 19).astype(np.float32)])

    out2 = model.apply(
        variables, jnp.asarray(x2), jnp.asarray(ea2), jnp.asarray(ei2),
        jnp.asarray(nt2), jnp.asarray(nv2), jnp.asarray(ev2), train=False,
    )

    np.testing.assert_allclose(
        np.asarray(out1["edge"][0])[ev], np.asarray(out2["edge"][0])[: len(ev)][ev],
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out1["node"][-1])[nv], np.asarray(out2["node"][-1])[: len(nv)][nv],
        rtol=2e-4, atol=2e-5,
    )


def test_flagship_jit_and_grad(flagship_model):
    model, variables = flagship_model
    rng = np.random.RandomState(3)
    x, ea, ei, nt, nv, ev = tiny_graph(rng)
    args = tuple(map(jnp.asarray, (x, ea, ei, nt, nv, ev)))

    def loss_fn(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            *args, train=False,
        )
        return jnp.sum(out["edge"][0] ** 2) + jnp.sum(out["node"][-1] ** 2)

    g = jax.jit(jax.grad(loss_fn))(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    # gradients reach the shared scan layer params
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0


def test_factory_surface():
    cfg = flagship_cfg()
    for name in [
        "VanillaMPN", "NodeClassificationMPN", "JointTypeClassification",
        "TagThreshold", "PlainTag", "LogisticEdgeClassifier",
    ]:
        cfg.defrost()
        cfg.MODEL.MPN.NAME = name
        m = get_mpn_model(cfg.MODEL.MPN)
        assert m is not None


def test_vanilla_mpn_runs():
    cfg = get_config()
    cfg.defrost()
    cfg.MODEL.MPN.NAME = "VanillaMPN"
    cfg.MODEL.MPN.NODE_EMB.merge_from_other({"OUTPUT_SIZES": [64, 64], "BN": False, "END_WITH_RELU": False})
    cfg.MODEL.MPN.EDGE_EMB.merge_from_other({"OUTPUT_SIZES": [32, 64], "BN": False, "END_WITH_RELU": False})
    cfg.MODEL.MPN.merge_from_other({"EDGE_CLASS": {"OUTPUT_SIZES": [32, 1], "BN": False}})
    cfg.MODEL.MPN.STEPS = 4
    cfg.MODEL.MPN.BN = False
    model = get_mpn_model(cfg.MODEL.MPN)
    rng = np.random.RandomState(5)
    g = tiny_graph(rng)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(g[0]), jnp.asarray(g[1]), jnp.asarray(g[2]),
        jnp.asarray(g[3]), jnp.asarray(g[4]), jnp.asarray(g[5]), train=False,
    )
    out = model.apply(
        variables,
        jnp.asarray(g[0]), jnp.asarray(g[1]), jnp.asarray(g[2]),
        jnp.asarray(g[3]), jnp.asarray(g[4]), jnp.asarray(g[5]), train=False,
    )
    assert out["edge"][0].shape == (80,)


def test_masked_batchnorm_ignores_padding():
    from pemp_tpu.models.mpn import MaskedBatchNorm

    rng = np.random.RandomState(6)
    x = rng.randn(10, 4).astype(np.float32)
    valid = np.zeros(10, bool)
    valid[:6] = True
    bn = MaskedBatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(valid), train=True)
    out, mutated = bn.apply(
        variables, jnp.asarray(x), jnp.asarray(valid), train=True,
        mutable=["batch_stats"],
    )
    # valid rows normalized to ~zero mean/unit var
    got = np.asarray(out)[:6]
    np.testing.assert_allclose(got.mean(0), 0, atol=1e-5)
    np.testing.assert_allclose(got.std(0), 1, atol=1e-3)
    # junk in padding must not affect stats
    x2 = x.copy()
    x2[6:] = 1e6
    out2, _ = bn.apply(
        variables, jnp.asarray(x2), jnp.asarray(valid), train=True,
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(np.asarray(out2)[:6], got, atol=1e-5)
