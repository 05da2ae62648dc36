"""Distinct research-zoo MPN variants: build + forward + shape/finiteness.

reference architectures: ClassificationMPN.py:53-111,
NodeClassificationMPNSelftAttention.py, NodeClassificationMPNAttention.py:1-86,
NodeClassificationMPNTypeBased.py, NodeClassificationMPNTypeConstrained.py:1-95,
NodeClassificationMPNFPConstrained.py:50-72, NodeClassificationMPNSimpleWithRef.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pemp_tpu.config import get_config, update_config
from pemp_tpu.models.mpn import get_mpn_model

pytestmark = pytest.mark.slow  # heavy compiles; excluded by -m 'not slow'


def _cfg(name, **over):
    cfg = get_config()
    cfg = update_config(cfg, "configs/hybrid_class_agnostic_end2end/model_58_4.yaml")
    cfg.defrost()
    cfg.MODEL.MPN.NAME = name
    cfg.MODEL.MPN.STEPS = 2
    cfg.MODEL.MPN.NODE_STEPS = 1
    if name == "ClassificationMPN":
        cfg.MODEL.MPN.STEPS_NODE = 2
        cfg.MODEL.MPN.STEPS_GROUP = 2
    for k, v in over.items():
        setattr(cfg.MODEL.MPN, k, v)
    cfg.freeze()
    return cfg.MODEL.MPN


def _graph(rng, n=24, e=96, t=17):
    x = jnp.asarray(rng.randn(n, 128), jnp.float32)
    ea = jnp.asarray(rng.randn(e, 19), jnp.float32)
    ei = jnp.asarray(rng.randint(0, n, (2, e)))
    types = jnp.asarray(rng.randint(0, t, n), jnp.int32)
    nv = jnp.asarray(rng.rand(n) > 0.1)
    ev = jnp.asarray(rng.rand(e) > 0.1)
    return x, ea, ei, types, nv, ev


DISTINCT = [
    "ClassificationMPN",
    "NodeClassificationMPNAttention",
    "NodeClassificationMPNTypeBased",
    "NodeClassificationMPNTypeConstrained",
    "NodeClassificationMPNFPConstrained",
    "NodeClassificationMPNWithRef",
]


@pytest.mark.parametrize("name", DISTINCT)
def test_distinct_variant_forward(name):
    rng = np.random.RandomState(0)
    mpn_cfg = _cfg(name, AGGR_TYPE="agnostic")
    model = get_mpn_model(mpn_cfg)
    x, ea, ei, types, nv, ev = _graph(rng)
    labels = jnp.asarray((rng.rand(24) > 0.5).astype(np.float32))
    variables = model.init(
        jax.random.PRNGKey(0), x, ea, ei, types, nv, ev,
        node_labels=labels, train=True,
    )
    out, _ = model.apply(
        variables, x, ea, ei, types, nv, ev, node_labels=labels, train=True,
        mutable=["batch_stats"],
    )
    for key in ("edge", "node"):
        assert out[key] and out[key][-1] is not None, (name, key)
        assert np.isfinite(np.asarray(out[key][-1])).all(), (name, key)
    e_out = np.asarray(out["edge"][-1])
    assert e_out.shape == (96,)
    n_out = np.asarray(out["node"][-1])
    assert n_out.shape == (24,)


def test_self_attention_variant_forward():
    rng = np.random.RandomState(1)
    mpn_cfg = _cfg("NodeClassificationMPNSelfAttention", AGGR_TYPE="agnostic")
    model = get_mpn_model(mpn_cfg)
    b, n_per = 2, 12
    x, ea, ei, types, nv, ev = _graph(rng, n=b * n_per)
    fm = jnp.asarray(rng.randn(b, 8, 8, 32), jnp.float32)
    bi = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n_per)
    variables = model.init(
        jax.random.PRNGKey(0), x, ea, ei, types, nv, ev,
        feature_maps=fm, batch_index=bi, train=False,
    )
    out = model.apply(
        variables, x, ea, ei, types, nv, ev,
        feature_maps=fm, batch_index=bi, train=False,
    )
    assert np.isfinite(np.asarray(out["edge"][-1])).all()
    assert np.asarray(out["class"][-1]).shape == (b * n_per, 17)


def test_type_constrained_edge_scores_are_probabilities():
    rng = np.random.RandomState(2)
    mpn_cfg = _cfg("NodeClassificationMPNTypeConstrained", AGGR_TYPE="agnostic")
    model = get_mpn_model(mpn_cfg)
    x, ea, ei, types, nv, ev = _graph(rng)
    variables = model.init(jax.random.PRNGKey(0), x, ea, ei, types, nv, ev, train=False)
    out = model.apply(variables, x, ea, ei, types, nv, ev, train=False)
    e = np.asarray(out["edge"][-1])
    assert (e >= 0).all() and (e <= 1).all()


def test_classification_mpn_group_phase_uses_labels_at_train():
    """With labels forced positive, the TP mask differs between train and
    eval, so grouped edge predictions must differ too."""
    rng = np.random.RandomState(3)
    mpn_cfg = _cfg("ClassificationMPN", AGGR_TYPE="agnostic")
    model = get_mpn_model(mpn_cfg)
    x, ea, ei, types, nv, ev = _graph(rng)
    labels = jnp.ones((24,), jnp.float32)  # every node forced TP at train
    variables = model.init(
        jax.random.PRNGKey(0), x, ea, ei, types, nv, ev, train=False
    )
    out_eval = model.apply(variables, x, ea, ei, types, nv, ev, train=False)
    out_train, _ = model.apply(
        variables, x, ea, ei, types, nv, ev, node_labels=labels, train=True,
        mutable=["batch_stats"],
    )
    assert not np.allclose(
        np.asarray(out_eval["edge"][-1]), np.asarray(out_train["edge"][-1])
    )


def test_classification_mpn_simple2_forward():
    """Shared-layer two-phase variant (reference ClassificationMPNSimple2):
    node head after STEPS, edge head after EDGE_STEPS more passes."""
    rng = np.random.RandomState(3)
    mpn_cfg = _cfg("ClassificationMPNSimple2", AGGR_TYPE="agnostic",
                   EDGE_STEPS=1, SKIP=False)
    model = get_mpn_model(mpn_cfg)
    x, ea, ei, types, nv, ev = _graph(rng)
    variables = model.init(jax.random.PRNGKey(0), x, ea, ei, types,
                           node_valid=nv, edge_valid=ev)
    out = model.apply(variables, x, ea, ei, types, node_valid=nv, edge_valid=ev)
    assert out["edge"][-1].shape == (ei.shape[1],)
    assert out["node"][-1].shape == (x.shape[0],)
    assert np.isfinite(np.asarray(out["edge"][-1])).all()


def test_broken_reference_names_raise_clearly():
    """Names whose classes are absent from the reference repo itself raise a
    diagnostic error instead of silently substituting an architecture."""
    for name in ("ClassificationNaive", "NodeClassificationMPNGroupBasedHierach"):
        with pytest.raises(NotImplementedError, match="absent from the reference"):
            get_mpn_model(_cfg(name))


def test_all_reference_yaml_mpn_names_resolve():
    """Every MODEL.MPN.NAME used by the reference's 227 experiment YAMLs
    resolves in our factory, except the two whose classes are missing from
    the reference repository itself."""
    import glob

    from pemp_tpu.models.mpn.models import _MODELS

    broken = {"ClassificationNaive", "NodeClassificationMPNGroupBasedHierach"}
    paths = sorted(glob.glob("/root/reference/experiments/**/*.yaml", recursive=True))
    if not paths:
        pytest.skip("reference experiments not available")
    names = set()
    for p in paths:
        if "adam_lr1e-3" in p:
            continue
        cfg = get_config()
        cfg = update_config(cfg, p)
        names.add(cfg.MODEL.MPN.NAME)
    unresolved = {n for n in names if n not in _MODELS} - broken
    assert not unresolved, unresolved
