import jax.numpy as jnp
import numpy as np
import pytest

from pemp_tpu.ops.knn import knn_edges, knn_edges_target_major
from pemp_tpu.ops.segment import (
    blocked_aggregate,
    blocked_per_type_aggregate,
    blocked_per_type_attention_aggregate,
    per_type_aggregate,
    per_type_attention_aggregate,
    segment_aggregate,
)

pytestmark = pytest.mark.slow  # heavy compiles; excluded by -m 'not slow'


def edge_set(edge_index, edge_valid):
    ei, ev = np.asarray(edge_index), np.asarray(edge_valid)
    return {(int(ei[0, e]), int(ei[1, e])) for e in range(ei.shape[1]) if ev[e]}


@pytest.mark.parametrize("seed", range(4))
def test_target_major_same_edge_set(seed):
    rng = np.random.RandomState(seed)
    n, k = 40, 6
    pos = rng.rand(n, 2).astype(np.float32) * 100
    valid = rng.rand(n) > 0.2
    ref = edge_set(*knn_edges(jnp.asarray(pos), jnp.asarray(valid), k))
    ei, ev = knn_edges_target_major(jnp.asarray(pos), jnp.asarray(valid), k, cap_in=k)
    got = edge_set(ei, ev)
    assert got == ref
    # layout: edge_index[1] == slot // C
    c = 2 * k
    dst = np.asarray(ei[1])
    np.testing.assert_array_equal(dst, np.repeat(np.arange(n), c))
    # no duplicates among valid slots
    pairs = [
        (int(ei[0, e]), int(ei[1, e]))
        for e in range(ei.shape[1])
        if np.asarray(ev)[e]
    ]
    assert len(pairs) == len(set(pairs))


def test_target_major_overflow_drops_not_corrupts():
    """A hub inside everyone's kNN: cap_in=2 forces drops, valid edges stay
    a subset of the reference set."""
    rng = np.random.RandomState(1)
    n, k = 20, 3
    pos = rng.rand(n, 2).astype(np.float32) * 100
    pos[0] = [50, 50]
    pos[1:] = pos[0] + rng.randn(n - 1, 2) * 3  # everyone near node 0
    valid = np.ones(n, bool)
    ref = edge_set(*knn_edges(jnp.asarray(pos), jnp.asarray(valid), k))
    ei, ev = knn_edges_target_major(jnp.asarray(pos), jnp.asarray(valid), k, cap_in=2)
    got = edge_set(ei, ev)
    assert got <= ref


def blocked_graph(rng, n=12, c=5, t=3, d=4):
    data = rng.randn(n * c, d).astype(np.float32)
    src_types = rng.randint(0, t, n * c).astype(np.int32)
    valid = rng.rand(n * c) > 0.3
    dst = np.repeat(np.arange(n), c).astype(np.int32)
    attn = rng.randn(n * c).astype(np.float32)
    return data, src_types, valid, dst, attn


@pytest.mark.parametrize("kind", ["add", "max", "mean"])
def test_blocked_aggregate_matches_segment(kind):
    rng = np.random.RandomState(0)
    data, src_types, valid, dst, attn = blocked_graph(rng)
    n = 12
    got = np.asarray(
        blocked_aggregate(jnp.asarray(data), n, kind, jnp.asarray(valid))
    )
    want = np.asarray(
        segment_aggregate(jnp.asarray(data), jnp.asarray(dst), n, kind, jnp.asarray(valid))
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("kind", ["add", "max", "mean"])
def test_blocked_per_type_matches_segment(kind):
    rng = np.random.RandomState(1)
    data, src_types, valid, dst, attn = blocked_graph(rng)
    n, t = 12, 3
    got = np.asarray(
        blocked_per_type_aggregate(
            jnp.asarray(data), jnp.asarray(src_types), n, t, kind, jnp.asarray(valid)
        )
    )
    want = np.asarray(
        per_type_aggregate(
            jnp.asarray(data), jnp.asarray(dst), jnp.asarray(src_types), n, t,
            kind, jnp.asarray(valid),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_blocked_attention_matches_segment():
    rng = np.random.RandomState(2)
    data, src_types, valid, dst, attn = blocked_graph(rng)
    n, t = 12, 3
    got = np.asarray(
        blocked_per_type_attention_aggregate(
            jnp.asarray(data), jnp.asarray(attn), jnp.asarray(src_types), n, t,
            jnp.asarray(valid),
        )
    )
    want = np.asarray(
        per_type_attention_aggregate(
            jnp.asarray(data), jnp.asarray(attn), jnp.asarray(dst),
            jnp.asarray(src_types), n, t, jnp.asarray(valid),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_composite_blocked_matches_segment_path():
    """Full flagship MPN: target-major blocked graph vs generic segment path
    on the same edges produce identical predictions."""
    import jax

    from pemp_tpu.config import get_config, update_config
    from pemp_tpu.models.mpn import get_mpn_model
    from pemp_tpu.models.mpn.models import mpn_cfg_from_config

    cfg = get_config()
    cfg = update_config(cfg, "configs/hybrid_class_agnostic_end2end/model_58_4.yaml")
    rng = np.random.RandomState(3)
    n, k = 30, 4
    c = 2 * k
    pos = rng.rand(n, 2).astype(np.float32) * 50
    valid = rng.rand(n) > 0.2
    ei, ev = knn_edges_target_major(jnp.asarray(pos), jnp.asarray(valid), k, cap_in=k)
    x = rng.randn(n, 128).astype(np.float32)
    ea = rng.randn(n * c, 19).astype(np.float32)
    types = rng.randint(0, 17, n).astype(np.int32)

    mpn_cfg = mpn_cfg_from_config(cfg.MODEL.MPN)
    from pemp_tpu.models.mpn.models import NodeClassificationMPN

    blocked = NodeClassificationMPN({**mpn_cfg, "_BLOCKED_C": c})
    generic = NodeClassificationMPN(mpn_cfg)
    args = (jnp.asarray(x), jnp.asarray(ea), ei, jnp.asarray(types),
            jnp.asarray(valid), ev)
    variables = blocked.init(jax.random.PRNGKey(0), *args, train=False)
    out_b = blocked.apply(variables, *args, train=False)
    out_g = generic.apply(variables, *args, train=False)
    np.testing.assert_allclose(
        np.asarray(out_b["edge"][0]), np.asarray(out_g["edge"][0]), rtol=5e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_b["node"][-1]), np.asarray(out_g["node"][-1]), rtol=5e-4, atol=1e-5
    )
