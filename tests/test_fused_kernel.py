import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pemp_tpu.models.mpn.layers import fused_tile_ok
from pemp_tpu.ops.pallas.fused_typed_message import fused_typed_message_aggregate
from pemp_tpu.ops.segment import blocked_per_type_attention_aggregate

pytestmark = pytest.mark.slow  # heavy compiles; excluded by -m 'not slow'


def jnp_reference(ef, a, types, valid, we, wa, n, t):
    d = a.shape[-1]
    c = ef.shape[0] // n
    b = (ef @ we).reshape(n * c, t, d)
    b_sel = jnp.take_along_axis(b, types[:, None, None], axis=1)[:, 0]
    node_of = jnp.repeat(jnp.arange(n), c)
    a_sel = a.reshape(n * t, d)[node_of * t + types]
    m = jax.nn.relu(a_sel + b_sel)
    attn = (ef @ wa)[:, 0]
    return blocked_per_type_attention_aggregate(m, attn, types, n, t, valid)


@pytest.mark.parametrize("seed", range(3))
def test_fused_kernel_interpret_parity(seed):
    rng = np.random.RandomState(seed)
    n, c, t, d, de = 8, 10, 4, 8, 6
    ef = jnp.asarray(rng.randn(n * c, de).astype(np.float32))
    a = jnp.asarray(rng.randn(n, t, d).astype(np.float32))
    types = jnp.asarray(rng.randint(0, t, n * c), jnp.int32)
    valid = jnp.asarray(rng.rand(n * c) > 0.3)
    we = jnp.asarray(rng.randn(de, t * d).astype(np.float32))
    wa = jnp.asarray(rng.randn(de, 1).astype(np.float32))
    want = np.asarray(jnp_reference(ef, a, types, valid, we, wa, n, t))
    got = np.asarray(
        fused_typed_message_aggregate(ef, a, types, valid, we, wa, n, t, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_tile_ok():
    # flagship shapes: N=5440, C=82, T=17 -> nb=8 works
    assert fused_tile_ok(5440, 82, 17)
    # tiny test config: N=68, C=10, T=17 -> no tile (68 % 8 != 0, 17 odd)
    assert not fused_tile_ok(68, 10, 17)


def test_fused_training_grads_through_kernel():
    """Training with _USE_PALLAS flows gradients through the kernel's custom
    VJP (interpret mode stands in for the TPU backend on CPU)."""
    from pemp_tpu.config import get_config, update_config
    from pemp_tpu.models.mpn.models import NodeClassificationMPN, mpn_cfg_from_config
    from pemp_tpu.ops.knn import knn_edges_target_major

    cfg = get_config()
    cfg = update_config(cfg, "configs/hybrid_class_agnostic_end2end/model_58_4.yaml")
    base = mpn_cfg_from_config(cfg.MODEL.MPN)
    base["STEPS"] = 2
    rng = np.random.RandomState(0)
    n, k = 32, 4
    c = 2 * k
    pos = jnp.asarray(rng.rand(n, 2) * 50, jnp.float32)
    valid = jnp.ones(n, bool)
    ei, ev = knn_edges_target_major(pos, valid, k, k)
    x = jnp.asarray(rng.randn(n, 128), jnp.float32)
    ea = jnp.asarray(rng.randn(n * c, 19), jnp.float32)
    types = jnp.asarray(rng.randint(0, 17, n), jnp.int32)
    model = NodeClassificationMPN({**base, "_BLOCKED_C": c, "_USE_PALLAS": True, "_PALLAS_INTERPRET": True})
    args = (x, ea, ei, types, valid, ev)
    variables = model.init(jax.random.PRNGKey(0), *args, train=True)

    def loss(params):
        out = model.apply(
            {"params": params, **{k: v for k, v in variables.items() if k != "params"}},
            *args, train=True, mutable=["batch_stats"],
        )[0]
        return jnp.sum(out["edge"][0] ** 2)

    g = jax.grad(loss)(variables["params"])
    assert all(
        bool(jnp.isfinite(l).all()) for l in jax.tree_util.tree_leaves(g)
    )


@pytest.mark.parametrize("seed", range(2))
def test_fused_kernel_vjp_parity(seed):
    """Custom backward kernel vs jax autodiff of the jnp reference."""
    rng = np.random.RandomState(seed + 10)
    n, c, t, d, de = 8, 10, 4, 8, 6
    ef = jnp.asarray(rng.randn(n * c, de).astype(np.float32))
    a = jnp.asarray(rng.randn(n, t, d).astype(np.float32))
    types = jnp.asarray(rng.randint(0, t, n * c), jnp.int32)
    valid = jnp.asarray(rng.rand(n * c) > 0.3)
    we = jnp.asarray(rng.randn(de, t * d).astype(np.float32))
    wa = jnp.asarray(rng.randn(de, 1).astype(np.float32))
    g = jnp.asarray(rng.randn(n, t, d).astype(np.float32))

    def f_ref(ef, a, we, wa):
        return jnp.sum(jnp_reference(ef, a, types, valid, we, wa, n, t) * g)

    def f_kernel(ef, a, we, wa):
        return jnp.sum(
            fused_typed_message_aggregate(
                ef, a, types, valid, we, wa, n, t, interpret=True
            )
            * g
        )

    want = jax.grad(f_ref, argnums=(0, 1, 2, 3))(ef, a, we, wa)
    got = jax.grad(f_kernel, argnums=(0, 1, 2, 3))(ef, a, we, wa)
    for name, w_, g_ in zip(("ef", "a", "we", "wa"), want, got):
        np.testing.assert_allclose(
            np.asarray(g_), np.asarray(w_), rtol=1e-4, atol=1e-4, err_msg=name
        )


def test_fused_kernel_wide_logit_spread():
    """A (node, type) row whose max attention logit sits far below the tile
    max must still produce a valid softmax average, not a silently-zeroed
    output (per-row max shift, not tile-level)."""
    rng = np.random.RandomState(7)
    n, c, t, d, de = 8, 10, 4, 8, 6
    ef = jnp.asarray(rng.randn(n * c, de).astype(np.float32))
    a = jnp.asarray(rng.randn(n, t, d).astype(np.float32))
    types = jnp.asarray(rng.randint(0, t, n * c), jnp.int32)
    valid = jnp.ones(n * c, bool)
    we = jnp.asarray(rng.randn(de, t * d).astype(np.float32))
    # attention projection scaled so logits span >> 88 units (f32 exp range)
    wa = jnp.asarray((rng.randn(de, 1) * 200.0).astype(np.float32))
    want = np.asarray(jnp_reference(ef, a, types, valid, we, wa, n, t))
    got = np.asarray(
        fused_typed_message_aggregate(ef, a, types, valid, we, wa, n, t, interpret=True)
    )
    # every (node, type) group with slots must be a convex combination of
    # finite messages — the old tile-level shift zeroed low-logit rows
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
