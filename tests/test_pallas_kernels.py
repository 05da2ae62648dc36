import jax.numpy as jnp
import numpy as np
import pytest

from pemp_tpu.ops.pallas import blocked_per_type_attention_aggregate_pallas
from pemp_tpu.ops.segment import blocked_per_type_attention_aggregate


@pytest.mark.parametrize("seed", range(3))
def test_pallas_blocked_attn_matches_jnp(seed):
    """Interpret-mode (CPU) parity with the jnp reference implementation.
    Compiled-mode parity on real TPU was verified separately (bf16, 3e-2)."""
    rng = np.random.RandomState(seed)
    n, c, t, d = 16, 12, 5, 8
    m = jnp.asarray(rng.randn(n * c, d).astype(np.float32))
    attn = jnp.asarray(rng.randn(n * c).astype(np.float32))
    types = jnp.asarray(rng.randint(0, t, n * c), jnp.int32)
    valid = jnp.asarray(rng.rand(n * c) > 0.3)
    want = np.asarray(
        blocked_per_type_attention_aggregate(m, attn, types, n, t, valid)
    )
    got = np.asarray(
        blocked_per_type_attention_aggregate_pallas(
            m, attn, types, n, t, valid, interpret=True
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_blocked_attn_empty_groups():
    n, c, t, d = 4, 6, 3, 8
    m = jnp.ones((n * c, d))
    attn = jnp.zeros((n * c,))
    types = jnp.zeros((n * c,), jnp.int32)  # only type 0 present
    valid = jnp.ones((n * c,), bool)
    out = np.asarray(
        blocked_per_type_attention_aggregate_pallas(
            m, attn, types, n, t, valid, interpret=True
        )
    )
    np.testing.assert_allclose(out[:, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(out[:, 1:], 0.0, atol=1e-6)
