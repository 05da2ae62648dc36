import jax.numpy as jnp
import numpy as np
import pytest

from pemp_tpu.ops import (
    per_type_aggregate,
    per_type_attention_aggregate,
    segment_max,
    segment_mean,
    segment_softmax,
    segment_sum,
)


def test_segment_basic():
    data = jnp.asarray([[1.0], [2.0], [3.0], [4.0]])
    ids = jnp.asarray([0, 0, 1, 2])
    np.testing.assert_allclose(np.asarray(segment_sum(data, ids, 4))[:, 0], [3, 3, 4, 0])
    np.testing.assert_allclose(np.asarray(segment_max(data, ids, 4))[:, 0], [2, 3, 4, 0])
    np.testing.assert_allclose(np.asarray(segment_mean(data, ids, 4))[:, 0], [1.5, 3, 4, 0])


def test_segment_valid_mask():
    data = jnp.asarray([[1.0], [2.0], [3.0]])
    ids = jnp.asarray([0, 0, 0])
    valid = jnp.asarray([True, False, True])
    np.testing.assert_allclose(np.asarray(segment_sum(data, ids, 1, valid))[:, 0], [4])
    np.testing.assert_allclose(np.asarray(segment_mean(data, ids, 1, valid))[:, 0], [2])
    np.testing.assert_allclose(np.asarray(segment_max(data, ids, 1, valid))[:, 0], [3])


def test_segment_softmax_matches_dense():
    rng = np.random.RandomState(0)
    scores = rng.randn(10).astype(np.float32)
    ids = np.array([0, 0, 0, 1, 1, 2, 2, 2, 2, 3])
    got = np.asarray(segment_softmax(jnp.asarray(scores), jnp.asarray(ids), 4))
    for seg in range(4):
        m = ids == seg
        want = np.exp(scores[m] - scores[m].max())
        want = want / want.sum()
        np.testing.assert_allclose(got[m], want, rtol=1e-5)


def test_segment_softmax_invalid_zero():
    scores = jnp.asarray([1.0, 2.0, 3.0])
    ids = jnp.asarray([0, 0, 0])
    valid = jnp.asarray([True, True, False])
    got = np.asarray(segment_softmax(scores, ids, 1, valid))
    assert got[2] == 0
    assert got[:2].sum() == pytest.approx(1.0)


def test_per_type_aggregate_matches_loop_oracle():
    """Oracle mirrors the reference's 17-scatter loop (layers.py:234-240)."""
    rng = np.random.RandomState(1)
    e, n, t, d = 40, 8, 3, 5
    data = rng.randn(e, d).astype(np.float32)
    target = rng.randint(0, n, e)
    stype = rng.randint(0, t, e)
    valid = rng.rand(e) > 0.2

    for kind in ["add", "max", "mean"]:
        got = np.asarray(
            per_type_aggregate(
                jnp.asarray(data), jnp.asarray(target), jnp.asarray(stype),
                n, t, kind, jnp.asarray(valid),
            )
        )
        want = np.zeros((n, t, d), np.float32)
        for i in range(n):
            for ty in range(t):
                m = (target == i) & (stype == ty) & valid
                if m.sum() == 0:
                    continue
                if kind == "add":
                    want[i, ty] = data[m].sum(0)
                elif kind == "max":
                    want[i, ty] = data[m].max(0)
                else:
                    want[i, ty] = data[m].mean(0)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_per_type_attention_matches_oracle():
    rng = np.random.RandomState(2)
    e, n, t, d = 30, 6, 2, 4
    data = rng.randn(e, d).astype(np.float32)
    attn = rng.randn(e).astype(np.float32)
    target = rng.randint(0, n, e)
    stype = rng.randint(0, t, e)
    valid = rng.rand(e) > 0.3

    got = np.asarray(
        per_type_attention_aggregate(
            jnp.asarray(data), jnp.asarray(attn), jnp.asarray(target),
            jnp.asarray(stype), n, t, jnp.asarray(valid),
        )
    )
    want = np.zeros((n, t, d), np.float32)
    for i in range(n):
        for ty in range(t):
            m = (target == i) & (stype == ty) & valid
            if m.sum() == 0:
                continue
            a = np.exp(attn[m] - attn[m].max())
            a = a / a.sum()
            want[i, ty] = (data[m] * a[:, None]).sum(0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
