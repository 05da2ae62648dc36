"""gather_rows_mm: forward identical to x[j]; backward (one-hot matmul
transpose) identical to the plain gather's scatter-add VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pemp_tpu.ops.gather_mm import gather_rows_mm


@pytest.mark.parametrize("b,n_img,c,d", [(1, 12, 5, 8), (3, 16, 4, 16)])
def test_matches_plain_gather_fwd_and_grad(b, n_img, c, d):
    rng = np.random.RandomState(0)
    n = b * n_img
    e = n * c
    x = jnp.asarray(rng.randn(n, d), jnp.float32)
    # per-image indices: edge e of image k points inside image k's block
    src_local = rng.randint(0, n_img, size=e)
    img = np.arange(e) // (n_img * c)
    j = jnp.asarray(src_local + img * n_img, jnp.int32)
    g = jnp.asarray(rng.randn(e, d), jnp.float32)

    out = gather_rows_mm(x, j, n_img)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x[j]))

    f_mm = lambda t: jnp.vdot(gather_rows_mm(t, j, n_img), g)  # noqa: E731
    f_ref = lambda t: jnp.vdot(t[j], g)  # noqa: E731
    np.testing.assert_allclose(
        np.asarray(jax.grad(f_mm)(x)),
        np.asarray(jax.grad(f_ref)(x)),
        rtol=1e-6,
        atol=1e-6,
    )


def test_bf16_grad_accumulates_f32():
    # bf16 rows: the matmul transpose accumulates in f32, so it must be at
    # least as close to the f64 truth as the plain scatter-add
    rng = np.random.RandomState(1)
    n_img, c, d = 8, 64, 4
    e = n_img * c
    x = jnp.asarray(rng.randn(n_img, d), jnp.bfloat16)
    j = jnp.asarray(rng.randint(0, n_img, size=e), jnp.int32)
    g64 = rng.randn(e, d)
    g = jnp.asarray(g64, jnp.bfloat16)

    f_mm = lambda t: jnp.vdot(  # noqa: E731
        gather_rows_mm(t, j, n_img).astype(jnp.float32), g.astype(jnp.float32)
    )
    got = np.asarray(jax.grad(f_mm)(x)).astype(np.float64)
    truth = np.zeros((n_img, d))
    gb = np.asarray(g).astype(np.float64)  # bf16-rounded upstream, exact sum
    for idx in range(e):
        truth[int(j[idx])] += gb[idx]
    # one bf16 rounding on the output only
    np.testing.assert_allclose(got, truth, rtol=2e-2, atol=2e-2)


def test_jit_and_under_scan():
    rng = np.random.RandomState(2)
    n_img, c, d = 8, 3, 4
    e = n_img * c
    x = jnp.asarray(rng.randn(n_img, d), jnp.float32)
    j = jnp.asarray(rng.randint(0, n_img, size=e), jnp.int32)

    @jax.jit
    def f(t):
        def body(carry, _):
            rows = gather_rows_mm(carry, j, n_img)
            upd = jnp.zeros_like(carry).at[:].add(rows.sum() * 1e-3)
            return carry + upd, rows.sum()

        out, sums = jax.lax.scan(body, t, None, length=3)
        return out.sum() + sums.sum()

    grad = jax.grad(f)(x)
    assert np.isfinite(np.asarray(grad)).all()
