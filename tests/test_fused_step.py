"""Fused full-step Pallas kernel vs its jnp reference (interpret mode)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pemp_tpu.ops.pallas.fused_step import fused_mpn_step, step_reference


def _make(seed=0, imgs=2, n_img=16, c=8, t=4, d=16, h=16, dc=16, de=16,
          dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    n = imgs * n_img
    e = n * c
    f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32), dtype)  # noqa: E731
    p = f(n, h)
    h_node = f(n, h)
    q = f(e, h)
    cur = f(e, dc)
    a = f(n, t, d)
    src = jnp.asarray(rng.randint(0, n_img, e), jnp.int32)
    types = jnp.asarray(rng.randint(0, t, e), jnp.int32)
    valid = jnp.asarray(rng.rand(e) > 0.2, jnp.int32)
    w_cur = f(dc, h) * 0.3
    w_e1 = f(h, de) * 0.3
    b_e1 = f(de) * 0.1
    we = f(de, t * d) * 0.3
    w_attn = f(de, 1) * 0.3
    args = (p, h_node, q, cur, a, src, types, valid,
            w_cur, w_e1, b_e1, we, w_attn)
    return args, n, t, n_img


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_step_matches_reference(dtype):
    args, n, t, n_img = _make(dtype=dtype)
    out_k, ne_k = fused_mpn_step(*args, n, t, n_img, interpret=True)
    out_r, ne_r = step_reference(*args, n, t, n_img)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=tol, rtol=tol)
    np.testing.assert_allclose(
        np.asarray(ne_k, np.float32), np.asarray(ne_r, np.float32),
        atol=tol, rtol=tol,
    )


def test_fused_step_sub_variants_match():
    args, n, t, n_img = _make(seed=3)
    outs = []
    old = os.environ.get("PEMP_STEP_SUB")
    try:
        for sub in ("1", "2"):
            os.environ["PEMP_STEP_SUB"] = sub
            outs.append(fused_mpn_step(*args, n, t, n_img, interpret=True))
    finally:
        if old is None:
            os.environ.pop("PEMP_STEP_SUB", None)
        else:
            os.environ["PEMP_STEP_SUB"] = old
    np.testing.assert_allclose(np.asarray(outs[0][0]), np.asarray(outs[1][0]),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(outs[0][1]), np.asarray(outs[1][1]),
                               atol=1e-6, rtol=1e-6)


def test_fused_step_grad_matches_reference():
    args, n, t, n_img = _make(seed=7)

    def loss_k(p, hn, q, cur, a, wc, w1, b1, we, wa):
        out, ne = fused_mpn_step(p, hn, q, cur, a, *args[5:8],
                                 wc, w1, b1, we, wa, n, t, n_img,
                                 interpret=True)
        return jnp.sum(out * out) + jnp.sum(ne.astype(jnp.float32))

    def loss_r(p, hn, q, cur, a, wc, w1, b1, we, wa):
        out, ne = step_reference(p, hn, q, cur, a, *args[5:8],
                                 wc, w1, b1, we, wa, n, t, n_img)
        return jnp.sum(out * out) + jnp.sum(ne.astype(jnp.float32))

    diff = args[:5] + args[8:]
    gk = jax.grad(loss_k, argnums=tuple(range(10)))(*diff)
    gr = jax.grad(loss_r, argnums=tuple(range(10)))(*diff)
    for a_, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_fused_step_full_mpn_parity():
    """Flagship MPN forward with the fully-fused step kernel (interpret)
    vs the plain jnp blocked path, identical params."""
    from pemp_tpu.config import get_config, update_config
    from pemp_tpu.models.mpn.models import (
        NodeClassificationMPN,
        mpn_cfg_from_config,
    )
    from pemp_tpu.ops.knn import knn_edges_target_major

    cfg = get_config()
    cfg = update_config(
        cfg, "configs/hybrid_class_agnostic_end2end/model_58_4.yaml"
    )
    base = mpn_cfg_from_config(cfg.MODEL.MPN)
    base["STEPS"] = 3
    rng = np.random.RandomState(0)
    imgs, j, kpt, k = 2, 17, 8, 4
    n_img = j * kpt
    n = imgs * n_img
    c = 2 * k
    # per-image kNN graphs, offset into the batch layout (type-blocked nodes)
    ei_list, ev_list = [], []
    for b in range(imgs):
        pos = jnp.asarray(rng.rand(n_img, 2) * 50, jnp.float32)
        ei, ev = knn_edges_target_major(pos, jnp.ones(n_img, bool), k, k)
        ei_list.append(ei + b * n_img)
        ev_list.append(ev)
    ei = jnp.concatenate(ei_list, axis=1)
    ev = jnp.concatenate(ev_list)
    x = jnp.asarray(rng.randn(n, 128), jnp.float32)
    ea = jnp.asarray(rng.randn(n * c, 19), jnp.float32)
    types = jnp.asarray((np.arange(n) // kpt) % j, jnp.int32)
    common = {**base, "_BLOCKED_C": c, "_NODES_PER_TYPE": kpt}
    plain = NodeClassificationMPN(common)
    fused = NodeClassificationMPN(
        {
            **common,
            "_USE_PALLAS": True,
            "_PALLAS_INTERPRET": True,
            "_FUSED_STEP": True,
        }
    )
    args = (x, ea, ei, types, jnp.ones(n, bool), ev)
    variables = plain.init(jax.random.PRNGKey(0), *args, train=False)
    want = plain.apply(variables, *args, train=False)
    got = fused.apply(variables, *args, train=False)
    for key in ("edge", "node", "class"):
        for w_, g_ in zip(want[key], got[key]):
            # invalid edges carry garbage on both paths; mask them
            if key == "edge":
                w_ = jnp.where(ev, w_, 0.0)
                g_ = jnp.where(ev, g_, 0.0)
            np.testing.assert_allclose(
                np.asarray(g_), np.asarray(w_), rtol=2e-3, atol=2e-3,
                err_msg=key,
            )
