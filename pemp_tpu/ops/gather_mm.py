"""Row gather with a matmul-transpose backward.

``x[j]`` on TPU is fine forward (~0.8ms/step at flagship MPN shapes) but its
autodiff transpose is a scatter-add of (E, D) rows into (N, D) — measured at
30.3 ms/iter in the flagship train step (10.3% of device time; random-access
row scatters run an order below HBM peak, the same wall as the forward
gather the fused eval kernel eliminates).

This op keeps the XLA gather forward and swaps the backward for an exact
per-image one-hot contraction on the MXU:

    dX[b*n_img + n] = sum_e [src_b[e] == n] * g_b[e]
                    = (onehot_b)^T @ g_b            # (n_img, E_img) @ (E_img, D)

which is bit-compatible-or-better than the scatter-add (the dot accumulates
in f32 where a bf16 scatter-add accumulates in bf16). Requires the graph
invariant the constructor guarantees (ops/knn.py): edges never cross images
and every image owns the same static count of nodes/edges.

reference context: the torch reference gathers x_j inside torch_geometric's
MessagePassing (src/Models/MessagePassingNetwork/layers.py:32-86); its CUDA
scatter backward has no TPU analogue that isn't bandwidth-starved.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows_mm(x, j, n_img: int):
    """``x[j]`` with the backward computed as per-image one-hot matmuls.

    x: (N, D) rows, N a multiple of ``n_img`` (nodes per image).
    j: (E,) int row indices, E a multiple of N // n_img images; every index
       must stay inside its image's row block (j[e] // n_img is the image of
       edge e) — the kNN constructor's target-major layout guarantees this.
    """
    return x[j]


def gather_rows_mm_or_plain(x, j, n_img: int):
    """``x[j]``, using the matmul-transpose backward when the layout allows.

    Single home of the eligibility rule (ADVICE r4): the backward assumes
    edges are image-major blocked with equal static per-image counts and
    within-image sources — true exactly for the target-major kNN layout that
    sets ``_NODES_PER_TYPE`` (ops/knn.knn_edges_target_major); the GT-nodes
    path (person-major) and non-divisible shapes fall back to a plain gather.

    Peak-memory note (ADVICE r4): the backward materializes a
    (b, e_img, n_img) one-hot in the cotangent dtype — at flagship shapes
    (batch 8, E=435k, n_img=680, bf16) that is ~74MB per gather instance,
    and the unrolled 10-step scan keeps several alive; measured peak-HBM
    delta at batch 8 is well inside the v5e 16G budget, but quadrupling the
    batch would not be. Chunk over e_img before raising batch past ~16.
    """
    if not n_img or x.shape[0] % n_img != 0:
        return x[j]
    b = x.shape[0] // n_img
    if j.shape[0] % b != 0:
        raise ValueError(
            f"gather_rows_mm needs image-major blocked edges: E={j.shape[0]} "
            f"not divisible by batch={b} (N={x.shape[0]}, n_img={n_img})"
        )
    return gather_rows_mm(x, j, n_img)


def _fwd(x, j, n_img: int):
    # residuals must be jax types: carry x's row count and dtype in a
    # zero-byte (N, 0) probe
    return x[j], (x[:, :0], j)


def _bwd(n_img: int, res, g):
    x_probe, j = res
    x_dtype = x_probe.dtype
    n = x_probe.shape[0]
    b = n // n_img
    e = j.shape[0]
    e_img = e // b
    g3 = g.reshape(b, e_img, -1)
    src = (j % n_img).astype(jnp.int32).reshape(b, e_img)
    onehot = (
        src[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_img), 2)
    ).astype(g3.dtype)
    dx = jax.lax.dot_general(
        onehot,
        g3,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (b, n_img, D)
    dj = np.zeros(j.shape, jax.dtypes.float0)
    return dx.reshape(n, -1).astype(x_dtype), dj


gather_rows_mm.defvjp(_fwd, _bwd)
