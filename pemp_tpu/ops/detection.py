"""Keypoint candidate extraction: max-pool NMS + per-type top-K.

TPU-native, fixed-shape replacement for the reference's dynamic
``joint_det_from_scoremap`` (reference: src/graph_constructor/ConstructGraph.py:1161-1196)
and ``non_maximum_suppression`` (reference: src/Utils/Utils.py:15-20).

The reference returns a variable-length detection list per image (union of
per-type top-``hybrid_k`` and above-threshold NMS peaks). Here every image
yields exactly ``J * K`` padded detections with a validity mask reproducing
the same selection rule:

    valid = (score > 0) & ((rank < hybrid_k) | (score >= threshold))

where rank is the per-type descending-score rank of the NMS-masked scoremap.
This is exact whenever at most K detections per type pass the rule (K
defaults to 40; the reference's threshold 0.1 yields far fewer in practice).

Everything is batched over images and runs inside jit — the dynamic shape at
the root of the reference's per-image python loop is gone.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nms_mask(scoremaps: jnp.ndarray, pool_kernel: int) -> jnp.ndarray:
    """Boolean local-maxima mask via max-pool equality.

    scoremaps: (..., H, W). reference: src/Utils/Utils.py:15-20.
    """
    assert pool_kernel % 2 == 1
    pad = pool_kernel // 2
    nd = scoremaps.ndim
    window = (1,) * (nd - 2) + (pool_kernel, pool_kernel)
    strides = (1,) * nd
    pooled = jax.lax.reduce_window(
        scoremaps,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=window,
        window_strides=strides,
        padding=((0, 0),) * (nd - 2) + (((pad, pad),) * 2),
    )
    return jnp.equal(pooled, scoremaps)


def blocked_top_k(flat: jnp.ndarray, k: int, block: int = 2048):
    """Exact top-k over the last axis via per-block top-k + reduce.

    The global top-k is a subset of the union of per-block top-k, so taking
    top-k within each ``block``-sized chunk and then top-k over the
    candidates is exact. On TPU ``lax.top_k`` lowers to a sort of the whole
    row; splitting a 100k-element row into 2k blocks sorts ~1.7x fewer
    element-comparisons and parallelises across sublanes — ~3x faster at the
    detection stage's (B, J, H*W) shapes.
    """
    n = flat.shape[-1]
    if n <= block or n % block:
        return jax.lax.top_k(flat, k)
    nb = n // block
    kb = min(k, block)
    resh = flat.reshape(*flat.shape[:-1], nb, block)
    s1, i1 = jax.lax.top_k(resh, kb)  # (..., nb, kb)
    base = (jnp.arange(nb, dtype=i1.dtype) * block)[:, None]
    i1 = (i1 + base).reshape(*flat.shape[:-1], nb * kb)
    s1 = s1.reshape(*flat.shape[:-1], nb * kb)
    s2, i2 = jax.lax.top_k(s1, k)
    return s2, jnp.take_along_axis(i1, i2, axis=-1)


def joint_det_from_scoremaps(
    scoremaps: jnp.ndarray,
    k_per_type: int,
    threshold: float | None,
    pool_kernel: int = 3,
    mask: jnp.ndarray | None = None,
    hybrid_k: int = 5,
):
    """Batched fixed-shape detection.

    scoremaps: (B, J, H, W) float; mask: (B, H, W) crowd mask or None.

    Returns:
      joint_det:   (B, J*K, 3) int32 — (x, y, type); type-blocked layout:
                   node ``n`` has type ``n // K``.
      joint_scores:(B, J*K) float — scoremap value at the detection.
      valid:       (B, J*K) bool.
    """
    b, j, h, w = scoremaps.shape
    peaks = nms_mask(scoremaps, pool_kernel).astype(scoremaps.dtype)
    if mask is not None:
        peaks = peaks * mask[:, None, :, :].astype(scoremaps.dtype)
    masked = scoremaps * peaks  # zero where not an NMS peak (or crowd-masked)

    flat = masked.reshape(b, j, h * w)
    scores, idx = blocked_top_k(flat, k_per_type)  # (B, J, K) each
    xs = (idx % w).astype(jnp.int32)
    ys = (idx // w).astype(jnp.int32)
    types = jnp.broadcast_to(
        jnp.arange(j, dtype=jnp.int32)[None, :, None], (b, j, k_per_type)
    )

    if threshold is not None:
        rank = jnp.broadcast_to(
            jnp.arange(k_per_type, dtype=jnp.int32)[None, None, :], (b, j, k_per_type)
        )
        valid = (scores > 0) & ((rank < hybrid_k) | (scores >= threshold))
    else:
        # reference no-threshold mode: exact top-20 per type, all kept
        # (scores get +1e-10 so zero-score entries survive; ConstructGraph.py:1184-1195)
        valid = jnp.ones_like(scores, dtype=bool)
        scores = scores + 1e-10

    # park invalid detections at (0, 0) but keep the type column intact so the
    # type-blocked layout (type(n) == n // K) holds for padded nodes too;
    # downstream ops must honour `valid`
    xs = jnp.where(valid, xs, 0)
    ys = jnp.where(valid, ys, 0)
    joint_det = jnp.stack([xs, ys, types], axis=-1).reshape(b, j * k_per_type, 3)
    joint_scores = scores.reshape(b, j * k_per_type)
    valid = valid.reshape(b, j * k_per_type)
    return joint_det, joint_scores, valid
