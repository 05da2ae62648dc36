"""On-device pose assembly: clustering -> person construction -> refinement.

TPU-native re-design of the reference's host-side decode chain
(reference: src/Utils/Utils.py:499-743 pred_to_person /
graph_cluster_to_persons, :1026-1104 refine, :917-936 adjust,
:1445-1490 pred_to_ann). The reference runs scipy connected components and
numpy loops per image; here everything through quarter-pixel adjustment is
static-shape jnp inside jit — only COCO JSON formatting stays on host.

Cluster methods:
  * "threshold": keep edges with sigmoid(edge_pred) > 0.8, connected
    components (reference: Utils.py:508-509)
  * "GAEC"/"KL"/"MUT": exact correlation clustering via the native C++ lib
    (pemp_tpu.cluster) on host, or the on-device threshold fallback
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pemp_tpu.ops.components import connected_components, relabel_compact


def cluster_threshold(edge_index, edge_valid, edge_pred, num_nodes, node_keep,
                      threshold: float = 0.8, blocked_c: int = 0):
    """Connected components over confident edges between kept nodes.

    Node masking happens inside ``connected_components`` (scatter-free on the
    blocked layout); here only the edge-confidence filter is applied.
    """
    ev = edge_valid & (edge_pred > threshold)
    labels = connected_components(
        edge_index, ev, num_nodes, node_keep, blocked_c=blocked_c
    )
    return labels


def persons_from_clusters(
    joint_det,      # (N, 3) x, y, type
    joint_scores,   # (N,) node scores (MPN sigmoid or detector)
    cluster_labels, # (N,) component label per node
    node_keep,      # (N,) bool — above-threshold valid nodes
    num_joints: int,
    max_persons: int = 30,
    class_probs=None,   # (N, C) optional reclassification
    allow_single_joint: bool = False,
):
    """Per-cluster per-type argmax-score keypoint selection.

    reference graph_cluster_to_persons: Utils.py:672-743. Returns
    persons (max_persons, J, 3) and person_valid (max_persons,).
    """
    n = joint_det.shape[0]
    compact = relabel_compact(cluster_labels, n)  # (N,) in [0, n)

    types = joint_det[:, 2]
    if class_probs is not None:
        types = jnp.argmax(class_probs, axis=-1).astype(types.dtype)

    keepf = node_keep.astype(jnp.float32)
    sizes = jax.ops.segment_sum(keepf, compact, num_segments=n)
    min_size = 1 if allow_single_joint else 2
    eligible = sizes >= min_size

    # stable slot assignment: eligible clusters in representative order
    rank = jnp.cumsum(eligible.astype(jnp.int32)) - 1
    slot = jnp.where(eligible & (rank < max_persons), rank, max_persons)
    node_slot = slot[compact]  # (N,), max_persons for dropped
    node_slot = jnp.where(node_keep, node_slot, max_persons)

    # per (slot, type) argmax of score
    seg = node_slot * num_joints + jnp.clip(types, 0, num_joints - 1)
    nseg = (max_persons + 1) * num_joints
    neg = -jnp.inf
    sc = jnp.where(node_keep, joint_scores, neg)
    best = jax.ops.segment_max(sc, seg, num_segments=nseg)
    is_best = (sc >= best[seg] - 1e-12) & node_keep
    # tie-break lowest node index
    node_ids = jnp.arange(n, dtype=jnp.int32)
    cand = jnp.where(is_best, node_ids, n)
    winner = jax.ops.segment_min(cand, seg, num_segments=nseg)  # (nseg,)
    has = (winner < n) & (best > neg / 2)

    winner_c = jnp.clip(winner, 0, n - 1)
    kx = joint_det[winner_c, 0].astype(jnp.float32)
    ky = joint_det[winner_c, 1].astype(jnp.float32)
    ks = jnp.where(has, best, 0.0)
    persons = jnp.stack(
        [jnp.where(has, kx, 0.0), jnp.where(has, ky, 0.0), ks], axis=-1
    ).reshape(max_persons + 1, num_joints, 3)[:max_persons]

    person_valid = jnp.any(persons[:, :, 2] > 0, axis=1)
    # single-joint-person score gate (reference: Utils.py:736-741)
    if allow_single_joint:
        njoints = jnp.sum(persons[:, :, 2] > 0, axis=1)
        weak_single = (njoints == 1) & (jnp.max(persons[:, :, 2], axis=1) < 0.1)
        person_valid = person_valid & ~weak_single
    return persons, person_valid


def fill_mean(persons, person_valid):
    """Missing joints <- mean of present joints (reference: Utils.py:1470-1472)."""
    present = persons[:, :, 2] > 0
    cnt = jnp.maximum(jnp.sum(present, axis=1, keepdims=True), 1)
    mean_xy = jnp.sum(
        jnp.where(present[..., None], persons[:, :, :2], 0.0), axis=1, keepdims=True
    ) / cnt[..., None]
    filled_xy = jnp.where(present[..., None], persons[:, :, :2], mean_xy)
    out = jnp.concatenate([filled_xy, persons[:, :, 2:]], axis=-1)
    return jnp.where(person_valid[:, None, None], out, persons)


def refine_ae(scoremaps, tagmaps, persons, person_valid, channels_last=False):
    """AE-based missing-joint fill-in (reference refine: Utils.py:1026-1104).

    scoremaps: (J, H, W); tagmaps: (J, H, W) or (J, H, W, S) with TTA tag
    channels — or, with ``channels_last=True``, (H, W, J) / (H, W, J, S)
    (the model's native NHWC layout, skipping the ~ms-scale JHW transpose).
    For each person: per-channel mean tag over present joints; for
    each joint type argmax over the map of score - round(||tag - mean||)
    (vector norm over channels, reference Utils.py:1100); add joints not yet
    present with score 1e-3.
    """
    if channels_last:
        h, w, j = scoremaps.shape
    else:
        j, h, w = scoremaps.shape
    if tagmaps.ndim == 3:
        tagmaps = tagmaps[..., None]

    present = persons[:, :, 2] > 0  # (P, J)
    ptypes = jnp.arange(j)
    px = jnp.clip(persons[:, :, 0].astype(jnp.int32), 0, w - 1)
    py = jnp.clip(persons[:, :, 1].astype(jnp.int32), 0, h - 1)
    if channels_last:
        tag_at = tagmaps[py, px, ptypes[None, :]]  # (P, J, S)
    else:
        tag_at = tagmaps[ptypes[None, :], py, px]  # (P, J, S)
    cnt = jnp.maximum(jnp.sum(present, axis=1), 1)
    mean_tag = (
        jnp.sum(jnp.where(present[..., None], tag_at, 0.0), axis=1)
        / cnt[:, None]
    )  # (P, S)

    # flat y*w+x index grid: argmax without the (J, H*W) reshape, whose
    # layout conversion costs ~2ms/batch inside the chunk loop
    iota_yx = (
        jnp.arange(h, dtype=jnp.int32)[:, None] * w
        + jnp.arange(w, dtype=jnp.int32)[None, :]
    )
    hw_axes = (0, 1) if channels_last else (1, 2)
    iota_b = iota_yx[..., None] if channels_last else iota_yx[None]

    def sm_at(yy, xx):
        return scoremaps[yy, xx, ptypes] if channels_last else scoremaps[ptypes, yy, xx]

    def per_person(mtag):
        if channels_last:
            diff = tagmaps - mtag[None, None, None, :]   # (H, W, J, S)
        else:
            diff = tagmaps - mtag[None, None, None, :]   # (J, H, W, S)
        tt = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))
        tmp2 = scoremaps - jnp.round(tt)
        if channels_last:
            # (H, W, J) -> (H*W, J) is layout-free, so a single fused argmax
            # (first max = lowest flat index, matching np.argmax) replaces
            # the max + where-min double pass (~halves refine passes)
            idx = jnp.argmax(tmp2.reshape(h * w, j), axis=0).astype(jnp.int32)
        else:
            amax = jnp.max(tmp2, axis=hw_axes, keepdims=True)
            # ties resolve to the lowest flat index, matching argmax-over-flat
            idx = jnp.min(
                jnp.where(tmp2 >= amax, iota_b, h * w), axis=hw_axes
            )
        yy, xx = idx // w, idx % w
        val = sm_at(yy, xx)
        x = xx.astype(jnp.float32) + 0.5
        y = yy.astype(jnp.float32) + 0.5
        right = sm_at(yy, jnp.minimum(xx + 1, w - 1))
        left = sm_at(yy, jnp.maximum(xx - 1, 0))
        x = x + jnp.where(right > left, 0.25, -0.25)
        down = sm_at(jnp.minimum(yy + 1, h - 1), xx)
        up = sm_at(jnp.maximum(yy - 1, 0), xx)
        y = y + jnp.where(down > up, 0.25, -0.25)
        return jnp.stack([x, y, val], axis=-1)  # (J, 3)

    p = mean_tag.shape[0]
    if channels_last:
        # joint-major loop, fully person-vectorized: each of the J iterations
        # works on a (P, H, W) slab (~P*HW*4 bytes) instead of the person-
        # chunked (chunk, H, W, J) slabs — smaller live set, better fusion
        sm_hwj = scoremaps  # (H, W, J)

        def per_joint(ji):
            tj = jax.lax.dynamic_index_in_dim(tagmaps, ji, 2)       # (H, W, 1, S) -> squeeze
            tj = tj[:, :, 0, :]                                      # (H, W, S)
            smj = jax.lax.dynamic_index_in_dim(sm_hwj, ji, 2)[:, :, 0]  # (H, W)
            diff = tj[None] - mean_tag[:, None, None, :]             # (P, H, W, S)
            tt = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))
            tmp2 = smj[None] - jnp.round(tt)                         # (P, H, W)
            idx = jnp.argmax(tmp2.reshape(p, h * w), axis=1).astype(jnp.int32)
            yy, xx = idx // w, idx % w
            val = smj[yy, xx]
            x = xx.astype(jnp.float32) + 0.5
            y = yy.astype(jnp.float32) + 0.5
            right = smj[yy, jnp.minimum(xx + 1, w - 1)]
            left = smj[yy, jnp.maximum(xx - 1, 0)]
            x = x + jnp.where(right > left, 0.25, -0.25)
            down = smj[jnp.minimum(yy + 1, h - 1), xx]
            up = smj[jnp.maximum(yy - 1, 0), xx]
            y = y + jnp.where(down > up, 0.25, -0.25)
            return jnp.stack([x, y, val], axis=-1)                   # (P, 3)

        ans = jax.lax.map(per_joint, jnp.arange(j, dtype=jnp.int32))  # (J, P, 3)
        ans = jnp.transpose(ans, (1, 0, 2))                           # (P, J, 3)
    else:
        # chunked vmap: parallel enough to fill the VPU, bounded peak memory
        # (full vmap would materialize P x (J, H, W) workspaces at once —
        # heavy at full-res TTA canvases; fully sequential lax.map is
        # latency-bound)
        chunk = max(1, min(p, int(64 * 1024 * 1024 / max(tagmaps.size * 4, 1))))
        while p % chunk:
            chunk -= 1
        ans = jax.lax.map(
            jax.vmap(per_person), mean_tag.reshape(p // chunk, chunk, -1)
        )
        ans = ans.reshape(p, j, 3)
    add = (~present) & (ans[:, :, 2] > 0) & person_valid[:, None]
    new_xy = jnp.where(add[..., None], ans[:, :, :2], persons[:, :, :2])
    new_s = jnp.where(add, 1e-3, persons[:, :, 2])
    return jnp.concatenate([new_xy, new_s[..., None]], axis=-1)


def adjust_quarter(scoremaps, persons, channels_last=False):
    """Quarter-pixel shift toward the larger neighbour + 0.5 offset.

    reference adjust: Utils.py:917-936 (the reference's swapped variable
    names net out to the standard per-axis comparison).
    scoremaps: (J, H, W), or (H, W, J) with ``channels_last=True``.
    """
    if channels_last:
        h, w, j = scoremaps.shape
    else:
        j, h, w = scoremaps.shape
    ptypes = jnp.arange(j)[None, :]

    def sm_at(yy, xx):
        return scoremaps[yy, xx, ptypes] if channels_last else scoremaps[ptypes, yy, xx]

    x = persons[:, :, 0]
    y = persons[:, :, 1]
    xi = jnp.clip(x.astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(y.astype(jnp.int32), 0, h - 1)
    right = sm_at(yi, jnp.minimum(xi + 1, w - 1))
    left = sm_at(yi, jnp.maximum(xi - 1, 0))
    down = sm_at(jnp.minimum(yi + 1, h - 1), xi)
    up = sm_at(jnp.maximum(yi - 1, 0), xi)
    nx = xi.astype(jnp.float32) + jnp.where(right > left, 0.25, -0.25) + 0.5
    ny = yi.astype(jnp.float32) + jnp.where(down > up, 0.25, -0.25) + 0.5
    has = persons[:, :, 2] > 0
    out_x = jnp.where(has, nx, persons[:, :, 0])
    out_y = jnp.where(has, ny, persons[:, :, 1])
    return jnp.stack([out_x, out_y, persons[:, :, 2]], axis=-1)


def decode_poses(
    scoremaps,       # (J, H, W)
    tagmaps,         # (J, H, W)
    joint_det,       # (N, 3)
    node_scores,     # (N,) sigmoid node preds (or detector scores)
    edge_index,      # (2, E)
    edge_valid,      # (E,)
    edge_pred,       # (E,) sigmoid edge preds
    node_valid,      # (N,)
    node_threshold: float,
    num_joints: int,
    class_probs=None,
    cc_threshold: float = 0.8,
    max_persons: int = 30,
    with_fill_mean: bool = True,
    with_refine: bool = True,
    with_adjust: bool = True,
    with_filter: bool = False,
    cluster_labels=None,
    blocked_c: int = 0,
    channels_last: bool = False,
):
    """Full on-device decode: threshold -> cluster -> assemble -> refine -> adjust.

    reference pred_to_ann: Utils.py:1445-1478 (everything before
    reverse_affine_map). Pass ``cluster_labels`` to use an externally computed
    clustering (e.g. C++ GAEC) instead of the on-device threshold CC.
    ``blocked_c``: target-major blocked slot count (enables the scatter-free
    clustering path; see ops.components.connected_components).
    ``channels_last``: scoremaps/tagmaps are (H, W, J[, S]) — the model's
    native NHWC layout — instead of (J, H, W[, S]); skips the transposes.
    """
    n = joint_det.shape[0]
    node_keep = node_valid & (node_scores > node_threshold)
    if cluster_labels is None:
        cluster_labels = cluster_threshold(
            edge_index, edge_valid, edge_pred, n, node_keep, cc_threshold,
            blocked_c=blocked_c,
        )
    persons, person_valid = persons_from_clusters(
        joint_det, node_scores, cluster_labels, node_keep, num_joints,
        max_persons, class_probs,
    )
    if with_filter:
        person_valid = person_valid & (jnp.max(persons[:, :, 2], axis=1) > 0.25)
    if with_fill_mean:
        persons = fill_mean(persons, person_valid)
    if with_refine:
        persons = refine_ae(
            scoremaps, tagmaps, persons, person_valid, channels_last=channels_last
        )
    if with_adjust:
        persons = adjust_quarter(scoremaps, persons, channels_last=channels_last)
    return persons, person_valid
