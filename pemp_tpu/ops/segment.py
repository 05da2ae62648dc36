"""Segment (scatter) operations on padded, static-shape graphs.

TPU-native replacement for the reference's torch_scatter calls
(reference: src/Models/MessagePassingNetwork/layers.py:5, 234-251). All ops
take a fixed ``num_segments`` so shapes are static under jit, and a validity
mask so padded elements never contribute.

The per-type aggregation that the reference computes with a python loop over
17 joint types (layers.py:234-240) is expressed here as a single segment op
over the combined index ``segment * num_types + type``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e30


def segment_sum(data, segment_ids, num_segments, valid=None):
    if valid is not None:
        data = jnp.where(_expand(valid, data), data, 0.0)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_max(data, segment_ids, num_segments, valid=None):
    if valid is not None:
        data = jnp.where(_expand(valid, data), data, _NEG)
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    # empty segments come back as -inf; zero them like torch_scatter does
    return jnp.where(out <= _NEG / 2, 0.0, out)


def segment_mean(data, segment_ids, num_segments, valid=None):
    ones = jnp.ones(data.shape[0], dtype=data.dtype)
    if valid is not None:
        ones = jnp.where(valid, ones, 0.0)
    total = segment_sum(data, segment_ids, num_segments, valid)
    count = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
    count = jnp.maximum(count, 1.0)
    return total / _expand_to(count, total)


def segment_softmax(scores, segment_ids, num_segments, valid=None):
    """Numerically-stable softmax within each segment.

    Replacement for torch_scatter.scatter_softmax
    (reference: layers.py:249). Invalid entries get weight 0.
    """
    if valid is not None:
        scores = jnp.where(valid, scores, _NEG)
    seg_max = jax.ops.segment_max(scores, segment_ids, num_segments=num_segments)
    seg_max = jnp.where(seg_max <= _NEG / 2, 0.0, seg_max)
    shifted = scores - seg_max[segment_ids]
    exp = jnp.exp(shifted)
    if valid is not None:
        exp = jnp.where(valid, exp, 0.0)
    denom = jax.ops.segment_sum(exp, segment_ids, num_segments=num_segments)
    denom = jnp.maximum(denom, 1e-16)
    return exp / denom[segment_ids]


def segment_aggregate(data, segment_ids, num_segments, kind, valid=None):
    if kind == "add":
        return segment_sum(data, segment_ids, num_segments, valid)
    if kind == "max":
        return segment_max(data, segment_ids, num_segments, valid)
    if kind == "mean":
        return segment_mean(data, segment_ids, num_segments, valid)
    raise NotImplementedError(kind)


def per_type_aggregate(data, target_ids, source_types, num_nodes, num_types, kind, valid=None):
    """updates[i, t] = aggr over edges e with target i and source type t.

    One segment op over combined index (reference computes this with a python
    loop of 17 scatters per MPN step, layers.py:234-240).

    Returns (num_nodes, num_types, D).
    """
    combined = target_ids * num_types + source_types
    out = segment_aggregate(data, combined, num_nodes * num_types, kind, valid)
    return out.reshape(num_nodes, num_types, data.shape[-1])


def per_type_attention_aggregate(
    data, attn_scores, target_ids, source_types, num_nodes, num_types, valid=None
):
    """Attention-weighted per-(target, source-type) sum.

    attn = softmax of attn_scores within each (target, source-type) group,
    matching the reference's scatter_softmax-per-type (layers.py:242-251).

    attn_scores: (E,) already gathered for the relevant attention head.
    Returns (num_nodes, num_types, D).
    """
    combined = target_ids * num_types + source_types
    attn = segment_softmax(attn_scores, combined, num_nodes * num_types, valid)
    weighted = data * attn[:, None]
    out = segment_sum(weighted, combined, num_nodes * num_types, valid)
    return out.reshape(num_nodes, num_types, data.shape[-1])


def _expand(valid, data):
    return valid.reshape(valid.shape + (1,) * (data.ndim - valid.ndim))


def _expand_to(x, ref):
    return x.reshape(x.shape + (1,) * (ref.ndim - x.ndim))


# ---------------------------------------------------------------------------
# Blocked (target-major) variants: edges arranged so node i's in-edges occupy
# slots [i*C, (i+1)*C). All "scatters" become dense per-block reductions —
# the fast path on TPU (no scatter lowering, pure VPU/MXU work).
# ---------------------------------------------------------------------------


def blocked_aggregate(data, num_nodes, kind, valid=None):
    """data (N*C, D) target-major -> (N, D) reduction over each block."""
    d = data.shape[-1]
    x = data.reshape(num_nodes, -1, d)
    if valid is not None:
        v = valid.reshape(num_nodes, -1, 1)
    else:
        v = None
    if kind == "add":
        if v is not None:
            x = jnp.where(v, x, 0.0)
        return x.sum(axis=1)
    if kind == "max":
        if v is not None:
            x = jnp.where(v, x, _NEG)
        out = x.max(axis=1)
        return jnp.where(out <= _NEG / 2, 0.0, out)
    if kind == "mean":
        if v is not None:
            x = jnp.where(v, x, 0.0)
            cnt = jnp.maximum(v.sum(axis=1), 1.0)
        else:
            cnt = jnp.float32(x.shape[1])
        return x.sum(axis=1) / cnt
    raise NotImplementedError(kind)


def blocked_per_type_aggregate(data, source_types, num_nodes, num_types, kind, valid=None):
    """(N*C, D) -> (N, T, D): reduce each block grouped by source type.

    One one-hot einsum instead of the reference's 17-scatter loop or a
    combined-index scatter: updates[n, t] = aggr over slots with type t.
    """
    d = data.shape[-1]
    x = data.reshape(num_nodes, -1, d)
    t = source_types.reshape(num_nodes, -1)
    hot = jax.nn.one_hot(t, num_types, dtype=data.dtype)  # (N, C, T)
    if valid is not None:
        hot = hot * valid.reshape(num_nodes, -1, 1).astype(data.dtype)
    if kind == "add":
        return jnp.einsum("nct,ncd->ntd", hot, x)
    if kind == "mean":
        s = jnp.einsum("nct,ncd->ntd", hot, x)
        cnt = jnp.maximum(hot.sum(axis=1), 1.0)
        return s / cnt[..., None]
    if kind == "max":
        big = jnp.where(hot[..., None] > 0, x[:, :, None, :], _NEG)  # (N, C, T, D)
        out = big.max(axis=1)
        return jnp.where(out <= _NEG / 2, 0.0, out)
    raise NotImplementedError(kind)


def blocked_per_type_attention_aggregate(data, attn_scores, source_types,
                                         num_nodes, num_types, valid=None):
    """Attention softmax within each (node, source-type) group, then sum.

    Dense masked softmax over the block axis; no segment ops.
    Returns (N, T, D).
    """
    d = data.shape[-1]
    x = data.reshape(num_nodes, -1, d)
    c = x.shape[1]
    t = source_types.reshape(num_nodes, c)
    a = attn_scores.reshape(num_nodes, c)
    hot = jax.nn.one_hot(t, num_types, dtype=data.dtype)  # (N, C, T)
    if valid is not None:
        hot = hot * valid.reshape(num_nodes, c, 1).astype(data.dtype)
    # masked softmax over slots within each type column
    neg = jnp.asarray(_NEG, data.dtype)
    scores = jnp.where(hot > 0, a[:, :, None], neg)  # (N, C, T)
    m = scores.max(axis=1, keepdims=True)
    m = jnp.where(m <= _NEG / 2, 0.0, m)
    e = jnp.exp(scores - m) * (hot > 0)
    denom = jnp.maximum(e.sum(axis=1, keepdims=True), 1e-16)
    w = e / denom  # (N, C, T)
    return jnp.einsum("nct,ncd->ntd", w, x)
