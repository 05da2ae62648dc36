"""Pallas TPU kernel: fused blocked per-type attention aggregation.

The flagship MPN's hottest non-matmul op: for each node, softmax its in-edge
attention scores within each (source-type) group and accumulate the weighted
messages — ``updates[n, t] = sum_c softmax_t(attn)[c] * m[n*C + c]``.

The jnp version materializes (N, C, T) one-hot/softmax intermediates in HBM
across several fused-op boundaries; this kernel keeps everything for a tile
of nodes in VMEM and writes only the (N, T, D) result: one HBM read of the
messages, one write of the output.

Inputs are target-major blocked (see ops.knn.knn_edges_target_major):
  m:     (N*C, D) messages
  attn:  (N*C,)   per-edge attention logits
  types: (N*C,)   source type per edge
  valid: (N*C,)   edge validity
Output: (N, T, D).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _kernel(m_ref, attn_ref, types_ref, valid_ref, out_ref, *, nb, c, t, d):
    m = m_ref[:].reshape(nb, c, d)
    attn = attn_ref[:]   # (nb, c)
    types = types_ref[:]
    valid = valid_ref[:]

    type_ids = jax.lax.broadcasted_iota(jnp.int32, (nb, c, t), 2)
    hot = (types[:, :, None] == type_ids) & (valid[:, :, None] != 0)

    scores = jnp.where(hot, attn[:, :, None], _NEG)  # (NB, C, T)
    mx = jnp.max(scores, axis=1, keepdims=True)
    mx = jnp.where(mx <= _NEG / 2, 0.0, mx)
    e = jnp.exp(scores - mx) * hot.astype(scores.dtype)
    denom = jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-16)
    w = e / denom  # (NB, C, T)

    out = jax.lax.dot_general(
        w, m,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (NB, T, D)
    out_ref[:] = out.reshape(nb * t, d).astype(out_ref.dtype)


def blocked_per_type_attention_aggregate_pallas(
    m, attn, types, num_nodes, num_types, valid, node_tile: int = 8,
    interpret: bool = False,
):
    """Drop-in for ops.segment.blocked_per_type_attention_aggregate."""
    e, d = m.shape
    c = e // num_nodes
    nb = node_tile
    while num_nodes % nb:
        nb -= 1

    grid = (num_nodes // nb,)
    out = pl.pallas_call(
        functools.partial(_kernel, nb=nb, c=c, t=num_types, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb * c, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb * num_types, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_nodes * num_types, d), m.dtype),
        interpret=interpret,
    )(
        m,
        attn.astype(jnp.float32).reshape(num_nodes, c),
        types.astype(jnp.int32).reshape(num_nodes, c),
        valid.astype(jnp.int32).reshape(num_nodes, c),
    )
    return out.reshape(num_nodes, num_types, d)
