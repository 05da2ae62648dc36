"""Pallas TPU kernel: fused typed message + attention aggregation.

Fuses the flagship MPN step's tail — per-type edge-part contraction,
(target, source-type) selection, ReLU, per-(node, type) attention softmax and
weighted aggregation — into one VMEM-resident kernel per node tile:

    B_t     = edge_feats @ We[:, t]                  # accumulated per type
    m[s]    = relu(a[n_s, t_s] + B_{t_s}[s])         # typed message per slot
    attn[s] = edge_feats[s] @ w_attn
    S[r, s] = softmax over slots s of node(r) with type(r) (masked)
    out     = S @ m                                  # (nb*T, D)

The jnp path writes/reads an (E, T, D) tensor in HBM for the type selection
(~1 GB per step at flagship shapes); here only edge features stream in and
(N, T, D) updates stream out. Everything inside the kernel is rank-2
(mosaic has no >2D gather/reshape); selections are one-hot contractions on
the MXU.

Inputs are target-major blocked (ops.knn.knn_edges_target_major).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _kernel(ef_ref, a_ref, types_ref, valid_ref, we_ref, wa_ref, out_ref,
            *, nb, c, t, d):
    nbc = nb * c
    nbt = nb * t
    ef = ef_ref[:]                        # (nbc, De)
    types = types_ref[:]                  # (nbc, 1) int32
    valid = valid_ref[:]                  # (nbc, 1) int32
    a = a_ref[:].astype(jnp.float32)      # (nbt, D) node-part incl. bias

    # one-hot over types per slot: (nbc, T)
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (nbc, t), 1)
    hot = (types == t_iota)               # bool (nbc, T)
    hot_f = hot.astype(jnp.float32)

    # edge part: accumulate per-type contraction, selecting via hot columns
    b_sel = jnp.zeros((nbc, d), jnp.float32)
    for ti in range(t):
        bt = jax.lax.dot_general(
            ef, we_ref[:, ti * d:(ti + 1) * d],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        b_sel = b_sel + hot_f[:, ti:ti + 1] * bt

    # node part: rows of `a` selected by (node, type) one-hot matmul
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (nbc, nbt), 1)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (nbc, nbt), 0)
    row_n = row_iota // t
    row_t = row_iota - row_n * t
    slot_n = slot_iota // c
    sel = (row_n == slot_n) & (row_t == types)  # (nbc, nbt)
    a_sel = jax.lax.dot_general(
        sel.astype(jnp.float32), a,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                      # (nbc, D)

    m = jax.nn.relu(a_sel + b_sel)         # (nbc, D)

    # attention logits per slot, laid out as a row vector (1, nbc)
    attn_row = jax.lax.dot_general(
        wa_ref[:], ef,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                      # (heads, nbc); head 0 used

    # S (nbt, nbc): masked per-(node,type) softmax over slots
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (nbt, nbc), 0)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (nbt, nbc), 1)
    rn = r_iota // t
    rt = r_iota - rn * t
    sn = s_iota // c
    type_row = jax.lax.dot_general(
        jnp.ones((nbt, 1), jnp.float32), types.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)                    # (nbt, nbc) broadcast of types
    valid_row = jax.lax.dot_general(
        jnp.ones((nbt, 1), jnp.float32), valid.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                      # (nbt, nbc)
    ok = (rn == sn) & (type_row == rt) & (valid_row > 0)
    attn_b = jax.lax.dot_general(
        jnp.ones((nbt, 1), jnp.float32), attn_row[:1],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                      # (nbt, nbc)
    scores = jnp.where(ok, attn_b, _NEG)
    mx = jnp.max(scores, axis=1, keepdims=True)
    mx = jnp.where(mx <= _NEG / 2, 0.0, mx)
    e = jnp.exp(scores - mx) * ok.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-16)
    w = e / denom                          # (nbt, nbc)

    out = jax.lax.dot_general(
        w, m, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                      # (nbt, D)
    out_ref[:] = out.astype(out_ref.dtype)


def fused_typed_message_aggregate(
    edge_feats,   # (N*C, De) post-edge-MLP features
    a,            # (N, T, D) precomputed node-part incl. per-type bias
    types,        # (N*C,) source type per slot
    valid,        # (N*C,) slot validity
    we,           # (De, T*D) flattened per-type edge weights
    w_attn,       # (De, heads) attention projection (head 0 used)
    num_nodes: int,
    num_types: int,
    node_tile: int = 8,
    interpret: bool = False,
):
    """Returns updates (N, T, D) float32."""
    e, de = edge_feats.shape
    c = e // num_nodes
    d = a.shape[-1]
    nb = node_tile
    while num_nodes % nb or (nb * num_types) % 8 or (nb * c) % 8:
        nb -= 1
        if nb == 0:
            raise ValueError("no valid node tile for these shapes")

    grid = (num_nodes // nb,)
    out = pl.pallas_call(
        functools.partial(_kernel, nb=nb, c=c, t=num_types, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb * c, de), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb * num_types, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb * c, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb * c, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((de, num_types * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((de, w_attn.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nb * num_types, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((num_nodes * num_types, d), jnp.float32),
        interpret=interpret,
    )(
        edge_feats,
        a.reshape(num_nodes * num_types, d),
        types.astype(jnp.int32).reshape(num_nodes * c, 1),
        valid.astype(jnp.int32).reshape(num_nodes * c, 1),
        we,
        w_attn,
    )
    return out.reshape(num_nodes, num_types, d)
