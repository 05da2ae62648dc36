"""Connected components on padded static-shape graphs.

On-device replacement for scipy.sparse.csgraph.connected_components used in
pose assembly (reference: src/Utils/Utils.py:686-693). Min-label propagation
with pointer jumping: converges in O(log N) rounds on any graph, each round
two segment_min ops + a gather chain — all static-shape inside jit.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax


def connected_components(edge_index, edge_valid, num_nodes: int, node_valid=None,
                         blocked_c: int = 0):
    """Label each node with the minimum node index of its component.

    edge_index: (2, E) int32; edges are treated as undirected.
    Returns labels (N,) int32; invalid nodes keep their own index.

    At pose-graph sizes (N <= ~2k) the transitive closure is computed by
    repeated adjacency squaring — ceil(log2(N)) dense matmuls on the MXU —
    instead of data-dependent label propagation, which serializes into ~10
    sequential rounds of tiny scatter kernels (measured 140ms/batch vs ~2ms
    for the dense form on TPU at flagship shapes). Above the bound it falls
    back to min-label propagation with pointer jumping.

    ``blocked_c``: if >0 and the edges are in target-major blocked layout
    (edge_index[1] == slot // blocked_c), the adjacency is built with a
    scatter-free one-hot reduction — TPU scatters on (N, N) matrices cost
    milliseconds per image at flagship shapes.
    """
    if num_nodes <= 2048:
        return _connected_components_dense(
            edge_index, edge_valid, num_nodes, node_valid, blocked_c
        )
    return _connected_components_sparse(
        edge_index, edge_valid, num_nodes, node_valid
    )


def _connected_components_dense(edge_index, edge_valid, num_nodes: int,
                                node_valid=None, blocked_c: int = 0):
    src, dst = edge_index[0], edge_index[1]
    if blocked_c and src.shape[0] == num_nodes * blocked_c:
        # blocked layout: row n of the forward adjacency is an any-reduce of
        # one-hot source hits over its C in-edge slots; the reverse direction
        # is the transpose. No scatters, no 1-bit gathers.
        src_b = src.reshape(num_nodes, blocked_c)
        ev_b = edge_valid.reshape(num_nodes, blocked_c)
        iota = jnp.arange(num_nodes, dtype=src.dtype)
        fwd = jnp.any(
            (src_b[:, :, None] == iota[None, None, :]) & ev_b[:, :, None],
            axis=1,
        )
        und = fwd | fwd.T
        if node_valid is not None:
            und = und & node_valid[None, :] & node_valid[:, None]
        a = und.astype(jnp.float32) + jnp.eye(num_nodes, dtype=jnp.float32)
        a = jnp.minimum(a, 1.0)
    else:
        if node_valid is None:
            node_valid = jnp.ones((num_nodes,), bool)
        # int32 before the gathers: TPU gathers of 1-bit bools are ~20x
        # slower than word-sized ones
        nv = node_valid.astype(jnp.int32)
        ev = (edge_valid & (nv[src] > 0) & (nv[dst] > 0)).astype(jnp.float32)

        a = jnp.zeros((num_nodes, num_nodes), jnp.float32)
        a = a.at[dst, src].max(ev)
        a = a.at[src, dst].max(ev)
        a = a + jnp.eye(num_nodes, dtype=jnp.float32)
        a = jnp.minimum(a, 1.0)

    # squaring doubles reachable path length: ceil(log2(N)) rounds suffice
    rounds = max(1, math.ceil(math.log2(max(num_nodes, 2))))
    for _ in range(rounds):
        a = (jnp.dot(a, a, precision=jax.lax.Precision.DEFAULT) > 0).astype(
            jnp.float32
        )
    # first reachable index == min label of the component
    return jnp.argmax(a > 0, axis=1).astype(jnp.int32)


def _connected_components_sparse(edge_index, edge_valid, num_nodes: int, node_valid=None):
    src, dst = edge_index[0], edge_index[1]
    big = jnp.int32(num_nodes)

    if node_valid is None:
        node_valid = jnp.ones((num_nodes,), bool)
    ev = edge_valid & node_valid[src] & node_valid[dst]

    def body(state):
        labels, _ = state
        # propagate: pull the min label across each edge in both directions
        msg = jnp.where(ev, labels[src], big)
        pulled = jax.ops.segment_min(msg, dst, num_segments=num_nodes)
        msg2 = jnp.where(ev, labels[dst], big)
        pulled2 = jax.ops.segment_min(msg2, src, num_segments=num_nodes)
        new = jnp.minimum(labels, jnp.minimum(pulled, pulled2))
        # pointer jumping: label <- label of label (path halving)
        new = new[new]
        new = new[new]
        changed = jnp.any(new != labels)
        return new, changed

    def cond(state):
        return state[1]

    labels0 = jnp.arange(num_nodes, dtype=jnp.int32)
    labels, _ = lax.while_loop(cond, body, (labels0, jnp.bool_(True)))
    return labels


def relabel_compact(labels: jnp.ndarray, num_nodes: int) -> jnp.ndarray:
    """Map component labels to compact ids [0, n_components) in order of the
    component's representative index. Static-shape."""
    is_rep = labels == jnp.arange(num_nodes, dtype=labels.dtype)
    compact_of_rep = jnp.cumsum(is_rep.astype(jnp.int32)) - 1
    return compact_of_rep[labels]
