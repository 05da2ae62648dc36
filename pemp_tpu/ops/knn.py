"""Fixed-shape graph construction primitives.

TPU-native replacement for torch_geometric's knn_graph / dense_to_sparse
graph builders (reference: src/graph_constructor/ConstructGraph.py:363-449).

All builders emit a static-shape directed edge list
``edge_index (2, E), edge_valid (E,)`` with the reference's
``to_undirected + remove_self_loops`` semantics reproduced by masking:

  * edges are emitted in a forward block (i -> its k neighbours) and a
    reverse block (neighbour -> i)
  * a reverse copy that duplicates an existing forward edge (mutual kNN)
    is marked invalid, matching coalescing in to_undirected
  * edges touching padded (invalid) nodes are invalid

Convention matches the reference MPN: ``edge_index[0]`` is the message
source j, ``edge_index[1]`` the target i (layers.py:210).

The forward block is source-major: edges [s*k, (s+1)*k) all have source s.
With type-blocked nodes this makes the per-type MPN ops statically blocked.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

BIG = 1e9


def pairwise_dist2(pos: jnp.ndarray) -> jnp.ndarray:
    diff = pos[:, None, :] - pos[None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def knn_edges(pos: jnp.ndarray, valid: jnp.ndarray, k: int):
    """kNN graph over valid nodes (euclidean on (N, D) positions).

    Returns edge_index (2, 2*N*k) int32, edge_valid (2*N*k) bool.
    reference: ConstructGraph.py:363-368 (knn_mpn_graph, k=50, undirected,
    no self loops).
    """
    n = pos.shape[0]
    k = min(k, max(n - 1, 1))
    d2 = pairwise_dist2(pos.astype(jnp.float32))
    invalid = ~valid
    d2 = d2 + jnp.where(invalid[None, :], BIG, 0.0)  # never pick invalid nbrs
    d2 = d2 + jnp.where(invalid[:, None], BIG, 0.0)  # invalid srcs get junk
    d2 = d2 + jnp.eye(n, dtype=d2.dtype) * BIG       # no self loops

    neg_d, nbr = lax.top_k(-d2, k)  # (N, k)
    nbr_dist_ok = (-neg_d) < BIG / 2

    src_fwd = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, k))
    dst_fwd = nbr.astype(jnp.int32)
    fwd_valid = valid[:, None] & valid[dst_fwd] & nbr_dist_ok

    # mutual test: is i within knn(nbr[i, m])? then the reverse copy of
    # (i -> nbr) duplicates the forward edge (nbr -> i): drop it.
    nbr_of_nbr = nbr[dst_fwd]  # (N, k, k)
    mutual = jnp.any(nbr_of_nbr == src_fwd[:, :, None], axis=-1)

    src_rev = dst_fwd
    dst_rev = src_fwd
    rev_valid = fwd_valid & ~mutual

    edge_src = jnp.concatenate([src_fwd.reshape(-1), src_rev.reshape(-1)])
    edge_dst = jnp.concatenate([dst_fwd.reshape(-1), dst_rev.reshape(-1)])
    edge_valid = jnp.concatenate([fwd_valid.reshape(-1), rev_valid.reshape(-1)])
    return jnp.stack([edge_src, edge_dst]), edge_valid


def fully_connected_edges(valid: jnp.ndarray):
    """All-pairs directed edges without self loops.

    reference: ConstructGraph.py:376-381. E = N*(N-1); static.
    """
    n = valid.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    src = jnp.repeat(idx, n)
    dst = jnp.tile(idx, n)
    keep = src != dst
    # compress out the diagonal to a static (N*(N-1),) edge list
    order = jnp.argsort(~keep, stable=True)[: n * (n - 1)]
    src, dst = src[order], dst[order]
    edge_valid = valid[src] & valid[dst]
    return jnp.stack([src, dst]), edge_valid


def feature_knn_edges(features: jnp.ndarray, valid: jnp.ndarray, k: int):
    """kNN in feature space. reference: ConstructGraph.py:370-374."""
    return knn_edges(features, valid, k)


def score_based_edges(pos: jnp.ndarray, valid: jnp.ndarray, scores: jnp.ndarray, k: int):
    """Root-joint graph: top-k scoring nodes connect to everyone (undirected).

    reference: ConstructGraph.py:405-422. Emitted as a fixed (2, 2*N*k) list:
    for each of the k roots r: edges (r -> all) and (all -> r); duplicates
    between two roots are masked like to_undirected coalescing.
    """
    n = pos.shape[0]
    s = jnp.where(valid, scores, -jnp.inf)
    _, roots = lax.top_k(s, k)  # (k,)
    all_idx = jnp.arange(n, dtype=jnp.int32)

    src_fwd = jnp.broadcast_to(roots[:, None].astype(jnp.int32), (k, n))
    dst_fwd = jnp.broadcast_to(all_idx[None, :], (k, n))
    is_root = jnp.zeros(n, dtype=bool).at[roots].set(True)
    fwd_valid = valid[src_fwd] & valid[dst_fwd] & (src_fwd != dst_fwd)
    # root->root pairs appear in both root blocks; keep only src < dst copy
    dup_fwd = is_root[dst_fwd] & (src_fwd > dst_fwd)
    fwd_valid &= ~dup_fwd

    src_rev, dst_rev = dst_fwd, src_fwd
    rev_valid = fwd_valid & ~is_root[dst_fwd]  # root->root reverse covered

    edge_src = jnp.concatenate([src_fwd.reshape(-1), src_rev.reshape(-1)])
    edge_dst = jnp.concatenate([dst_fwd.reshape(-1), dst_rev.reshape(-1)])
    edge_valid = jnp.concatenate([fwd_valid.reshape(-1), rev_valid.reshape(-1)])
    return jnp.stack([edge_src, edge_dst]), edge_valid


def top_k_per_type_edges(pos: jnp.ndarray, valid: jnp.ndarray, types: jnp.ndarray,
                         num_types: int, k: int):
    """Each node connects to its k nearest neighbours of every type.

    reference: ConstructGraph.py:383-403 (top_k_mpn_graph, k=10). Static
    shape (2, 2*N*num_types*k).
    """
    n = pos.shape[0]
    d2 = pairwise_dist2(pos.astype(jnp.float32))
    d2 = d2 + jnp.where(~valid[None, :], BIG, 0.0)
    d2 = d2 + jnp.eye(n, dtype=d2.dtype) * BIG
    # (N, T, N): distance restricted to columns of type t
    type_mask = types[None, :] == jnp.arange(num_types, dtype=types.dtype)[:, None]
    d2t = d2[:, None, :] + jnp.where(type_mask[None, :, :], 0.0, BIG)
    neg_d, nbr = lax.top_k(-d2t.reshape(n * num_types, n), k)
    ok = (-neg_d) < BIG / 2

    src_fwd = jnp.repeat(jnp.arange(n, dtype=jnp.int32), num_types * k).reshape(n * num_types, k)
    dst_fwd = nbr.astype(jnp.int32)
    fwd_valid = ok & valid[src_fwd] & valid[dst_fwd]

    nbr_flat = nbr.reshape(n, num_types * k)
    # mutual: forward edge (s -> d); reverse (d -> s) duplicates if s in knn-of-d
    mutual = jnp.any(
        nbr_flat[dst_fwd] == src_fwd[:, :, None], axis=-1
    )
    rev_valid = fwd_valid & ~mutual

    edge_src = jnp.concatenate([src_fwd.reshape(-1), dst_fwd.reshape(-1)])
    edge_dst = jnp.concatenate([dst_fwd.reshape(-1), src_fwd.reshape(-1)])
    edge_valid = jnp.concatenate([fwd_valid.reshape(-1), rev_valid.reshape(-1)])
    return jnp.stack([edge_src, edge_dst]), edge_valid


def knn_edges_target_major(pos: jnp.ndarray, valid: jnp.ndarray, k: int,
                           cap_in: int | None = None, symmetric: bool = False):
    """Undirected kNN edges in a *target-major blocked* layout.

    Same edge set as :func:`knn_edges` (kNN union its transpose, no self
    loops, coalesced), but arranged so that the in-edges of node ``i`` occupy
    the static slot range ``[i*C, (i+1)*C)`` with ``C = k + cap_in``:

      * slots [i*C, i*C+k): sources = knn(i)  (i's own neighbour list)
      * slots [i*C+k, (i+1)*C): sources j with i in knn(j) and j not in
        knn(i) (the asymmetric transpose edges), placed by rank; entries
        beyond ``cap_in`` are dropped (rare for 2-D point sets; the kNN
        in-degree is geometrically bounded).

    ``symmetric=True`` additionally drops the A-side reverse of every
    truncated B-edge, so the emitted edge set is exactly symmetric (every
    valid edge's reverse is a valid slot). This enables the reverse-
    permutation typed projection (:func:`reverse_edge_perm`) and replaces
    the asymmetric-truncation deviation with a symmetric one; when
    ``cap_in`` never binds the two modes emit identical edges.

    This layout lets the MPN aggregate with dense per-block reductions
    instead of scatters — the TPU-native replacement for torch_scatter.
    Returns edge_index (2, N*C) int32 (edge_index[1] == slot // C) and
    edge_valid (N*C,).
    """
    n = pos.shape[0]
    k = min(k, max(n - 1, 1))
    if cap_in is None:
        cap_in = k
    c = k + cap_in

    d2 = pairwise_dist2(pos.astype(jnp.float32))
    invalid = ~valid
    d2 = d2 + jnp.where(invalid[None, :], BIG, 0.0)
    d2 = d2 + jnp.where(invalid[:, None], BIG, 0.0)
    d2 = d2 + jnp.eye(n, dtype=d2.dtype) * BIG
    neg_d, nbr = lax.top_k(-d2, k)
    # neighbours of invalid columns carry +BIG distance, so the distance test
    # subsumes a valid[nbr] gather (TPU bool gathers cost ~2.6ms/batch here)
    nbr_ok = ((-neg_d) < BIG / 2) & valid[:, None]

    # block A: j -> i for j in knn(i): target-major by construction
    src_a = nbr.astype(jnp.int32)          # (N, k)
    valid_a = nbr_ok

    # block B: the transpose edges i' -> t where t = knn(i')[m], excluding
    # mutual pairs (already covered by block A of t)
    mutual = jnp.any(nbr[src_a] == jnp.arange(n, dtype=nbr.dtype)[:, None, None], axis=-1)
    # mutual[i, m] == True iff i in knn(nbr[i, m])
    fwd_src = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, k)).reshape(-1)
    fwd_dst = nbr.reshape(-1).astype(jnp.int32)
    fwd_keep = (nbr_ok & ~mutual).reshape(-1)

    # slot each kept forward edge into its *target's* B-region by rank.
    # lax.sort carries the payload through the sort (argsort + apply-gathers
    # cost ~4ms/batch on TPU); after the sort each target's edges form a
    # contiguous run, so the dense (n, cap_in) B-region is one row-windowed
    # gather from the sorted list — no scatters at all.
    tgt = jnp.where(fwd_keep, fwd_dst, n)  # park dropped at n
    slot_ids = jnp.arange(n * k, dtype=jnp.int32)
    if symmetric:
        # extra slot-id payload: needed to scatter the kept flags back
        tgt_sorted, src_sorted, slot_sorted = lax.sort(
            (tgt, fwd_src, slot_ids), dimension=0, is_stable=True, num_keys=1
        )
    else:
        tgt_sorted, src_sorted = lax.sort(
            (tgt, fwd_src), dimension=0, is_stable=True, num_keys=1
        )
    nodes = jnp.arange(n, dtype=jnp.int32)
    counts = jnp.sum(
        (tgt_sorted[None, :] == nodes[:, None]).astype(jnp.int32), axis=1
    )                                                    # (n,)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]
    )
    if symmetric:
        # kept[f]: the forward edge at slot f survived the B-region cap.
        # A-slot (i, m) is the reverse of forward slot i*k+m, so dropping
        # A-edges whose non-mutual reverse was truncated keeps the emitted
        # edge set exactly symmetric (mutual pairs live in two A-regions and
        # are never dropped).
        rank = slot_ids - starts[jnp.clip(tgt_sorted, 0, n - 1)]
        kept_sorted = (rank < cap_in) & (tgt_sorted < n)
        kept = jnp.zeros((n * k,), bool).at[slot_sorted].set(kept_sorted)
        valid_a = valid_a & (mutual | kept.reshape(n, k))
    r_iota = jnp.arange(cap_in, dtype=jnp.int32)
    pos = starts[:, None] + r_iota[None, :]              # (n, cap)
    valid_b = r_iota[None, :] < jnp.minimum(counts, cap_in)[:, None]
    src_b = jnp.where(
        valid_b,
        src_sorted[jnp.clip(pos, 0, tgt_sorted.shape[0] - 1)],
        0,
    )                                                    # (n, cap)

    # assemble: A-region slots i*C..i*C+k, B-region columns k..C
    edge_src = jnp.concatenate([src_a, src_b], axis=1).reshape(-1)
    edge_valid = jnp.concatenate([valid_a, valid_b], axis=1).reshape(-1)
    edge_dst = jnp.repeat(jnp.arange(n, dtype=jnp.int32), c)
    return jnp.stack([edge_src, edge_dst]), edge_valid


def reverse_edge_perm(edge_src: jnp.ndarray, edge_valid: jnp.ndarray,
                      num_nodes: int, c: int) -> jnp.ndarray:
    """Slot index of each edge's reverse in the target-major blocked layout.

    Requires the *symmetric* layout (``knn_edges_target_major(...,
    symmetric=True)``): every valid edge (s -> i) has its unique valid
    reverse (i -> s) somewhere in block s. Returns R (E,) int32 with
    R[R[e]] == e for all valid edges (arbitrary for invalid slots).

    R is loop-invariant across MPN steps; it turns the per-source-type
    message projection into statically type-blocked batched matmuls
    (see models.mpn.layers.TypeAwareSplitLinear) because slot f's source
    type equals the (static) type of node f // C.
    """
    src_blocks = edge_src.reshape(num_nodes, c)
    vb = edge_valid.reshape(num_nodes, c)
    dst = jnp.repeat(jnp.arange(num_nodes, dtype=edge_src.dtype), c)
    cand = src_blocks[edge_src]            # (E, C): sources in block src(e)
    cand_ok = vb[edge_src]
    match = (cand == dst[:, None]) & cand_ok
    m = jnp.argmax(match, axis=1).astype(edge_src.dtype)
    return edge_src * c + m


def score_based_per_type_edges(pos: jnp.ndarray, valid: jnp.ndarray,
                               types: jnp.ndarray, scores: jnp.ndarray,
                               num_types: int, k_per_type: int,
                               nodes_per_type: int, score_threshold: float = 0.1):
    """Root-joint graph with top-k roots per type plus high-score rows.

    reference: ConstructGraph.py:424-449 (score_based_k_per_type, k=2,
    threshold 0.1). Emitted as a fully-connected list with row selection via
    the validity mask: a directed edge (i -> j) is valid when i or j is a
    selected root (to_undirected union), matching the reference's
    dense_to_sparse(adj | adjᵀ) semantics.
    """
    n = pos.shape[0]
    s = jnp.where(valid, scores, -jnp.inf).reshape(num_types, nodes_per_type)
    _, top_idx = lax.top_k(s, k_per_type)  # (T, k)
    base = (jnp.arange(num_types, dtype=jnp.int32) * nodes_per_type)[:, None]
    roots = (top_idx.astype(jnp.int32) + base).reshape(-1)
    is_root = jnp.zeros((n,), bool).at[roots].set(True)
    is_root = is_root | (jnp.where(valid, scores, 0.0) > score_threshold)
    is_root = is_root & valid

    edge_index, edge_valid = fully_connected_edges(valid)
    src, dst = edge_index[0], edge_index[1]
    edge_valid = edge_valid & (is_root[src] | is_root[dst])
    return edge_index, edge_valid
