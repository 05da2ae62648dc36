import jax.numpy as jnp
import numpy as np

from pemp_tpu.ops import (
    connected_components,
    fully_connected_edges,
    knn_edges,
    relabel_compact,
)


def edge_set(edge_index, edge_valid):
    ei = np.asarray(edge_index)
    ev = np.asarray(edge_valid)
    return {(int(ei[0, e]), int(ei[1, e])) for e in range(ei.shape[1]) if ev[e]}


def oracle_undirected_knn(pos, valid, k):
    """reference semantics: knn -> to_undirected -> remove self loops."""
    n = len(pos)
    edges = set()
    vidx = [i for i in range(n) if valid[i]]
    for i in vidx:
        d = [(np.sum((pos[i] - pos[j]) ** 2), j) for j in vidx if j != i]
        d.sort()
        for _, j in d[:k]:
            edges.add((j, i))
            edges.add((i, j))
    return edges


def test_knn_matches_oracle_no_duplicates():
    rng = np.random.RandomState(0)
    n, k = 24, 5
    pos = rng.rand(n, 2).astype(np.float32) * 100
    valid = np.ones(n, bool)
    valid[20:] = False

    ei, ev = knn_edges(jnp.asarray(pos), jnp.asarray(valid), k)
    got = edge_set(ei, ev)
    want = oracle_undirected_knn(pos, valid, k)
    assert got == want

    # no duplicate (src, dst) pairs among valid edges
    ei_np, ev_np = np.asarray(ei), np.asarray(ev)
    pairs = [
        (int(ei_np[0, e]), int(ei_np[1, e])) for e in range(ei_np.shape[1]) if ev_np[e]
    ]
    assert len(pairs) == len(set(pairs))


def test_knn_fewer_valid_than_k():
    pos = np.array([[0.0, 0], [1, 0], [2, 0], [50, 50]], np.float32)
    valid = np.array([True, True, True, False])
    ei, ev = knn_edges(jnp.asarray(pos), jnp.asarray(valid), k=5)
    got = edge_set(ei, ev)
    want = oracle_undirected_knn(pos, valid, 5)
    assert got == want
    # padded node never appears
    assert all(3 not in pair for pair in got)


def test_fully_connected():
    valid = np.array([True, True, False, True])
    ei, ev = fully_connected_edges(jnp.asarray(valid))
    got = edge_set(ei, ev)
    want = {(i, j) for i in [0, 1, 3] for j in [0, 1, 3] if i != j}
    assert got == want


def test_connected_components_chain_and_islands():
    # nodes 0-1-2 chain, 3-4 pair, 5 isolated, 6 invalid
    edges = np.array([[0, 1, 3], [1, 2, 4]])
    ev = np.ones(3, bool)
    labels = np.asarray(
        connected_components(jnp.asarray(edges), jnp.asarray(ev), 7)
    )
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4]
    assert labels[5] == 5
    assert labels[0] != labels[3] != labels[5]

    compact = np.asarray(relabel_compact(jnp.asarray(labels), 7))
    assert compact[0] == 0 and compact[3] == 1 and compact[5] == 2


def test_connected_components_invalid_edges_ignored():
    edges = np.array([[0, 1], [1, 2]])
    ev = np.array([True, False])
    labels = np.asarray(connected_components(jnp.asarray(edges), jnp.asarray(ev), 3))
    assert labels[0] == labels[1]
    assert labels[2] == 2


def test_connected_components_long_chain():
    n = 64
    src = np.arange(n - 1)
    dst = np.arange(1, n)
    labels = np.asarray(
        connected_components(
            jnp.asarray(np.stack([src, dst])), jnp.ones(n - 1, bool), n
        )
    )
    assert (labels == 0).all()


def test_connected_components_blocked_matches_generic():
    """The scatter-free blocked adjacency path must label identically to the
    generic scatter path on a real target-major kNN edge set."""
    from pemp_tpu.ops.components import connected_components
    from pemp_tpu.ops.knn import knn_edges_target_major

    rng = np.random.RandomState(11)
    n, k, cap = 96, 6, 6
    pos = jnp.asarray(rng.rand(n, 2).astype(np.float32) * 50)
    valid = jnp.asarray(rng.rand(n) > 0.2)
    ei, ev = knn_edges_target_major(pos, valid, k, cap)
    c = ei.shape[1] // n
    # random confident-edge subset, some invalid nodes
    ev = ev & jnp.asarray(rng.rand(ei.shape[1]) > 0.4)
    keep = valid & jnp.asarray(rng.rand(n) > 0.25)
    generic = connected_components(ei, ev, n, keep)
    blocked = connected_components(ei, ev, n, keep, blocked_c=c)
    np.testing.assert_array_equal(np.asarray(generic), np.asarray(blocked))
