"""ctypes bindings + reference-compatible clustering surface.

Mirrors the andres_graph_wrapper API the reference imports
(reference: correlation_clustering_utils.py:15, 217-230): ``Graph``,
``CompleteGraph``, ``cluster_KL``/``cluster_GAEC``/``cluster_MUT`` returning
per-edge cut flags, plus the high-level ``cluster_graph`` (reference:
correlation_clustering_utils.py:21-64) returning the dense 0/1 adjacency
matrix the decode path consumes. Falls back to threshold rounding when the
native library cannot be built.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_LIB_FAILED = False


def _load_lib():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    try:
        from pemp_tpu.cluster.build import build

        path = build()
        lib = ctypes.CDLL(path)
        lib.multicut_solve.restype = ctypes.c_int
        lib.multicut_solve.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.multicut_labels.restype = ctypes.c_int
        lib.multicut_labels.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _LIB = lib
    except Exception as e:  # noqa: BLE001 — degrade to python fallback
        import warnings

        warnings.warn(f"native multicut unavailable ({e}); using threshold fallback")
        _LIB_FAILED = True
    return _LIB


_METHODS = {"GAEC": 0, "KL": 1, "MUT": 2}


class Graph:
    """Sparse multicut instance. reference API: andres_graph_wrapper.Graph."""

    def __init__(self, edges, weights, num_nodes):
        edges = np.ascontiguousarray(edges, dtype=np.int64)
        assert edges.shape[0] == 2
        self.src = np.ascontiguousarray(edges[0])
        self.dst = np.ascontiguousarray(edges[1])
        self.weights = np.ascontiguousarray(np.asarray(weights).reshape(-1), dtype=np.float64)
        self.num_nodes = int(num_nodes)


class CompleteGraph(Graph):
    """Dense instance from upper-triangle weights. reference API:
    andres_graph_wrapper.CompleteGraph."""

    def __init__(self, weights):
        w = np.asarray(weights, dtype=np.float64).reshape(-1)
        # invert n*(n-1)/2 = len(w)
        n = int(round((1 + np.sqrt(1 + 8 * len(w))) / 2))
        assert n * (n - 1) // 2 == len(w), len(w)
        iu = np.triu_indices(n, 1)
        super().__init__(np.stack([iu[0], iu[1]]), w, n)


def _solve(graph: Graph, method: str):
    lib = _load_lib()
    n_edges = len(graph.weights)
    if lib is None:
        # fallback: cut where shifted weight <= 0 (threshold at 0.5 prob)
        return (graph.weights <= 0).astype(np.uint8)
    out = np.zeros(n_edges, dtype=np.uint8)
    rc = lib.multicut_solve(
        graph.src.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        graph.dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        graph.weights.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n_edges,
        graph.num_nodes,
        _METHODS[method],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        return None
    return out


def cluster_GAEC(graph):
    return _solve(graph, "GAEC")


def cluster_KL(graph):
    return _solve(graph, "KL")


def cluster_MUT(graph):
    return _solve(graph, "MUT")


def cluster_labels(edges, weights, num_nodes, method="GAEC"):
    """Node -> cluster label convenience (used by the decode path)."""
    g = Graph(edges, weights, num_nodes)
    lib = _load_lib()
    if lib is None:
        # fallback: connected components over positive-weight edges
        from scipy.sparse import csr_matrix
        from scipy.sparse.csgraph import connected_components

        keep = g.weights > 0
        m = csr_matrix(
            (np.ones(keep.sum()), (g.src[keep], g.dst[keep])),
            shape=(num_nodes, num_nodes),
        )
        _, labels = connected_components(m, directed=False)
        return labels.astype(np.int64)
    out = np.zeros(num_nodes, dtype=np.int64)
    rc = lib.multicut_labels(
        g.src.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        g.dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        g.weights.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(g.weights),
        num_nodes,
        _METHODS[method],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        raise RuntimeError("multicut_labels failed")
    return out


def cluster_graph(edge_index, edge_attr, num_nodes, method, complete=False):
    """High-level entry mirroring the reference's cluster_graph
    (correlation_clustering_utils.py:21-64): edge probabilities in [0, 1],
    returns the dense 0/1 connectivity matrix (1 = same cluster).
    """
    edge_index = np.asarray(edge_index)
    edge_attr = np.asarray(edge_attr, dtype=np.float64).reshape(-1)

    if method == "RD":
        mat = np.zeros((num_nodes, num_nodes))
        mat[edge_index[0], edge_index[1]] = edge_attr
        mat = (mat + mat.T) / np.maximum(
            (mat != 0).astype(np.float64) + (mat.T != 0).astype(np.float64), 1
        )
        np.fill_diagonal(mat, 1)
        return np.round(mat)

    if complete:
        dense = np.zeros((num_nodes, num_nodes))
        dense[edge_index[0], edge_index[1]] = edge_attr
        if np.tril(dense).sum() == 0:
            dense = dense + dense.T
        else:
            dense = (dense + dense.T) / 2
        iu = np.triu_indices(num_nodes, 1)
        weights = dense[iu] - 0.5
        g = CompleteGraph(weights)
        edges = np.stack([iu[0], iu[1]])
    else:
        keep = edge_index[0] < edge_index[1]
        edges = np.ascontiguousarray(edge_index[:, keep])
        weights = np.ascontiguousarray(edge_attr[keep] - 0.5)
        g = Graph(edges, weights, num_nodes)

    solver = {"GAEC": cluster_GAEC, "KL": cluster_KL, "MUT": cluster_MUT}[method]
    cut = solver(g)
    out = np.zeros((num_nodes, num_nodes), dtype=np.int64)
    if cut is None:
        return None
    out[edges[0], edges[1]] = 1 - cut
    out = out + out.T
    np.fill_diagonal(out, 1)
    return out
