from pemp_tpu.cluster.api import (
    CompleteGraph,
    Graph,
    cluster_GAEC,
    cluster_KL,
    cluster_MUT,
    cluster_graph,
    cluster_labels,
)

__all__ = [
    "CompleteGraph",
    "Graph",
    "cluster_GAEC",
    "cluster_KL",
    "cluster_MUT",
    "cluster_graph",
    "cluster_labels",
]
