from pemp_tpu.graph.constructor import (
    GCConfig,
    GraphBatch,
    construct_graph_batch,
)

__all__ = ["GCConfig", "GraphBatch", "construct_graph_batch"]
