from pemp_tpu.ops.components import connected_components, relabel_compact
from pemp_tpu.ops.detection import joint_det_from_scoremaps, nms_mask
from pemp_tpu.ops.knn import (
    feature_knn_edges,
    fully_connected_edges,
    knn_edges,
    pairwise_dist2,
    score_based_edges,
    top_k_per_type_edges,
)
from pemp_tpu.ops.matching import (
    auction_assignment,
    greedy_assignment,
    hungarian_numpy,
)
from pemp_tpu.ops.segment import (
    per_type_aggregate,
    per_type_attention_aggregate,
    segment_aggregate,
    segment_max,
    segment_mean,
    segment_softmax,
    segment_sum,
)

__all__ = [
    "connected_components",
    "relabel_compact",
    "joint_det_from_scoremaps",
    "nms_mask",
    "feature_knn_edges",
    "fully_connected_edges",
    "knn_edges",
    "pairwise_dist2",
    "score_based_edges",
    "top_k_per_type_edges",
    "auction_assignment",
    "greedy_assignment",
    "hungarian_numpy",
    "per_type_aggregate",
    "per_type_attention_aggregate",
    "segment_aggregate",
    "segment_max",
    "segment_mean",
    "segment_softmax",
    "segment_sum",
]
