from pemp_tpu.decode.assembly import (
    adjust_quarter,
    cluster_threshold,
    decode_poses,
    fill_mean,
    persons_from_clusters,
    refine_ae,
)
from pemp_tpu.decode.greedy import greedy_person_construction
from pemp_tpu.decode.format import (
    gen_ann_format,
    gen_ann_format_correct,
    gen_ann_format_mean,
    persons_to_ann,
)

__all__ = [
    "adjust_quarter",
    "cluster_threshold",
    "decode_poses",
    "fill_mean",
    "persons_from_clusters",
    "refine_ae",
    "greedy_person_construction",
    "gen_ann_format",
    "gen_ann_format_correct",
    "gen_ann_format_mean",
    "persons_to_ann",
]
