from pemp_tpu.models.mpn.layers import (
    MLP,
    MaskedBatchNorm,
    MPLayer,
    TypeAwareLinear,
    TypeAwareMPNLayer,
    num_summary_types,
    sum_node_types,
)
from pemp_tpu.models.mpn.models import (
    JointTypeClassification,
    LogisticEdgeClassifier,
    NodeClassificationMPN,
    NodeClassificationMPNTag,
    PlainTag,
    TagThreshold,
    VanillaMPN,
    get_mpn_model,
    mpn_cfg_from_config,
)

__all__ = [
    "MLP",
    "MaskedBatchNorm",
    "MPLayer",
    "TypeAwareLinear",
    "TypeAwareMPNLayer",
    "num_summary_types",
    "sum_node_types",
    "JointTypeClassification",
    "LogisticEdgeClassifier",
    "NodeClassificationMPN",
    "NodeClassificationMPNTag",
    "PlainTag",
    "TagThreshold",
    "VanillaMPN",
    "get_mpn_model",
    "mpn_cfg_from_config",
]
