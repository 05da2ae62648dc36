from pemp_tpu.ops.pallas.blocked_attn import (
    blocked_per_type_attention_aggregate_pallas,
)

__all__ = ["blocked_per_type_attention_aggregate_pallas"]
