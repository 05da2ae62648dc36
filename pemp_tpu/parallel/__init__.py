from pemp_tpu.parallel.eval_shard import (
    cleanup_parts,
    merge_parts,
    shard_indices,
    write_part,
)
from pemp_tpu.parallel.mesh import (
    batch_sharding,
    maybe_init_distributed,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
    shard_train_step,
)

__all__ = [
    "batch_sharding",
    "cleanup_parts",
    "make_mesh",
    "merge_parts",
    "replicate",
    "replicated",
    "shard_batch",
    "shard_indices",
    "maybe_init_distributed",
    "shard_train_step",
    "write_part",
]
