from pemp_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
    shard_train_step,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_batch",
    "shard_train_step",
]
