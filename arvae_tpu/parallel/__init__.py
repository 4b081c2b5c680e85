from arvae_tpu.parallel.mesh import (
    MeshContext,
    create_mesh,
    batch_sharding,
    masked_mean,
    replicated_sharding,
    shard_batch,
    shard_batch_padded,
    shard_batch_truncated,
    shard_pytree_replicated,
)

__all__ = [
    "MeshContext",
    "create_mesh",
    "batch_sharding",
    "masked_mean",
    "replicated_sharding",
    "shard_batch",
    "shard_batch_padded",
    "shard_batch_truncated",
    "shard_pytree_replicated",
]
