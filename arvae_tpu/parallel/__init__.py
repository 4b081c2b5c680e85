from arvae_tpu.parallel.mesh import (
    MeshContext,
    create_mesh,
    masked_mean,
    shard_batch,
    shard_batch_padded,
    shard_batch_truncated,
    shard_pytree_replicated,
)

__all__ = [
    "MeshContext",
    "create_mesh",
    "masked_mean",
    "shard_batch",
    "shard_batch_padded",
    "shard_batch_truncated",
    "shard_pytree_replicated",
]
