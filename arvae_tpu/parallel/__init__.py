from arvae_tpu.parallel.mesh import (
    MeshContext,
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    shard_pytree_replicated,
)

__all__ = [
    "MeshContext",
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_pytree_replicated",
]
