"""Device-mesh / sharding helpers for multi-chip and multi-host training."""

from .mesh import (
    DATA_AXIS,
    batch_sharding,
    constrain_batch,
    make_mesh,
    replicate_pytree,
    replicated_sharding,
    shard_batch_pytree,
)

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "constrain_batch",
    "make_mesh",
    "replicate_pytree",
    "replicated_sharding",
    "shard_batch_pytree",
]
