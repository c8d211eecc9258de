"""Device mesh & sharding helpers (DP over ICI; spatial sharding optional;
multi-host DCN init)."""

from .mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
)
from .distributed import (
    initialize_multihost,
    host_local_batch_size,
    make_global_batch,
)

__all__ = [
    "make_mesh", "batch_sharding", "replicated_sharding",
    "shard_batch", "replicate",
    "initialize_multihost", "host_local_batch_size", "make_global_batch",
]
