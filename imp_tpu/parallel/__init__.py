from .mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    replicate_tree,
    maybe_initialize_distributed,
    fetch_global,
    host_local_slice,
    pad_to_multiple,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate_tree",
    "maybe_initialize_distributed",
    "fetch_global",
    "host_local_slice",
    "pad_to_multiple",
]
