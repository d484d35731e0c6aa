"""Parallelism: device mesh construction and sharding rules."""

from .mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    tp_param_sharding,
    initialize_distributed,
    shard_items,
    put_global,
    fetch_global,
)

__all__ = [
    "put_global",
    "fetch_global",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "tp_param_sharding",
    "initialize_distributed",
    "shard_items",
]
