"""Parallelism: device mesh construction and sharding rules."""

from .mesh import make_mesh, batch_sharding, replicated_sharding, tp_param_sharding

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "tp_param_sharding"]
