"""Mesh sharding and collectives for scale-out gate evaluation."""

from .mesh import make_mesh, batch_sharding, replicated
from .sharded import sharded_gate_fn, shard_cloud_key
from . import multihost

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "sharded_gate_fn",
    "shard_cloud_key",
]
