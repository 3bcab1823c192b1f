"""Mesh-parallel execution: sharded frontend fan-out + distributed Schur BA.

New capability vs the single-process reference (SURVEY.md §2 'Distributed
communication backend': none there).  Tested on a virtual 8-device CPU mesh;
designed for TPU ICI."""

from .ba_sharded import ShardedBA, ShardedBAResult
from .frontend_sharded import ShardedFrontend
from .mesh import batch_sharding, initialize_distributed, make_mesh, replicated

__all__ = [
    "ShardedBA",
    "ShardedBAResult",
    "ShardedFrontend",
    "batch_sharding",
    "initialize_distributed",
    "make_mesh",
    "replicated",
]
