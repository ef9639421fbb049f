"""Parallelism layer: device meshes, sharding layouts, the distributed
spectral transform, and multi-host initialization (SURVEY.md §2.5/§5)."""

from .dist_sht import DistributedSHT
from .distributed import initialize_distributed, process_info
from .mesh import (
    grid_sharding, make_mesh, replicated, shard_model_state)

__all__ = [
    'DistributedSHT', 'initialize_distributed', 'process_info',
    'grid_sharding', 'make_mesh', 'replicated', 'shard_model_state']
