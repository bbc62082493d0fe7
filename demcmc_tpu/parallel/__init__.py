from . import distributed
from .mesh import chain_mesh, data_mesh, shard_data

__all__ = ["chain_mesh", "data_mesh", "shard_data", "distributed"]
