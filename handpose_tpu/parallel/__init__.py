"""Device mesh and sharding utilities."""

from .mesh import make_mesh, data_sharding, shard_batch, replicate
from .distributed import initialize_distributed, HostShardSampler

__all__ = ["make_mesh", "data_sharding", "shard_batch", "replicate",
           "initialize_distributed", "HostShardSampler"]
