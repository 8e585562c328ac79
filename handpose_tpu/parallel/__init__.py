"""Device mesh and sharding utilities."""

from .mesh import make_mesh, data_sharding, shard_batch, replicate

__all__ = ["make_mesh", "data_sharding", "shard_batch", "replicate"]
