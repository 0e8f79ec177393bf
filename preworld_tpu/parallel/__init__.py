from .mesh import make_mesh, batch_shardings, replicate_sharding, shard_batch

__all__ = ["make_mesh", "batch_shardings", "replicate_sharding", "shard_batch"]
