from .mesh import (create_mesh, shard_batch, shard_stacked_batch,
                   replicate, unreplicate,
                   batch_sharding, replicated_sharding)

__all__ = ['create_mesh', 'shard_batch', 'shard_stacked_batch',
           'replicate', 'unreplicate',
           'batch_sharding', 'replicated_sharding']
