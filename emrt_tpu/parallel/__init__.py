from .mesh import (batch_sharding, create_mesh, replicated, shard_batch,
                   spatial_batch_sharding, tp_rule, tp_shard_params)
