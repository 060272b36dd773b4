from .mesh import (batch_sharding, create_mesh, replicated, shard_batch,
                   tp_rule, tp_shard_params)
