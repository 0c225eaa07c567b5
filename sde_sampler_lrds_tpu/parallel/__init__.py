from .mesh import (get_mesh, shard_batch, replicate, data_axis,
                   batch_sharding, constrain_batch)
