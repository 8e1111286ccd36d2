from .mesh import data_sharding, get_mesh, make_mesh, replicate, shard_batch
