from .mesh import data_sharding, get_mesh, make_mesh, replicate, shard_batch
from .synthesis_tp import shard_generator_params, synthesize_tp
