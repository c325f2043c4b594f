from . import mesh
from .mesh import make_mesh, shard_batch, shard_params, batch_sharding, replicated
