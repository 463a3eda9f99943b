from .mesh import make_mesh, replicate, shard_batch_dim, shard_rays
