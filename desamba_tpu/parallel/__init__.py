from .mesh import make_mesh, shard_index, sharded_seed_step  # noqa: F401
