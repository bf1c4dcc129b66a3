from .mesh import make_mesh, shard_data, shard_state, replicate_params

__all__ = ["make_mesh", "shard_data", "shard_state", "replicate_params"]
