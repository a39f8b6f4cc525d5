from .mesh import make_mesh, shard_target_state, make_sharded_tracker

__all__ = ["make_mesh", "shard_target_state", "make_sharded_tracker"]
