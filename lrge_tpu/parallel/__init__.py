from .sharded import ShardedGroupedIndex, make_mesh, sharded_count_fn

__all__ = ["ShardedGroupedIndex", "make_mesh", "sharded_count_fn"]
