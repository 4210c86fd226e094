from .sharded import ShardedDeviceIndex, make_mesh, sharded_count_fn

__all__ = ["ShardedDeviceIndex", "make_mesh", "sharded_count_fn"]
