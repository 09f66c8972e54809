from .mesh import make_pixel_mesh, shard_paths_spec, sharded_iteration

__all__ = ["make_pixel_mesh", "shard_paths_spec", "sharded_iteration"]
