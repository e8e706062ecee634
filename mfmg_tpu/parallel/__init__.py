from mfmg_tpu.parallel.sharding import make_mesh, shard_hierarchy, shard_vector

__all__ = ["make_mesh", "shard_hierarchy", "shard_vector"]
