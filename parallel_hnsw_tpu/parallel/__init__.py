from parallel_hnsw_tpu.parallel.sharded import ShardedHnsw, default_mesh

__all__ = ["ShardedHnsw", "default_mesh"]
