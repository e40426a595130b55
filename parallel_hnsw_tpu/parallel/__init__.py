from parallel_hnsw_tpu.parallel.sharded import (
    ShardedHnsw,
    ShardedQuantizedHnsw,
    default_mesh,
)

__all__ = ["ShardedHnsw", "ShardedQuantizedHnsw", "default_mesh"]
