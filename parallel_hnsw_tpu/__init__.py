"""parallel_hnsw_tpu — a TPU-native batch-parallel HNSW framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
terminusdb-labs/parallel-hnsw: bulk batched graph construction over a geometric
layer ladder, batched beam-search queries, a recall-driven improve/promote
self-repair loop, product quantization with exact rerank, all-pairs kNN /
threshold similarity, directory persistence, and multi-chip sharded search.
"""

from parallel_hnsw_tpu.constants import EMPTY_DIST, EMPTY_ID, MATCH_EPSILON
from parallel_hnsw_tpu.params import (
    BuildParams,
    OptimizationParams,
    PqBuildParams,
    SearchParams,
)
from parallel_hnsw_tpu.ops.distance import Metric

__version__ = "0.1.0"

__all__ = [
    "EMPTY_DIST",
    "EMPTY_ID",
    "MATCH_EPSILON",
    "BuildParams",
    "OptimizationParams",
    "PqBuildParams",
    "SearchParams",
    "Metric",
]
