"""Recall measurement and brute-force ground truth."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from parallel_hnsw_tpu.constants import EMPTY_DIST
from parallel_hnsw_tpu.graph import Layer, Source, source_get
from parallel_hnsw_tpu.ops.distance import Metric, pairwise_distance
from parallel_hnsw_tpu.params import SearchParams
from parallel_hnsw_tpu.search import search


def brute_force_knn(
    source: Source, queries: jax.Array, metric: Metric, k: int, query_block: int = 4096
):
    """Exact top-k by full pairwise distance on the MXU. Returns (ids, dists)."""
    outs_i, outs_d = [], []
    vecs = source_get(source, jnp.arange(source.count))
    for start in range(0, queries.shape[0], query_block):
        q = queries[start : start + query_block]
        d = pairwise_distance(q, vecs, metric)
        neg_d, idx = jax.lax.top_k(-d, k)
        outs_i.append(idx)
        outs_d.append(-neg_d)
    return jnp.concatenate(outs_i), jnp.concatenate(outs_d)


def first_hit_recall(
    layers: Sequence[Layer],
    source: Source,
    metric: Metric,
    sp: SearchParams,
    query_block: int = 0,
) -> float:
    """Fraction of corpus vectors that retrieve themselves as the top result
    (reference: do_test_recall, src/lib.rs:2166-2192)."""
    queries = source_get(source, jnp.arange(source.count))
    ids, _ = search(layers, source, metric, queries, sp, query_block=query_block)
    hits = np.asarray(ids[:, 0]) == np.arange(source.count)
    return float(hits.mean())
