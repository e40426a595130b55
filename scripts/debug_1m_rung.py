"""Bisect the TPU worker crash in the 1M-rung generate_layer.

Loads the partial c2 checkpoint (5 upper rungs) and runs the bottom-rung
substeps one at a time with host readbacks between, printing each step, so
the crashing substep is identified by the last printed line.

Usage: PYTHONPATH=.:/root/.axon_site python -u scripts/debug_1m_rung.py [count]
"""

import sys
import time

sys.path.insert(0, ".")

from parallel_hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from parallel_hnsw_tpu.build import _auto_node_block, _build_rows, _candidate_pool
from parallel_hnsw_tpu.ops.segment import symmetrize
from parallel_hnsw_tpu.constants import EMPTY_DIST, EMPTY_ID, ID_DTYPE
from parallel_hnsw_tpu.graph import gather_features, node_to_vec, vec_to_node
from parallel_hnsw_tpu.io import deserialize_hnsw
from parallel_hnsw_tpu.ops.distance import Metric
from parallel_hnsw_tpu.ops.queues import sort_queue
from parallel_hnsw_tpu.params import BuildParams, OptimizationParams, SearchParams


def sync(x, tag):
    v = np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]
    print(f"[{time.strftime('%H:%M:%S')}] step ok: {tag} (probe {v})", flush=True)


def main(count=1_000_000):
    # same corpus as big_bench config2
    chunks = []
    per = 250_000
    for i in range(0, count, per):
        key = jax.random.PRNGKey(42 + i)
        chunks.append(jax.random.uniform(key, (min(per, count - i), 128), jnp.float32))
    from parallel_hnsw_tpu.graph import DenseSource

    source = DenseSource(vectors=jnp.concatenate(chunks))
    sync(source.vectors, "corpus")

    index = deserialize_hnsw("/tmp/idx_c2_1000000", source=source)
    stack = index.layers
    print("stack:", [l.node_count for l in stack], flush=True)
    metric = Metric.EUCLIDEAN

    # same vs as build.generate(seed=0): shuffled arange
    rng = np.random.default_rng(0)
    vs_np = np.arange(count, dtype=np.int64)
    rng.shuffle(vs_np)
    vs = jnp.sort(jnp.asarray(vs_np, ID_DTYPE))
    m = 48
    sp = BuildParams().initial_partition_search
    noc = sp.number_of_candidates
    node_block = _auto_node_block(m * 5, 128)
    print("node_block:", node_block, "noc:", noc, flush=True)

    t0 = time.time()
    queries = gather_features(source, vs)
    sync(queries, f"gather_features {time.time()-t0:.1f}s")

    from parallel_hnsw_tpu.analysis import blocked_topk_pairwise

    bottom = stack[-1]
    corpus_feats = gather_features(source, bottom.nodes)
    sync(corpus_feats, "gather corpus_feats")

    t0 = time.time()
    top_i, top_d = blocked_topk_pairwise(
        queries, corpus_feats, metric, noc + 1, row_block=node_block
    )
    sync(top_i, f"blocked_topk_pairwise {time.time()-t0:.1f}s")

    res_ids = node_to_vec(bottom.nodes, top_i)
    drop = res_ids == vs[:, None]
    res_ids = jnp.where(drop, EMPTY_ID, res_ids)
    top_d = jnp.where(drop, EMPTY_DIST, top_d)
    res_ids, res_dists = sort_queue(res_ids, top_d)
    sync(res_ids, "seed sort")

    seed_nodes = vec_to_node(vs, res_ids[:, :noc])
    seed_dists = jnp.where(seed_nodes == EMPTY_ID, EMPTY_DIST, res_dists[:, :noc])
    sync(seed_nodes, "seed map")

    key = jax.random.PRNGKey(123)
    c = m * 5
    t0 = time.time()
    cand = _candidate_pool(key, seed_nodes, count, c)
    sync(cand, f"candidate_pool {time.time()-t0:.1f}s")

    t0 = time.time()
    fwd_ids, fwd_d = _build_rows(
        vs, seed_nodes, seed_dists, cand, source, metric, m, node_block
    )
    sync(fwd_ids, f"build_rows {time.time()-t0:.1f}s")

    t0 = time.time()
    neighbors, _ = symmetrize(fwd_ids, fwd_d)
    sync(neighbors, f"symmetrize {time.time()-t0:.1f}s")
    print("ALL STEPS OK", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
