"""Flat-scan engine shootout at 1M x 128: exact top_k vs approx_min_k
vs bf16+approx+rerank.  Feeds the scan-engine defaults.

Usage: PYTHONPATH=.:/root/.axon_site python -u scripts/scan_study.py [count]
"""

import sys
import time

sys.path.insert(0, ".")

from parallel_hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import functools

import jax
import jax.numpy as jnp
import numpy as np

from parallel_hnsw_tpu.graph import DenseSource
from parallel_hnsw_tpu.ops.pallas_distance import best_pairwise_distance
from parallel_hnsw_tpu.ops.distance import Metric
from parallel_hnsw_tpu.utils.data import random_unit_corpus


def bench(fn, q, tag, gt=None, k=10):
    ids = fn(q)  # compile
    _ = int(np.asarray(ids[-1, 0]))
    best = float("inf")
    for _i in range(3):
        t0 = time.time()
        ids = fn(q)
        _ = int(np.asarray(ids[-1, 0]))
        best = min(best, time.time() - t0)
    rec = ""
    if gt is not None:
        got = np.asarray(ids[:, :k])
        inter = [len(np.intersect1d(got[i], gt[i])) for i in range(0, len(gt), 17)]
        rec = f" recall@10={np.mean(inter)/k:.4f}"
    print(f"{tag:<34} {len(np.asarray(ids))/best:>9.0f} QPS{rec}", flush=True)
    return ids


def main(count=1_000_000, dim=128, qn=2048, k=10):
    metric = Metric.EUCLIDEAN
    src = random_unit_corpus(count, dim, seed=11)
    vecs = src.vectors
    q = vecs[:qn]

    cb = 1 << 16

    def blocked(q, reduce, exact):
        best_i = best_d = None
        for cs in range(0, count, cb):
            c = vecs[cs : cs + cb]
            idx, dd = reduce(q, c, cs)
            if best_i is None:
                best_i, best_d = idx, dd
            else:
                di = jnp.concatenate([best_d, dd], -1)
                ii = jnp.concatenate([best_i, idx], -1)
                di, ii = jax.lax.sort((di, ii), num_keys=1)
                best_i, best_d = ii[:, : idx.shape[1]], di[:, : idx.shape[1]]
        return best_i

    @functools.partial(jax.jit, static_argnames=())
    def red_exact(q, c, off):
        d = best_pairwise_distance(q, c, metric)
        nd, i = jax.lax.top_k(-d, k)
        return (i + off).astype(jnp.int32), -nd

    @jax.jit
    def red_approx(q, c, off):
        d = best_pairwise_distance(q, c, metric)
        dd, i = jax.lax.approx_min_k(d, k)
        return (i + off).astype(jnp.int32), dd

    @jax.jit
    def red_fast(q, c, off):
        d = best_pairwise_distance(q, c, metric, exact=False)
        dd, i = jax.lax.approx_min_k(d, 4 * k)
        return (i + off).astype(jnp.int32), dd

    gt_ids = blocked(q, red_exact, True)
    gt = np.asarray(gt_ids[:, :k])
    print(f"# corpus {count}x{dim}, q={qn}", flush=True)
    bench(lambda qq: blocked(qq, red_exact, True), q, "exact fp32 + top_k", gt)
    bench(lambda qq: blocked(qq, red_approx, True), q, "fp32 + approx_min_k", gt)

    def fast_rerank(qq):
        ids = blocked(qq, red_fast, False)
        cand = jnp.take(vecs, ids, axis=0)
        from parallel_hnsw_tpu.ops.distance import batched_distance

        d = batched_distance(qq, cand, metric)
        d, ids = jax.lax.sort((d, ids), num_keys=2)
        return ids[:, :k]

    bench(fast_rerank, q, "bf16 + approx_min_k(4k) + rerank", gt)

    from parallel_hnsw_tpu.analysis import brute_force_knn, fast_flat_knn

    bench(lambda qq: brute_force_knn(src, qq, metric, k, 2048)[0], q,
          "brute_force_knn (library)", gt)
    bench(lambda qq: fast_flat_knn(src, qq, metric, k, 4, 2048)[0], q,
          "fast_flat_knn (library)", gt)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
