"""Measure the fused binned-scan kernel vs the library flat scans at 1M.

Usage: PYTHONPATH=.:/root/.axon_site python -u scripts/binned_study.py [count]
"""

import sys
import time

sys.path.insert(0, ".")

from parallel_hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from parallel_hnsw_tpu.ops.distance import Metric, batched_distance
from parallel_hnsw_tpu.ops.pallas_scan import pallas_binned_scan
from parallel_hnsw_tpu.utils.data import random_unit_corpus


def main(count=1_000_000, dim=128, qn=2048, k=10):
    metric = Metric.EUCLIDEAN
    src = random_unit_corpus(count, dim, seed=11)
    vecs = src.vectors
    q = vecs[:qn]

    from parallel_hnsw_tpu.analysis import brute_force_knn

    gt = np.asarray(brute_force_knn(src, q, metric, k, qn)[0])

    def binned(qq, tile_c, exact, oversample):
        bin_d, bin_c = pallas_binned_scan(qq, vecs, metric, tile_c=tile_c, exact=exact)
        _, pos = jax.lax.approx_min_k(bin_d, k * oversample)
        cand = jnp.take_along_axis(bin_c, pos, axis=-1)
        d = batched_distance(qq, jnp.take(vecs, cand, axis=0), metric)
        d, cand = jax.lax.sort((d, cand), num_keys=2)
        return cand[:, :k]

    for tile_c in (1024, 2048, 4096):
        for exact in (False, True):
            tag = f"binned tc={tile_c} exact={exact}"
            try:
                ids = binned(q, tile_c, exact, 4)
                _ = int(np.asarray(ids[-1, 0]))
                best = float("inf")
                for _i in range(3):
                    t0 = time.time()
                    ids = binned(q, tile_c, exact, 4)
                    _ = int(np.asarray(ids[-1, 0]))
                    best = min(best, time.time() - t0)
                got = np.asarray(ids)
                rec = np.mean(
                    [len(np.intersect1d(got[i], gt[i])) for i in range(0, qn, 17)]
                ) / k
                print(f"{tag:<30} {qn/best:>9.0f} QPS recall@10={rec:.4f}", flush=True)
            except Exception as e:
                print(f"{tag:<30} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
