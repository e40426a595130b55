"""DEEP-10M-class demo: flat scan over 10M PQ-compressed vectors on one chip.

Codes are synthetic (the corpus IS the compressed representation); measures
the blocked reconstruct-then-matmul scan throughput at 10M x (96x16) codes =
1.9GB at rest, the per-shard workload of the BASELINE 100M config.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from parallel_hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from parallel_hnsw_tpu.graph import PqSource, reconstruct
from parallel_hnsw_tpu.index import Hnsw
from parallel_hnsw_tpu.ops.distance import Metric
from parallel_hnsw_tpu.params import PqBuildParams
from parallel_hnsw_tpu.pq import HnswQuantizer, QuantizedHnsw


def main(n=10_000_000, nsub=96, dsub=16, k_codes=65_535, n_queries=8192):
    rng = np.random.default_rng(0)
    print(f"building synthetic codes [{n}, {nsub}] uint16 + codebook [{k_codes}, {dsub}]", flush=True)
    codebook = jnp.asarray(rng.normal(size=(k_codes, dsub)).astype(np.float32) / np.sqrt(dsub * nsub))
    codes = jnp.asarray(rng.integers(0, k_codes, (n, nsub)).astype(np.uint16))
    pq = PqSource(codes=codes, codebook=codebook)
    print(f"codes at rest: {n * nsub * 2 / 1e9:.2f} GB", flush=True)

    # queries = reconstructions of random codes (known true matches exist)
    q_codes = codes[:n_queries]
    queries = reconstruct(codebook, q_codes.astype(jnp.int32))

    # a QuantizedHnsw shell around the compressed corpus for the scan API
    shell = QuantizedHnsw.__new__(QuantizedHnsw)
    shell.hnsw = Hnsw([], pq, Metric.EUCLIDEAN)
    shell.quantizer = None
    shell.full_source = None

    t0 = time.time()
    ids, dists = shell.search_exact(queries, k=10, rerank=False)
    warm = time.time() - t0
    hits = (np.asarray(ids[:, 0]) == np.arange(n_queries)).mean()
    print(f"scan self-recall@1 = {hits:.4f} (warm {warm:.0f}s)", flush=True)
    t0 = time.time()
    out = shell.search_exact(queries, k=10, rerank=False)
    _ = int(np.asarray(out[0][-1, 0]))
    dt = time.time() - t0
    print(
        f"10M-compressed flat scan: {n_queries / dt:.0f} QPS "
        f"({dt / n_queries * 1e3:.2f} ms/query over {n} codes)",
        flush=True,
    )


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
