"""config4 codebook-capacity study (round 5, VERDICT r4 #2).

DEEP-10M-equivalent (10M x 96-d normalized clustered corpus, identical to
scripts/big_bench.py config4): attack the 0.95 recall@10 floor with trained
codebook CAPACITY rather than candidate count.  Measured cells so far
(BENCH_NOTES "config4"): shared kmeans-4096 24x4 -> 0.8541; shared
random-65535 -> 0.7519 (regression — density-blind sampling).  The two
untried levers:

* ``shared65535``  — MXU k-means at K=65,535 (``_kmeans_big``: blocked
  binned-argmin assignment + segment-sum update; the plain path's [N, K]
  matrix would be 100s of GB).
* ``sub4096`` / ``sub65535`` — per-subspace codebooks (classic PQ): one
  trained [K, 4] codebook per subspace, nsub-fold more effective capacity at
  identical code bytes.  The reference only ships the shared codebook
  (src/pq.rs:261-285); PqSource/reconstruct/adc_lut already accept
  [nsub, K, dsub].

Usage: python scripts/c4_capacity.py sub4096 [count]
"""

import json
import sys
import time

sys.path.insert(0, ".")

from parallel_hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from parallel_hnsw_tpu.analysis import brute_force_knn
from parallel_hnsw_tpu.graph import DenseSource, PqSource
from parallel_hnsw_tpu.index import Hnsw
from parallel_hnsw_tpu.ops.distance import Metric
from parallel_hnsw_tpu.params import BuildParams, OptimizationParams, PqBuildParams
from parallel_hnsw_tpu.pq import (
    QuantizedHnsw,
    SubspaceQuantizer,
    kmeans_centroids,
    per_subspace_centroids,
)

METRIC = Metric.NORMALIZED_COSINE
DIM, DSUB = 96, 4
NQ = 2048


def clustered_corpus(count):
    """Byte-identical to scripts/big_bench.py config4's corpus."""
    rng_key = jax.random.PRNGKey(7)
    k_centers, k_noise = jax.random.split(rng_key)
    centers = jax.random.normal(k_centers, (1024, DIM), jnp.float32)
    centers = centers / jnp.linalg.norm(centers, axis=-1, keepdims=True)
    chunks = []
    per = 500_000
    for i in range(0, count, per):
        kk1, kk2, k_noise = jax.random.split(jax.random.fold_in(k_noise, i), 3)
        m = min(per, count - i)
        which = jax.random.randint(kk1, (m,), 0, 1024)
        pts = centers[which] + 0.35 * jax.random.normal(kk2, (m, DIM), jnp.float32)
        chunks.append(pts / jnp.linalg.norm(pts, axis=-1, keepdims=True))
    return DenseSource(vectors=jnp.concatenate(chunks))


def eval_index(q, source, gt, tag, oversamples=(32, 64)):
    q_eval = source.vectors[:NQ]
    for osp in oversamples:
        ids, _ = q.search_exact(q_eval, k=10, rerank=True, oversample=osp)
        got = np.asarray(ids[:, :10])
        inter = np.asarray(
            [len(np.intersect1d(got[i], gt[i])) for i in range(len(gt))]
        )
        recall = float(inter.mean() / 10.0)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = q.search_exact(q_eval, k=10, rerank=True, oversample=osp)
            _ = int(np.asarray(out[0][-1, 0]))
            best = min(best, time.time() - t0)
        print(json.dumps({
            "config": tag, "engine": "pq_flat_scan+rerank", "oversample": osp,
            "recall_at_10": round(recall, 4), "qps": round(len(gt) / best, 1),
        }), flush=True)


def main(variant, count=10_000_000, oversamples=(32, 64)):
    t0 = time.time()
    source = clustered_corpus(count)
    print(f"# corpus {count}x{DIM}: {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    q_eval = source.vectors[:NQ]
    gt_ids, _ = brute_force_knn(source, q_eval, METRIC, 10, query_block=1024)
    gt = np.asarray(gt_ids)
    print(f"# ground truth: {time.time()-t0:.0f}s", flush=True)

    nsub = DIM // DSUB
    t0 = time.time()
    if variant == "shared65535":
        k = 65_535
        books = kmeans_centroids(
            source.vectors, k, DSUB, iters=5, seed=0, sample=8_000_000
        )
    elif variant in ("sub4096", "sub65535"):
        k = 4096 if variant == "sub4096" else 65_535
        books = per_subspace_centroids(
            source.vectors, k, DSUB, seed=0, use_kmeans=True, iters=5,
            sample=4_000_000,
        )
    else:
        raise SystemExit(f"unknown variant {variant}")
    print(f"# centroids {variant} (K={k}): {time.time()-t0:.0f}s", flush=True)

    pqp = PqBuildParams()
    if books.ndim == 3:  # per-subspace: no centroid graph needed
        quantizer = SubspaceQuantizer(jnp.asarray(books), METRIC, pqp)
    else:  # shared codebook: the reference's HnswQuantizer design
        from parallel_hnsw_tpu.pq import HnswQuantizer

        small_bp = BuildParams(
            optimization=OptimizationParams(recall_proportion=0.2),
        )
        centroid_hnsw = Hnsw.generate(
            DenseSource(vectors=jnp.asarray(books)), None, small_bp, METRIC, seed=0
        )
        quantizer = HnswQuantizer(centroid_hnsw, nsub, pqp)

    t0 = time.time()
    chunk = 500_000
    codes = []
    for start in range(0, count, chunk):
        codes.append(
            quantizer.quantize(source.vectors[start:start + chunk], fast=True)
        )
    codebook = jnp.asarray(books)
    codes = jnp.concatenate(codes).astype(jnp.uint16 if k <= 65_536 else jnp.int32)
    print(f"# quantize {count}: {time.time()-t0:.0f}s", flush=True)

    small_bp = BuildParams(optimization=OptimizationParams(recall_proportion=0.2))
    pq_source = PqSource(codes=codes, codebook=codebook)
    q = QuantizedHnsw(quantizer, Hnsw([], pq_source, METRIC, small_bp), source)
    eval_index(
        q, source, gt, f"config4_{count}x{DIM}_pq{nsub}x{DSUB}_{variant}",
        oversamples=oversamples,
    )


if __name__ == "__main__":
    ovs = tuple(int(a) for a in sys.argv[3:]) or (32, 64)
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000,
         oversamples=ovs)
