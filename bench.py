"""Benchmark harness — run on real TPU hardware.

Default workload: the reference's own bench (benches/bench.rs:54-63): build a
graph over ~10k random 100-d unit vectors with the cosine metric, then measure
batched query throughput at the default operating point (ef=300).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Other BASELINE.md configs: ``--mode pq`` (PQ codebook + code graph + rerank),
``--mode sharded`` (mesh-sharded search), ``--dataset x.fvecs`` (real dataset
via the native loader, e.g. SIFT1M when files are available).

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` is measured
against REF_SINGLE_CORE_QPS — an estimate of the Rust reference's single-core
query throughput on this workload (ef=300, ~3-5k distance evals/query on a
modern core ≈ 1000 QPS).  The driver-set target is 10x that per chip.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

REF_SINGLE_CORE_QPS = 1000.0


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--count", type=int, default=10_000)
    p.add_argument("--dim", type=int, default=100)
    p.add_argument(
        "--mode", choices=["dense", "pq", "sharded", "exact"], default="dense"
    )
    p.add_argument("--dataset", type=str, default=None, help="fvecs corpus path")
    p.add_argument(
        "--no-improve",
        dest="improve",
        action="store_false",
        help="skip improve_index / relink during build",
    )
    p.add_argument("--probe-depth", type=int, default=8)
    p.add_argument("--query-block", type=int, default=2048)
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()

    from parallel_hnsw_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from parallel_hnsw_tpu.analysis import brute_force_knn
    from parallel_hnsw_tpu.index import Hnsw
    from parallel_hnsw_tpu.ops.distance import Metric
    from parallel_hnsw_tpu.params import BuildParams
    from parallel_hnsw_tpu.utils.data import random_unit_corpus

    metric = Metric.NORMALIZED_COSINE
    if args.dataset:
        import jax.numpy as jnp

        from parallel_hnsw_tpu.graph import DenseSource
        from parallel_hnsw_tpu.utils.datasets import read_vecs

        vecs = read_vecs(args.dataset, count=args.count if args.count else -1)
        source = DenseSource(vectors=jnp.asarray(vecs))
        args.count, args.dim = vecs.shape
        metric = Metric.EUCLIDEAN  # SIFT-style datasets are L2
    else:
        source = random_unit_corpus(args.count, args.dim, seed=42)
    bp = BuildParams()
    sp = bp.optimization.search.replace(probe_depth=args.probe_depth)
    queries = source.vectors

    if args.mode == "pq":
        from parallel_hnsw_tpu.params import PqBuildParams
        from parallel_hnsw_tpu.pq import QuantizedHnsw

        dsub = 4 if args.dim % 4 == 0 else 5
        t0 = time.time()
        index = QuantizedHnsw.new(
            min(4096, args.count), source, dsub, metric, PqBuildParams(),
            seed=0, exact_quantize=True,
        )
        build_s = time.time() - t0
        search_fn = lambda q: index.search(q, sp, exact_quantize=True)
        tag = f"PQ({index.quantizer.nsub}x{dsub})"
    elif args.mode == "sharded":
        from parallel_hnsw_tpu.parallel import ShardedHnsw, default_mesh

        t0 = time.time()
        index = ShardedHnsw.generate(source, default_mesh(), bp, metric, seed=0,
                                     improve=args.improve)
        build_s = time.time() - t0
        search_fn = lambda q: index.search(q, sp, k=sp.number_of_candidates)
        tag = f"sharded x{default_mesh().devices.size}"
    elif args.mode == "exact":
        from parallel_hnsw_tpu.analysis import brute_force_knn

        build_s = float("nan")  # no index build
        search_fn = lambda q: brute_force_knn(source, q, metric, 10, args.query_block)
        tag = "exact MXU scan"
    else:
        t0 = time.time()
        index = Hnsw.generate(source, None, bp, metric, seed=0, improve=args.improve)
        build_s = time.time() - t0
        search_fn = lambda q: index.search(q, sp, query_block=args.query_block)
        tag = "dense"
    build_rate = args.count / build_s

    # ground truth for recall@10 on a query subsample
    q_eval = queries[: min(args.count, 10_000)]
    gt_ids, _ = brute_force_knn(source, q_eval, metric, 10)
    gt = np.asarray(gt_ids)

    # warmup (compile)
    ids, dists = search_fn(q_eval)
    got = np.asarray(ids[:, :10])
    inter = np.asarray(
        [len(np.intersect1d(got[i], gt[i])) for i in range(0, len(gt), 97)]
    )
    recall_at_10 = float(inter.mean() / 10.0)

    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.time()
        out = search_fn(q_eval)
        # force completion via host readback — block_until_ready is unreliable
        # on the tunneled runtime
        _ = int(np.asarray(out[0][-1, 0]))
        best = min(best, time.time() - t0)
    qps = len(gt) / best

    build_note = (
        "no build" if build_s != build_s else f"{build_s:.1f}s ({build_rate:.0f} vec/s)"
    )
    print(
        f"# build: {build_note} improve={args.improve}; recall@10={recall_at_10:.4f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": (
                    f"QPS/chip, {tag} ({args.count}x{args.dim}, "
                    f"ef={sp.number_of_candidates}, recall@10={recall_at_10:.4f}"
                    + ("" if build_s != build_s else f", build={build_rate:.0f} vec/s")
                    + ")"
                ),
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / REF_SINGLE_CORE_QPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
