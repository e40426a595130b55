"""Routed vs unrouted graph traversal on a built checkpoint (real chip).

Measures the routing-vector hop (parallel_hnsw_tpu/routing.py — narrow bf16
rows + exact rerank) against the exact traversal on the same graph/corpus:
recall@10 and QPS across ef, at several routing widths.

Usage:
  python scripts/routing_bench.py [count] [dr ...]
loads /tmp/idx_c2c_<count> (built by `big_bench.py config2c <count>`).
"""

import json
import sys
import time

sys.path.insert(0, ".")

from parallel_hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import numpy as np

from parallel_hnsw_tpu.analysis import brute_force_knn
from parallel_hnsw_tpu.io import deserialize_hnsw
from parallel_hnsw_tpu.ops.distance import Metric

sys.path.insert(0, "scripts")
from big_bench import N_EVAL, clustered_corpus  # noqa: E402


def measure(index, queries, sp, gt, routed):
    ids, _ = index.search(queries, sp, query_block=2048, routed=routed)
    got = np.asarray(ids[:, :10])
    inter = [len(np.intersect1d(got[i], gt[i])) for i in range(0, len(gt), 37)]
    recall = float(np.mean(inter) / 10.0)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = index.search(queries, sp, query_block=2048, routed=routed)
        _ = int(np.asarray(out[0][-1, 0]))
        best = min(best, time.time() - t0)
    return recall, len(gt) / best


def main(count=1_000_000, drs=(64, 32, None)):
    metric = Metric.EUCLIDEAN
    source = clustered_corpus(count, 128)
    index = deserialize_hnsw(f"/tmp/idx_c2c_{count}", source=source)
    queries = source.vectors[:N_EVAL]
    gt_ids, _ = brute_force_knn(source, queries, metric, 10, query_block=2048)
    gt = np.asarray(gt_ids)
    base_sp = index.build_parameters.optimization.search

    for ef in (24, 40, 60):
        sp = base_sp.replace(
            number_of_candidates=ef, upper_layer_candidate_count=min(ef, 100),
            probe_depth=2,
        )
        r, q = measure(index, queries, sp, gt, routed=False)
        print(json.dumps({"mode": "exact-hop", "ef": ef, "recall_at_10": round(r, 4),
                          "qps": round(q, 1)}), flush=True)
    for dr in drs:
        t0 = time.time()
        index.enable_routing(dr=dr, seed=0)
        print(f"# enable_routing(dr={dr}): {time.time()-t0:.1f}s", flush=True)
        for ef in (24, 40, 60):
            sp = base_sp.replace(
                number_of_candidates=ef, upper_layer_candidate_count=min(ef, 100),
                probe_depth=2,
            )
            r, q = measure(index, queries, sp, gt, routed=True)
            print(json.dumps({"mode": f"routed-dr{dr}", "ef": ef,
                              "recall_at_10": round(r, 4), "qps": round(q, 1)}),
                  flush=True)


if __name__ == "__main__":
    count = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    drs = [None if a == "none" else int(a) for a in sys.argv[2:]] or (64, 32, None)
    main(count, drs)
