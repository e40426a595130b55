"""A/B the neighbor-major hop slabs on the real chip.

Workloads: the 10k x 100 bench graph (the driver's gate workload) and,
when present, the 1M clustered checkpoint.  Measures graph-search QPS at a
few operating points for: plain hop, f32 slabs, routing(bf16)+slabs.

Usage: python scripts/slab_bench.py [count] [dim]
"""

import json
import sys
import time

sys.path.insert(0, ".")

from parallel_hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import numpy as np

from parallel_hnsw_tpu.index import Hnsw
from parallel_hnsw_tpu.ops.distance import Metric
from parallel_hnsw_tpu.params import SearchParams
from parallel_hnsw_tpu.utils.data import random_unit_corpus


def measure(h, queries, sp, gt, label):
    ids, _ = h.search(queries, sp)  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = h.search(queries, sp)
        _ = int(np.asarray(out[0][-1, 0]))
        best = min(best, time.time() - t0)
    got = np.asarray(ids[:, :10])
    r = float(np.mean([len(np.intersect1d(got[i], gt[i])) for i in range(len(gt))]) / 10)
    print(
        json.dumps(
            {
                "mode": label,
                "ef": sp.number_of_candidates,
                "pd": sp.probe_depth,
                "recall_at_10": round(r, 4),
                "qps": round(len(gt) / best),
            }
        ),
        flush=True,
    )


def main(count=10_000, dim=100):
    print(jax.devices(), flush=True)
    source = random_unit_corpus(count, dim, seed=42)  # bench.py's corpus
    metric = Metric.NORMALIZED_COSINE  # the gate workload's metric
    t0 = time.time()
    h = Hnsw.generate(source, metric=metric)
    print(f"# build: {time.time()-t0:.1f}s", flush=True)
    queries = source.vectors
    from parallel_hnsw_tpu.analysis import brute_force_knn

    gt_ids, _ = brute_force_knn(source, queries, metric, 10)
    gt = np.asarray(gt_ids)

    # pin upper_layer_candidate_count like bench.py's op-point selection does,
    # so the ef=12/pd=1 row is the actual gate operating point
    def op(ef, pd):
        return SearchParams(
            number_of_candidates=ef,
            upper_layer_candidate_count=min(ef, 300),
            probe_depth=pd,
            beam_width=4,
        )

    points = [op(12, 1), op(24, 1), op(40, 2), op(300, 2)]
    for sp in points:
        measure(h, queries, sp, gt, "plain")
    h.enable_hop_slabs(byte_budget=8 << 30)
    for sp in points:
        measure(h, queries, sp, gt, "slab_f32")
    h.enable_routing(dr=None)
    h.enable_hop_slabs(byte_budget=8 << 30)
    for sp in points:
        measure(h, queries, sp, gt, "routed_bf16_slab")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
