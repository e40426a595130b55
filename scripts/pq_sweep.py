"""Operating-point sweep for the PQ code graph at the 100k x 1536 gate.

Loads the index checkpointed by pq_gate.py and sweeps ef x hop mode
(exact reconstruct-per-hop vs bf16 / projected routing rows) — the honest
"QPS at equal recall" comparison for VERDICT r2 #3.  Flat-scan rows are the
engine ceiling for context.

Usage: python scripts/pq_sweep.py
"""

import json
import sys
import time

sys.path.insert(0, ".")

from parallel_hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np

from parallel_hnsw_tpu.analysis import brute_force_knn
from parallel_hnsw_tpu.io import deserialize_quantized_hnsw
from parallel_hnsw_tpu.ops.distance import Metric
from parallel_hnsw_tpu.utils.data import random_unit_corpus

M = Metric.EUCLIDEAN
CKPT = "/tmp/pq_gate_index"


def main(nq=2048, efs=(24, 48, 100, 300)):
    source = random_unit_corpus(100_000, 1536, seed=3)
    q = deserialize_quantized_hnsw(CKPT)
    q.full_source = source
    queries = source.vectors[:nq]
    gt_ids, _ = brute_force_knn(source, queries, M, 10, query_block=1024)
    gt = np.asarray(gt_ids)
    base_sp = q.hnsw.build_parameters.optimization.search

    def point(label, sp):
        ids, _ = q.search(queries, sp, rerank=True, exact_quantize=True)
        got = np.asarray(ids[:, :10])
        r1 = float((got[:, 0] == np.arange(nq)).mean())
        r10 = float(
            np.mean([len(np.intersect1d(got[i], gt[i])) for i in range(nq)]) / 10.0
        )
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            out = q.search(queries, sp, rerank=True, exact_quantize=True)
            _ = int(np.asarray(out[0][-1, 0]))
            best = min(best, time.time() - t0)
        print(json.dumps({"mode": label, "ef": sp.number_of_candidates,
                          "recall_at_1": round(r1, 4), "recall_at_10": round(r10, 4),
                          "qps": round(nq / best, 1)}), flush=True)

    def _slabs(dr):
        def go():
            q.enable_routing(dr=dr)
            q.enable_hop_slabs(byte_budget=10 << 30)
        return go

    def _plain():
        q.hnsw.disable_routing()
        q.hnsw.disable_hop_slabs()

    for label, enable in (
        ("exact-hop", _plain),
        ("routed-bf16", lambda: (q.hnsw.disable_hop_slabs(), q.enable_routing(dr=None))),
        ("routed-bf16+slabs", _slabs(None)),
        ("routed-dr384+slabs", _slabs(384)),
    ):
        enable()
        for ef in efs:
            sp = base_sp.replace(
                number_of_candidates=ef,
                upper_layer_candidate_count=min(ef, 100),
                probe_depth=2,
            )
            point(label, sp)


if __name__ == "__main__":
    main()
