"""Operating-point sweep: recall@10 vs QPS curve on the real chip.

Builds one graph per corpus config, then sweeps (ef, probe_depth, beam_width)
measuring recall@10 and QPS for each point — the BASELINE.md "recall@10 sweep
vs ef_search" gate.  Timing via host readback (block_until_ready is unreliable
on the tunneled runtime).

Usage: PYTHONPATH=.:/root/.axon_site python scripts/op_sweep.py [count] [dim]
"""

import sys
import time

sys.path.insert(0, ".")

from parallel_hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np

from parallel_hnsw_tpu.analysis import brute_force_knn
from parallel_hnsw_tpu.index import Hnsw
from parallel_hnsw_tpu.ops.distance import Metric
from parallel_hnsw_tpu.params import BuildParams
from parallel_hnsw_tpu.utils.data import random_unit_corpus


def main(count=10_000, dim=100, improve=True):
    metric = Metric.NORMALIZED_COSINE
    source = random_unit_corpus(count, dim, seed=42)
    bp = BuildParams()
    t0 = time.time()
    index = Hnsw.generate(source, None, bp, metric, seed=0, improve=improve)
    print(f"# build {count}x{dim}: {time.time()-t0:.1f}s", flush=True)

    q_eval = source.vectors[: min(count, 10_000)]
    gt_ids, _ = brute_force_knn(source, q_eval, metric, 10)
    gt = np.asarray(gt_ids)

    base_sp = bp.optimization.search
    grid = []
    for ef in (40, 60, 100, 150, 300):
        for pd in (2, 4, 8):
            for bw in (4, 8):
                grid.append((ef, pd, bw))

    print(f"{'ef':>4} {'pd':>3} {'bw':>3} {'recall@10':>9} {'QPS':>9}")
    results = []
    for ef, pd, bw in grid:
        sp = base_sp.replace(
            number_of_candidates=ef,
            upper_layer_candidate_count=min(ef, base_sp.upper_layer_candidate_count),
            probe_depth=pd,
            beam_width=bw,
        )
        ids, dists = index.search(q_eval, sp, query_block=2048)  # compile+warm
        got = np.asarray(ids[:, :10])
        inter = np.asarray(
            [len(np.intersect1d(got[i], gt[i])) for i in range(0, len(gt), 37)]
        )
        recall = float(inter.mean() / 10.0)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = index.search(q_eval, sp, query_block=2048)
            _ = int(np.asarray(out[0][-1, 0]))
            best = min(best, time.time() - t0)
        qps = len(gt) / best
        results.append((ef, pd, bw, recall, qps))
        print(f"{ef:>4} {pd:>3} {bw:>3} {recall:>9.4f} {qps:>9.0f}", flush=True)

    ok = [r for r in results if r[3] >= 0.95]
    if ok:
        best = max(ok, key=lambda r: r[4])
        print(f"# best >=0.95: ef={best[0]} pd={best[1]} bw={best[2]} "
              f"recall={best[3]:.4f} qps={best[4]:.0f}")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
