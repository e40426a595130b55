"""Derive a defensible reference-single-core QPS bound from measured work.

The Rust toolchain is absent and the reference publishes no numbers
(/root/reference/README.md:1-2; its bench is bit-rotted, benches/bench.rs:61),
so the baseline is derived: instrument our search on the reference's own bench
workload (10k x 100-d cosine, ef=300/probe_depth=2 defaults,
/root/reference/src/parameters.rs:10-18) to count distance evaluations per
query, then convert with a transparent per-eval cost band for one modern x86
core:

* the 10k x 100-d f32 corpus is 4 MB — L2/L3 resident, so a 100-d dot is
  ~12.5 AVX2 FMA cycles ≈ 4 ns; with gather/visited-set/queue overhead the
  realistic band is 15-40 ns per evaluation (the reference walks a sorted
  Vec-queue with binary-search inserts per merge, priority_queue.rs:70-107).

Run: PYTHONPATH=.:/root/.axon_site python scripts/derive_baseline.py
"""

import sys
import time

sys.path.insert(0, ".")

from parallel_hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np

from parallel_hnsw_tpu.index import Hnsw
from parallel_hnsw_tpu.ops.distance import Metric
from parallel_hnsw_tpu.params import BuildParams
from parallel_hnsw_tpu.utils.data import random_unit_corpus


def main(count=10_000, dim=100):
    source = random_unit_corpus(count, dim, seed=42)
    bp = BuildParams()
    t0 = time.time()
    index = Hnsw.generate(source, None, bp, Metric.NORMALIZED_COSINE, seed=0)
    print(f"# build: {time.time()-t0:.1f}s")

    sp = bp.optimization.search  # reference defaults: ef=300, pd=2
    q = source.vectors[:2048]
    ids, dists, stats = index.search_instrumented(q, sp)
    evals_per_query = stats["distance_evaluations"] / len(q)
    hops = stats["hops"]
    print(f"# op point ef={sp.number_of_candidates} pd={sp.probe_depth} "
          f"bw={sp.beam_width}")
    print(f"distance evals/query (batched TPU search): {evals_per_query:.0f}")
    print(f"total lockstep hops: {hops}")
    # The reference's sequential greedy search expands ~1 node per pop and
    # stops earlier per query (no lockstep): its evals/query is below the
    # batched count.  Use the batched count as an upper bound on its work and
    # the greedy ef*M bound as a cross-check.
    m0 = bp.zero_layer_neighborhood_size
    greedy_bound = sp.number_of_candidates * m0
    print(f"greedy-bound evals/query (ef * M0): {greedy_bound}")
    for ns in (15, 25, 40):
        est = 1e9 / (min(evals_per_query, greedy_bound) * ns)
        print(f"single-core QPS estimate @ {ns} ns/eval: {est:.0f}")


if __name__ == "__main__":
    main()
