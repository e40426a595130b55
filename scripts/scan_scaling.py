"""Flat-scan QPS vs corpus size: locating the scan/traversal crossover.

VERDICT r2 weak #7: the flat scans dominate graph traversal at every tested
scale, but the crossover corpus size where traversal must win was never
located — and the 100M serving story rests on it.  Graph-search QPS is
~N-independent (hops grow with log N; the hop cost is gather-issue-bound),
while scan cost is linear in N, so measuring scan QPS at 1M/2M/4M/8M x 128
pins the crossover against the measured 1M graph operating points
(BENCH_NOTES config2c: 6.6k QPS at recall 0.955, ef=24).

Usage: python scripts/scan_scaling.py [q] [dim] [modes] [sizes]
  modes: comma list of binned/folded/auto (default all three)
  sizes: comma list in MiB-rows, e.g. "2,8" (default "1,2,4,8"; corpora are
         drawn sequentially from one rng, so a trimmed run's corpus at a
         given n differs from a full run's — statistically equivalent)
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

from parallel_hnsw_tpu.analysis import brute_force_knn, fast_flat_knn
from parallel_hnsw_tpu.graph import DenseSource
from parallel_hnsw_tpu.ops.distance import Metric

M = Metric.EUCLIDEAN  # the SIFT-shaped config family


def timeit(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        _ = float(np.asarray(out[0]).ravel()[-1])  # host readback sync
        best = min(best, time.time() - t0)
    return best


def main(q=2048, dim=128, modes="binned,folded,auto", sizes="1,2,4,8"):
    print(jax.devices(), flush=True)
    mode_list = tuple(modes.split(","))
    size_list = tuple(int(s) << 20 for s in sizes.split(","))
    rng = np.random.default_rng(0)
    # clustered corpus (the honest case, same generator family as config2c)
    centers = rng.standard_normal((1024, dim)).astype(np.float32)
    for n in size_list:
        which = rng.integers(0, 1024, n)
        corpus = centers[which] + 0.35 * rng.standard_normal((n, dim)).astype(
            np.float32
        )
        src = DenseSource(vectors=jnp.asarray(corpus))
        queries = jnp.asarray(
            corpus[rng.permutation(n)[:q]]
            + 0.05 * rng.standard_normal((q, dim)).astype(np.float32)
        )
        # ground truth on a query subsample keeps the GT cost bounded at 8M
        gq = queries[:256]
        gt_ids, _ = brute_force_knn(src, gq, M, 10, query_block=256)
        gt = np.asarray(gt_ids)
        for scan_mode, ovs in ((m, 8) for m in mode_list):
            try:
                fn = lambda: fast_flat_knn(
                    src, queries, M, 10, oversample=ovs, scan_mode=scan_mode
                )
                ids, _ = fn()
                dt = timeit(fn)
                got = np.asarray(ids[:256, :10])
                rec = float(
                    np.mean(
                        [len(np.intersect1d(got[i], gt[i])) for i in range(len(gt))]
                    )
                    / 10.0
                )
                from parallel_hnsw_tpu.analysis import select_scan_mode

                resolved = (
                    select_scan_mode(n) if scan_mode == "auto" else scan_mode
                )
                print(
                    json.dumps(
                        {
                            "point": f"{scan_mode} n={n} ovs={ovs}",
                            "resolved_mode": resolved,
                            "ms": round(dt * 1e3, 2),
                            "qps": round(q / dt),
                            "recall_at_10": round(rec, 4),
                        }
                    ),
                    flush=True,
                )
            except Exception as e:
                print(f"# {scan_mode} n={n}: {type(e).__name__}: {e}", flush=True)
        del src, corpus


if __name__ == "__main__":
    argv = sys.argv[1:]
    kw = {}
    if len(argv) > 2:
        kw["modes"] = argv[2]
    if len(argv) > 3:
        kw["sizes"] = argv[3]
    main(*(int(a) for a in argv[:2]), **kw)
