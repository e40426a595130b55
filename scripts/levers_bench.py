"""Rank the traversal levers on one workload (VERDICT r3 #5).

One table: plain hop / routed(dr=None, bf16 rows) / f32 hop slabs /
routed+slabs, measured at 2-3 operating points on

* ``gate`` — the 10k x 100 cosine bench graph (the driver's gate workload);
* ``c2c``  — the 1M x 128 L2 clustered checkpoint (/tmp/idx_c2c_1000000,
  built by ``big_bench.py config2c``; this script builds it if absent).

Flat-scan rows are printed for context (the engine the graph must beat).
Prints one JSON line per (mode, op-point).

Usage: python scripts/levers_bench.py [gate|c2c] [count]
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

from parallel_hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import numpy as np

from parallel_hnsw_tpu.analysis import brute_force_knn
from parallel_hnsw_tpu.index import Hnsw
from parallel_hnsw_tpu.ops.distance import Metric
from parallel_hnsw_tpu.params import SearchParams
from parallel_hnsw_tpu.utils.data import random_unit_corpus


def op(ef, pd):
    return SearchParams(
        number_of_candidates=ef,
        upper_layer_candidate_count=min(ef, 300),
        probe_depth=pd,
        beam_width=4,
    )


def measure(h, queries, sp, gt, label):
    try:
        ids, _ = h.search(queries, sp)  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = h.search(queries, sp)
            _ = int(np.asarray(out[0][-1, 0]))
            best = min(best, time.time() - t0)
    except Exception as e:  # OOM/byte-budget — record the miss, keep going
        print(f"# {label} ef={sp.number_of_candidates}: "
              f"{type(e).__name__}: {e}", flush=True)
        return
    got = np.asarray(ids[:, :10])
    r = float(
        np.mean([len(np.intersect1d(got[i], gt[i])) for i in range(len(gt))]) / 10
    )
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


def run_modes(h, queries, gt, points, budget):
    for sp in points:
        measure(h, queries, sp, gt, "plain")

    try:
        t0 = time.time()
        h.enable_hop_slabs(byte_budget=budget)
        print(f"# f32 slabs built in {time.time()-t0:.1f}s", flush=True)
        for sp in points:
            measure(h, queries, sp, gt, "slab_f32")
    except Exception as e:
        print(f"# slab_f32 unavailable: {type(e).__name__}: {e}", flush=True)
    finally:
        h.disable_hop_slabs()

    t0 = time.time()
    h.enable_routing(dr=None)  # bf16 rows, full width; exact rerank restores
    print(f"# routing rows built in {time.time()-t0:.1f}s", flush=True)
    for sp in points:
        measure(h, queries, sp, gt, "routed_bf16")

    try:
        t0 = time.time()
        h.enable_hop_slabs(byte_budget=budget)
        print(f"# bf16 slabs built in {time.time()-t0:.1f}s", flush=True)
        for sp in points:
            measure(h, queries, sp, gt, "routed_bf16+slab")
    except Exception as e:
        print(f"# routed+slab unavailable: {type(e).__name__}: {e}", flush=True)
    finally:
        h.disable_hop_slabs()
        h.disable_routing()


def flat_rows(h, queries, gt):
    for label, kwargs in (
        ("exact_scan", {}),
        ("fast_scan+rerank", {"fast": True, "oversample": 8}),
    ):
        try:
            ids, _ = h.search_exact(queries, k=10, query_block=2048, **kwargs)
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                out = h.search_exact(queries, k=10, query_block=2048, **kwargs)
                _ = int(np.asarray(out[0][-1, 0]))
                best = min(best, time.time() - t0)
        except Exception as e:
            print(f"# {label}: {type(e).__name__}: {e}", flush=True)
            continue
        got = np.asarray(ids[:, :10])
        r = float(
            np.mean([len(np.intersect1d(got[i], gt[i])) for i in range(len(gt))])
            / 10
        )
        print(
            json.dumps(
                {"mode": label, "recall_at_10": round(r, 4),
                 "qps": round(len(gt) / best)}
            ),
            flush=True,
        )


def gate(count=10_000, dim=100):
    print(jax.devices(), flush=True)
    source = random_unit_corpus(count, dim, seed=42)
    metric = Metric.NORMALIZED_COSINE
    t0 = time.time()
    h = Hnsw.generate(source, metric=metric)
    print(f"# build: {time.time()-t0:.1f}s", flush=True)
    queries = source.vectors
    gt_ids, _ = brute_force_knn(source, queries, metric, 10)
    gt = np.asarray(gt_ids)
    points = [op(12, 1), op(24, 2), op(300, 2)]
    run_modes(h, queries, gt, points, budget=8 << 30)
    flat_rows(h, queries, gt)


def c2c(count=1_000_000, nq=2048):
    """1M clustered checkpoint: the scale where slab byte budgets bite.

    f32 slabs at 1Mx48x128 = 24.5 GB (beyond one v5e's HBM) — expected to be
    recorded as unavailable; bf16 routed slabs = 12.3 GB, borderline.  The
    point of this run is the honest table either way."""
    sys.path.insert(0, os.path.dirname(__file__))
    from big_bench import build_graph, clustered_corpus

    print(jax.devices(), flush=True)
    metric = Metric.EUCLIDEAN
    source = clustered_corpus(count, 128)
    h = build_graph(source, metric, f"c2c_{count}")
    queries = source.vectors[:nq]
    gt_ids, _ = brute_force_knn(source, queries, metric, 10, query_block=1024)
    gt = np.asarray(gt_ids)
    points = [op(24, 2), op(100, 2)]
    run_modes(h, queries, gt, points, budget=13 << 30)
    flat_rows(h, queries, gt)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "gate"
    args = [int(a) for a in sys.argv[2:]]
    {"gate": gate, "c2c": c2c}[which](*args)
