"""Out-of-core ingest throughput on the real chip (VERDICT r4 #9).

Drives a multi-GB raw f32 corpus from DISK through
``ShardedQuantizedHnsw.new`` (the genuine out-of-core path: MemmapSource ->
per-shard streamed chunks host->device -> fused binned-argmin quantize ->
codes-only HBM residency) and records measured ingest rows/s and bytes/s —
turning BENCH_NOTES' config-5 ingest arithmetic into a measurement.

Default geometry: 2M x 768-d f32 = 6.1 GB on disk, 96x8 u16 codes = 384 MB
resident (1/16th of a config-5 shard's ingest, same chunk shape: 100k rows
x 3 KB = 300 MB per chunk).  Built scan-only (``build_graphs=False``) —
config5's serving engine is the flat code scan, and a 2M-node code graph
would add hours of build for an engine the config never walks.  The ingest
number itself is the ooc_ingest_shard trace span (streamed chunks +
quantize); centroid selection/graph are reported via the total.

Usage: python scripts/ingest_bench.py [count] [dim]
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
from jax.sharding import Mesh

from parallel_hnsw_tpu.graph import MemmapSource, open_memmap_source
from parallel_hnsw_tpu.ops.distance import Metric
from parallel_hnsw_tpu.params import (
    BuildParams,
    OptimizationParams,
    PqBuildParams,
    SearchParams,
)
from parallel_hnsw_tpu.parallel import ShardedQuantizedHnsw
from parallel_hnsw_tpu.utils.trace import enable_tracing

PATH = "/tmp/ingest_corpus.f32"
T0 = time.time()


def stamp(msg):
    print(f"# t+{time.time() - T0:7.0f}s  {msg}", flush=True)


class VerboseMemmap(MemmapSource):
    """MemmapSource that narrates each streamed chunk (progress visibility —
    the 2M x 768 drive runs tens of minutes with long silent device phases)."""

    def chunks(self, chunk_size: int = 100_000, ids=None):
        for i, ch in enumerate(super().chunks(chunk_size, ids)):
            stamp(f"chunk {i}: {len(ch)} rows host->device")
            yield ch


def write_corpus(count, dim):
    if os.path.exists(PATH) and os.path.getsize(PATH) == count * dim * 4:
        print(f"# reusing {PATH}", flush=True)
        return
    rng = np.random.default_rng(0)
    t0 = time.time()
    with open(PATH, "wb") as f:
        per = 100_000
        for i in range(0, count, per):
            m = min(per, count - i)
            x = rng.standard_normal((m, dim)).astype(np.float32)
            x /= np.linalg.norm(x, axis=1, keepdims=True)
            f.write(x.tobytes())
    print(f"# wrote {count * dim * 4 / 1e9:.1f} GB in {time.time()-t0:.0f}s",
          flush=True)


def main(count=2_000_000, dim=768):
    write_corpus(count, dim)
    tracer = enable_tracing(log=stamp)
    mm = open_memmap_source(PATH, dim)
    assert mm.count == count
    mm = VerboseMemmap(vectors=mm.vectors)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("shard",))

    # cheap code-graph params: the ingest number is the span, the graph build
    # is reported separately (it is the same build path bench.py measures)
    small = BuildParams(
        optimization=OptimizationParams(
            recall_proportion=0.001,
            search=SearchParams(number_of_candidates=24,
                                upper_layer_candidate_count=24, probe_depth=1),
        ),
    )
    pqp = PqBuildParams(centroids=small, hnsw=small)

    stamp("starting ShardedQuantizedHnsw.new (centroids -> centroid graph "
          "-> streamed quantize -> code graph)")
    t0 = time.time()
    q = ShardedQuantizedHnsw.new(
        65_535, mm, dim // 96, Metric.NORMALIZED_COSINE, mesh, pqp,
        seed=0, fast_quantize=True, chunk_size=100_000, improve=False,
        verbose=True, build_graphs=False,
    )
    total_s = time.time() - t0
    stamp(f"build done in {total_s:.0f}s")
    assert q.full_stacked is None  # codes-only residency

    spans = [e for e in tracer.events if e.name == "ooc_ingest_shard"]
    ingest_s = sum(e.seconds for e in spans)
    rows = sum(e.counters["rows"] for e in spans)
    nbytes = sum(e.counters["bytes"] for e in spans)

    # sanity: the index actually answers queries from disk-resident truth
    queries = jax.numpy.asarray(np.asarray(mm.vectors[:256]))
    ids, _ = q.search_exact(queries, k=5, fast=True, oversample=8)
    self_hit = float((np.asarray(ids)[:, 0] == np.arange(256)).mean())

    print(json.dumps({
        "config": f"ooc_ingest_{count}x{dim}",
        "disk_gb": round(count * dim * 4 / 1e9, 2),
        "codes_resident_mb": round(count * (dim // 8) * 2 / 1e6, 1),
        "ingest_s": round(ingest_s, 1),
        "ingest_rows_per_s": round(rows / ingest_s, 1),
        "ingest_gb_per_s": round(nbytes / ingest_s / 1e9, 3),
        "total_build_s": round(total_s, 1),
        "self_hit_at_1": self_hit,
    }), flush=True)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
