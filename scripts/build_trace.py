"""Phase-trace a warm 10k build on the real chip (round-3 build-gate work).

Builds the bench workload twice (first run eats any fresh compiles; second is
the measurement) and prints the TRACER summary of the second build.
"""

import sys
import time

sys.path.insert(0, ".")

from parallel_hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from parallel_hnsw_tpu.index import Hnsw
from parallel_hnsw_tpu.ops.distance import Metric
from parallel_hnsw_tpu.params import BuildParams
from parallel_hnsw_tpu.utils.data import random_unit_corpus
from parallel_hnsw_tpu.utils.trace import TRACER, enable_tracing

count = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
dim = int(sys.argv[2]) if len(sys.argv) > 2 else 100

source = random_unit_corpus(count, dim, seed=42)
bp = BuildParams()

t0 = time.time()
Hnsw.generate(source, None, bp, Metric.NORMALIZED_COSINE, seed=0, improve=True)
print(f"cold build: {time.time() - t0:.1f}s", flush=True)

enable_tracing(log=None)
TRACER.events.clear()
t0 = time.time()
Hnsw.generate(source, None, bp, Metric.NORMALIZED_COSINE, seed=0, improve=True)
warm = time.time() - t0
print(f"warm build: {warm:.1f}s = {count / warm:.0f} vec/s", flush=True)
print(TRACER.format_summary(), flush=True)
