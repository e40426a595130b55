"""Reference PQ gate (test_pq_recall scale): 100k x 1536, 65535 centroids."""
import sys, time
sys.path.insert(0, "/root/repo")
from parallel_hnsw_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np
from parallel_hnsw_tpu.ops.distance import Metric
from parallel_hnsw_tpu.params import PqBuildParams
from parallel_hnsw_tpu.pq import QuantizedHnsw
from parallel_hnsw_tpu.utils.data import random_unit_corpus
from parallel_hnsw_tpu.progress import CallbackProgressMonitor

M = Metric.EUCLIDEAN
print("corpus...", flush=True)
source = random_unit_corpus(100_000, 1536, seed=3)
pqp = PqBuildParams()
mon = CallbackProgressMonitor(on_update=lambda e: print("ev:", e, flush=True))
t0 = time.time()
import os
from parallel_hnsw_tpu.io import serialize_quantized_hnsw, deserialize_quantized_hnsw
CKPT = "/tmp/pq_gate_index"
if os.path.exists(CKPT + "/hnsw/meta"):
    print("loading checkpoint", flush=True)
    q = deserialize_quantized_hnsw(CKPT)
else:
    q = QuantizedHnsw.new(
        number_of_centroids=65_535, full_source=source, dsub=16, metric=M,
        pqp=pqp, seed=0, exact_quantize=True, progress=mon,
    )
    print(f"PQ BUILD 100k x 1536 (65535 centroids, 96x16 codes): {time.time()-t0:.1f}s", flush=True)
    q.full_source = source
    serialize_quantized_hnsw(q, CKPT)
    print("checkpointed", flush=True)
total = 10000
t0 = time.time()
ids, dists = q.search(source.vectors[:total], rerank=True, exact_quantize=True)
rec = (np.asarray(ids[:, 0]) == np.arange(total)).mean()
print(f"PQ graph-search recall@1 (rerank) = {rec:.4f} ({time.time()-t0:.0f}s incl compile)", flush=True)
t0 = time.time()
ids2, _ = q.search_exact(source.vectors[:total], k=10, rerank=True)
rec2 = (np.asarray(ids2[:, 0]) == np.arange(total)).mean()
print(f"PQ flat-scan recall@1 (rerank) = {rec2:.4f} ({time.time()-t0:.0f}s incl compile)", flush=True)
t0=time.time()
o = q.search_exact(source.vectors[:total], k=10, rerank=True)
_ = int(np.asarray(o[0][-1, 0]))
print(f"flat-scan QPS = {total/(time.time()-t0):.0f}", flush=True)
