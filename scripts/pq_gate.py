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

# ---- code-graph hop study (VERDICT r2 #3): exact reconstruct-per-hop vs
# routed bf16/projected rows.  recall@1 = self-queries (the reference's
# gate metric, src/pq.rs:956-978); recall@10 vs exact GT on 2048 queries.
import json
from parallel_hnsw_tpu.analysis import brute_force_knn

nq = 2048
queries = source.vectors[:nq]
gt_ids, _ = brute_force_knn(source, queries, M, 10, query_block=1024)
gt = np.asarray(gt_ids)


def graph_point(label):
    ids, _ = q.search(queries, rerank=True, exact_quantize=True)
    got = np.asarray(ids[:, :10])
    r1 = float((got[:, 0] == np.arange(nq)).mean())
    r10 = float(np.mean([len(np.intersect1d(got[i], gt[i])) for i in range(nq)]) / 10.0)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = q.search(queries, rerank=True, exact_quantize=True)
        _ = int(np.asarray(out[0][-1, 0]))
        best = min(best, time.time() - t0)
    print(json.dumps({"mode": label, "recall_at_1": round(r1, 4),
                      "recall_at_10": round(r10, 4), "qps": round(nq / best, 1)}),
          flush=True)


graph_point("code-graph exact-hop")
for dr in (None, 192, 128):
    t0 = time.time()
    q.enable_routing(dr=dr, seed=0)
    print(f"# enable_routing(dr={dr}): {time.time()-t0:.1f}s", flush=True)
    graph_point(f"code-graph routed-dr{dr}")
