"""Round-5 library-surface verification on the real chip (verify skill).

Runs from OUTSIDE the repo (cwd=/tmp) against public exports, driving the
round-5 change surface end-to-end on the axon TPU: per-subspace sharded PQ
(both residency modes on a 1-device mesh), scan-only builds, and the
serialize round-trip of the subspace quantizer.  Prints PASS/FAIL lines and
exits nonzero on any failure.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from parallel_hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

T0 = time.time()
FAILED = []


def check(name, ok, detail=""):
    print(f"{'PASS' if ok else 'FAIL'} t+{time.time()-T0:5.0f}s {name} {detail}",
          flush=True)
    if not ok:
        FAILED.append(name)


def main():
    print(jax.devices(), flush=True)
    from parallel_hnsw_tpu.graph import open_memmap_source
    from parallel_hnsw_tpu.io import (
        deserialize_sharded_quantized_hnsw,
        serialize_sharded_quantized_hnsw,
    )
    from parallel_hnsw_tpu.ops.distance import Metric
    from parallel_hnsw_tpu.parallel import ShardedQuantizedHnsw
    from parallel_hnsw_tpu.pq import SubspaceQuantizer

    count, dim = 6000, 64
    rng = np.random.default_rng(0)
    arr = rng.standard_normal((count, dim)).astype(np.float32)
    arr /= np.linalg.norm(arr, axis=1, keepdims=True)
    path = "/tmp/verify_r5_corpus.f32"
    arr.tofile(path)
    mm = open_memmap_source(path, dim)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("shard",))

    # out-of-core per-subspace build on the chip (streamed chunks)
    sq = ShardedQuantizedHnsw.new(
        number_of_centroids=256, full_source=mm, dsub=8,
        metric=Metric.NORMALIZED_COSINE, mesh=mesh, seed=0,
        fast_quantize=True, chunk_size=2000, improve=False,
        per_subspace=True,
    )
    check("quantizer kind", isinstance(sq.quantizer, SubspaceQuantizer))
    check("codes-only residency", sq.full_stacked is None)
    check("3d codebook", sq.sharded.source_stacked.codebook.ndim == 3,
          str(sq.sharded.source_stacked.codebook.shape))

    q = jnp.asarray(arr[:128])
    ids, dists = sq.search_exact(q, k=5, fast=True, oversample=8)
    hit = float((np.asarray(ids)[:, 0] == np.arange(128)).mean())
    check("ooc per-subspace flat-scan self-hit", hit >= 0.99, f"{hit:.3f}")
    d0 = float(np.abs(np.asarray(dists)[:, 0]).max())
    check("exact rerank distances", d0 < 1e-3, f"max self-dist {d0:.2e}")

    ids2, _ = sq.search(q, k=5)
    hit2 = float((np.asarray(ids2)[:, 0] == np.arange(128)).mean())
    check("ooc per-subspace graph-search self-hit", hit2 >= 0.95, f"{hit2:.3f}")

    serialize_sharded_quantized_hnsw(sq, "/tmp/verify_r5_sq")
    back = deserialize_sharded_quantized_hnsw("/tmp/verify_r5_sq", mesh,
                                              full_source=mm)
    ids3, _ = back.search_exact(q, k=5, fast=True, oversample=8)
    check("subspace round-trip identical",
          bool(np.array_equal(np.asarray(ids), np.asarray(ids3))))

    # scan-only build (build_graphs=False) on chip
    so = ShardedQuantizedHnsw.new(
        number_of_centroids=256, full_source=mm, dsub=8,
        metric=Metric.NORMALIZED_COSINE, mesh=mesh, seed=0,
        fast_quantize=True, chunk_size=2000, per_subspace=True,
        build_graphs=False,
    )
    check("scan-only: no shard graphs", so.sharded.layers_stacked == [])
    ids4, _ = so.search_exact(q, k=5, fast=True, oversample=8)
    hit4 = float((np.asarray(ids4)[:, 0] == np.arange(128)).mean())
    check("scan-only flat-scan self-hit", hit4 >= 0.99, f"{hit4:.3f}")

    print(json.dumps({"verify_r5": "ok" if not FAILED else "failed",
                      "failed": FAILED,
                      "wall_s": round(time.time() - T0, 1)}), flush=True)
    sys.exit(1 if FAILED else 0)


if __name__ == "__main__":
    main()
