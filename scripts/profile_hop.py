"""Micro-benchmark the pieces of one beam-search hop on the current device.

Answers "where do the 27ms/hop go" — merge sorts vs gathers vs frontier
selection vs scatter — to target kernel work at the real bottleneck.
"""

import sys
import time

sys.path.insert(0, ".")

from parallel_hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from parallel_hnsw_tpu.constants import EMPTY_DIST, EMPTY_ID
from parallel_hnsw_tpu.ops.queues import merge_queue_with_flags


def timeit(fn, *args, reps=20, label=""):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    dt = (time.time() - t0) / reps * 1000
    print(f"{label:44s} {dt:8.2f} ms")
    return dt


def main(q=8192, cap=300, b=4, m=48, n=100_000, d=100):
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, n, (q, cap)), jnp.int32)
    dists = jnp.sort(jnp.asarray(rng.random((q, cap)), jnp.float32), axis=-1)
    flags = jnp.zeros((q, cap), jnp.int32)
    new_ids = jnp.asarray(rng.integers(0, n, (q, b * m)), jnp.int32)
    new_d = jnp.asarray(rng.random((q, b * m)), jnp.float32)
    corpus = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    neighbors = jnp.asarray(rng.integers(0, n, (n, m)), jnp.int32)
    queries = jnp.asarray(rng.normal(size=(q, d)), jnp.float32)
    sel_nodes = jnp.asarray(rng.integers(0, n, (q, b)), jnp.int32)

    print(f"q={q} cap={cap} b={b} m={m} n={n} d={d}")

    merge = jax.jit(merge_queue_with_flags)
    timeit(merge, ids, dists, flags, new_ids, new_d, label="merge (2 sorts + dedup)")

    sort1 = jax.jit(
        lambda d_, i_: jax.lax.sort((d_, i_), dimension=-1, num_keys=2, is_stable=True)
    )
    alld = jnp.concatenate([dists, new_d], -1)
    alli = jnp.concatenate([ids, new_ids], -1)
    timeit(sort1, alld, alli, label=f"single lax.sort [{q},{cap+b*m}] 2-key")

    sort3 = jax.jit(
        lambda d_, i_, f_: jax.lax.sort((d_, i_, f_), dimension=-1, num_keys=2, is_stable=True)
    )
    allf = jnp.concatenate([flags, jnp.zeros_like(new_ids)], -1)
    timeit(sort3, alld, alli, allf, label=f"single lax.sort 3-operand")

    gather_rows = jax.jit(lambda nb, sel: jnp.take(nb, sel, axis=0))
    timeit(gather_rows, neighbors, sel_nodes, label=f"gather rows [{q},{b},{m}]")

    def gather_score(corp, flat, qs):
        vecs = jnp.take(corp, flat, axis=0)
        return jnp.einsum(
            "qd,qcd->qc", qs, vecs, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    timeit(jax.jit(gather_score), corpus, new_ids, queries, label=f"gather+score [{q},{b*m},{d}]")

    topk = jax.jit(lambda r: jax.lax.top_k(-r, b))
    rank = jnp.asarray(rng.integers(0, cap, (q, cap)), jnp.int32)
    timeit(topk, rank, label=f"top_k frontier [{q},{cap}] k={b}")

    scatter = jax.jit(
        lambda e, s: e.at[jnp.arange(q)[:, None], s].set(1)
    )
    timeit(scatter, flags, jnp.asarray(rng.integers(0, cap, (q, b)), jnp.int32),
           label="scatter expanded mark")


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
