"""Micro-study: inline neighbor-vector slab vs per-candidate row gather.

Round-1 finding (BENCH_NOTES.md): jnp.take costs ~22ns *per row* regardless of
row width — issue-bound.  Hypothesis: packing each node's M neighbor vectors
into one wide row ([N, M*D]) amortizes the per-row overhead M-fold, turning
the beam-search hop's dominant gather from 15ms to <1ms at qb=8192.

Run on the real chip:  nohup python scripts/slab_study.py > /tmp/slab.log 2>&1 &
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from parallel_hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N, M, D = 10_000, 48, 100
QB = 8192
B = 1  # beam width

key = jax.random.PRNGKey(0)
vectors = jax.random.normal(key, (N, D), jnp.float32)
neighbors = jax.random.randint(jax.random.PRNGKey(1), (N, M), 0, N, jnp.int32)
# the inline slab: slab[n] = vectors[neighbors[n]].reshape(M*D)
slab = jnp.take(vectors, neighbors, axis=0).reshape(N, M * D)
slab_bf16 = slab.astype(jnp.bfloat16)
queries = jax.random.normal(jax.random.PRNGKey(2), (QB, D), jnp.float32)
sel = jax.random.randint(jax.random.PRNGKey(3), (QB, B), 0, N, jnp.int32)


def t(fn, *args, reps=20):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x[..., -1]).ravel()[0], out)  # force
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x[..., -1]).ravel()[0], out)
    return (time.perf_counter() - t0) / reps


@jax.jit
def old_gather(vectors, neighbors, sel, queries):
    """Round-1 hop data path: row gather of Q*B neighbor rows then Q*B*M
    candidate vectors, then distances."""
    rows = jnp.take(neighbors, sel, axis=0)  # [QB, B, M]
    flat = rows.reshape(QB, B * M)
    cand = jnp.take(vectors, flat.reshape(-1), axis=0).reshape(QB, B * M, D)
    d = jnp.einsum("qd,qcd->qc", queries, cand, precision=jax.lax.Precision.HIGHEST)
    return d


@jax.jit
def slab_gather(slab, neighbors, sel, queries):
    """Slab hop: one wide-row gather per (query, beam slot)."""
    wide = jnp.take(slab, sel[:, 0], axis=0)  # [QB, M*D]
    cand = wide.reshape(QB, M, D)
    rows = jnp.take(neighbors, sel[:, 0], axis=0)  # [QB, M] ids (cheap)
    d = jnp.einsum("qd,qcd->qc", queries, cand, precision=jax.lax.Precision.HIGHEST)
    return d, rows


@jax.jit
def slab_gather_bf16(slab, neighbors, sel, queries):
    wide = jnp.take(slab, sel[:, 0], axis=0)
    cand = wide.reshape(QB, M, D).astype(jnp.float32)
    rows = jnp.take(neighbors, sel[:, 0], axis=0)
    d = jnp.einsum("qd,qcd->qc", queries, cand, precision=jax.lax.Precision.HIGHEST)
    return d, rows


@jax.jit
def merge_sort_cost(ids, dists, new_ids, new_dists):
    """The hop's queue merge (concat + lex sort) at cap=300, new=48."""
    ai = jnp.concatenate([ids, new_ids], axis=-1)
    ad = jnp.concatenate([dists, new_dists], axis=-1)
    sd, si = jax.lax.sort((ad, ai), num_keys=1)
    return si[:, :300], sd[:, :300]


ids = jnp.zeros((QB, 300), jnp.int32)
dists = jnp.linspace(0, 1, 300)[None].repeat(QB, 0)
nids = jnp.ones((QB, M), jnp.int32)
ndists = jnp.linspace(0, 1, M)[None].repeat(QB, 0)

print(f"config: N={N} M={M} D={D} QB={QB}")
print(f"old row-gather hop     : {t(old_gather, vectors, neighbors, sel, queries)*1e3:8.2f} ms")
print(f"slab wide-gather hop   : {t(slab_gather, slab, neighbors, sel, queries)*1e3:8.2f} ms")
print(f"slab bf16 hop          : {t(slab_gather_bf16, slab_bf16, neighbors, sel, queries)*1e3:8.2f} ms")
print(f"queue merge (sort 348) : {t(merge_sort_cost, ids, dists, nids, ndists)*1e3:8.2f} ms")

# beam width sweep on slab: B wide rows per query
for b in (2, 4, 8):
    selb = jax.random.randint(jax.random.PRNGKey(4), (QB, b), 0, N, jnp.int32)

    @jax.jit
    def slab_b(slab, neighbors, selb, queries):
        wide = jnp.take(slab, selb.reshape(-1), axis=0)  # [QB*b, M*D]
        cand = wide.reshape(QB, b * M, D)
        rows = jnp.take(neighbors, selb.reshape(-1), axis=0).reshape(QB, b * M)
        d = jnp.einsum("qd,qcd->qc", queries, cand, precision=jax.lax.Precision.HIGHEST)
        return d, rows

    print(f"slab hop beam={b}        : {t(slab_b, slab, neighbors, selb, queries)*1e3:8.2f} ms")
