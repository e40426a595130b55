"""Can a Pallas DMA pipeline beat XLA's row gather?

The graph hop is gather-issue-bound: `jnp.take` of R scattered rows costs
~22ns/row on this chip regardless of row width (BENCH_NOTES gather study).
This measures a Pallas kernel that issues per-row HBM->VMEM DMAs from
scalar-prefetched indices with an N-deep in-flight pipeline, against
`jnp.take`, at the hop's actual shape (qb * beam * M rows from a [N, D]
corpus).

Usage: PYTHONPATH=.:/root/.axon_site python -u scripts/gather_kernel_study.py
"""

import sys
import time

sys.path.insert(0, ".")

from parallel_hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_PER_BLOCK = 2048
NBUF = 16


def _gather_kernel(idx_ref, corpus_ref, out_ref, sems):
    b = pl.program_id(0)

    def get_dma(i):
        r = idx_ref[b * ROWS_PER_BLOCK + i]
        return pltpu.make_async_copy(
            corpus_ref.at[r], out_ref.at[i], sems.at[i % NBUF]
        )

    def body(i, _):
        get_dma(i).start()

        @pl.when(i >= NBUF)
        def _():
            get_dma(i - NBUF).wait()

        return 0

    jax.lax.fori_loop(0, ROWS_PER_BLOCK, body, 0)

    def drain(i, _):
        get_dma(ROWS_PER_BLOCK - NBUF + i).wait()
        return 0

    jax.lax.fori_loop(0, NBUF, drain, 0)


@functools.partial(jax.jit, static_argnames=())
def dma_gather(idx, corpus):
    r = idx.shape[0]
    d = corpus.shape[1]
    # indices ride in as per-block VMEM inputs (the full index array blew
    # the 1MB SMEM scalar-prefetch budget at 1.5M rows)
    return pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((r, d), corpus.dtype),
        grid=(r // ROWS_PER_BLOCK,),
        in_specs=[
            pl.BlockSpec((ROWS_PER_BLOCK,), lambda b: (b,)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((ROWS_PER_BLOCK, d), lambda b: (b, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NBUF,))],
    )(idx, corpus)


def bench(fn, *args, tag):
    out = fn(*args)
    _ = np.asarray(out[-1, :1])
    best = float("inf")
    for _i in range(5):
        t0 = time.time()
        out = fn(*args)
        _ = np.asarray(out[-1, :1])
        best = min(best, time.time() - t0)
    rows = out.shape[0]
    print(
        f"{tag:<28} {best*1e3:>8.2f} ms  {best/rows*1e9:>6.1f} ns/row  "
        f"{rows*out.shape[1]*4/best/1e9:>6.1f} GB/s",
        flush=True,
    )
    return out


def main():
    n, d = 100_000, 128
    r = 1_572_864  # 8192 queries * 4 beam * 48 neighbors
    key = jax.random.PRNGKey(0)
    corpus = jax.random.normal(key, (n, d), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (r,), 0, n, jnp.int32)

    take = jax.jit(lambda i, c: jnp.take(c, i, axis=0))
    ref = bench(take, idx, corpus, tag="jnp.take")
    got = bench(dma_gather, idx, corpus, tag="pallas DMA pipeline")
    ok = bool(jnp.array_equal(ref[:4096], got[:4096]))
    print("results equal:", ok, flush=True)


if __name__ == "__main__":
    main()
