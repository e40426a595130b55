"""Synthetic corpus generation (reference: src/bigvec.rs:9-65).

The reference generates per-vector seeded random unit vectors
(``StdRng::seed_from_u64(42 + i)``, src/bigvec.rs:26) with a normalized-cosine
comparator.  Here the corpus is one jitted ``jax.random`` program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from parallel_hnsw_tpu.graph import DenseSource


def random_unit_corpus(count: int, dim: int, seed: int = 42) -> DenseSource:
    """Uniform[-1,1) vectors normalized to unit length (src/bigvec.rs:59-65)."""
    key = jax.random.PRNGKey(seed)
    x = jax.random.uniform(key, (count, dim), minval=-1.0, maxval=1.0)
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    return DenseSource(vectors=x.astype(jnp.float32))


def random_corpus(count: int, dim: int, seed: int = 42) -> DenseSource:
    """Unnormalized Uniform[-1,1) vectors (reference: random_vec,
    src/lib.rs:2443-2447, used by the euclidean test)."""
    key = jax.random.PRNGKey(seed)
    x = jax.random.uniform(key, (count, dim), minval=-1.0, maxval=1.0)
    return DenseSource(vectors=x.astype(jnp.float32))


def make_random_hnsw(count: int, dim: int, seed: int = 42, bp=None, **kw):
    """Convenience mirroring the reference's bigvec::make_random_hnsw
    (src/bigvec.rs:9-36): seeded random unit corpus + normalized-cosine build."""
    from parallel_hnsw_tpu.index import Hnsw
    from parallel_hnsw_tpu.ops.distance import Metric
    from parallel_hnsw_tpu.params import BuildParams

    source = random_unit_corpus(count, dim, seed)
    return Hnsw.generate(source, None, bp or BuildParams(), Metric.NORMALIZED_COSINE, **kw)
