"""Pallas pairwise-distance kernel semantics (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from parallel_hnsw_tpu.ops.distance import Metric, pairwise_distance
from parallel_hnsw_tpu.ops.pallas_distance import pallas_pairwise_distance

RNG = np.random.default_rng(3)


@pytest.mark.parametrize(
    "metric",
    [Metric.COSINE, Metric.NORMALIZED_COSINE, Metric.EUCLIDEAN, Metric.SQUARED_EUCLIDEAN, Metric.DOT],
)
def test_kernel_matches_xla(metric):
    x = jnp.asarray(RNG.normal(size=(70, 32)).astype(np.float32))
    y = jnp.asarray(RNG.normal(size=(130, 32)).astype(np.float32))
    got = pallas_pairwise_distance(x, y, metric, tile_q=64, tile_c=128, interpret=True)
    want = pairwise_distance(x, y, metric)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_kernel_unaligned_shapes():
    x = jnp.asarray(RNG.normal(size=(1, 7)).astype(np.float32))
    y = jnp.asarray(RNG.normal(size=(3, 7)).astype(np.float32))
    got = pallas_pairwise_distance(x, y, Metric.EUCLIDEAN, tile_q=8, tile_c=128, interpret=True)
    want = pairwise_distance(x, y, Metric.EUCLIDEAN)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
