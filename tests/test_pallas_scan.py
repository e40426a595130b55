"""Fused binned-scan kernel: binning semantics + backend equivalence."""

import jax.numpy as jnp
import numpy as np
import pytest

from parallel_hnsw_tpu.ops.distance import Metric, pairwise_distance
from parallel_hnsw_tpu.ops.pallas_scan import (
    LANES,
    pallas_binned_scan,
    xla_binned_scan,
)

RNG = np.random.default_rng(3)


def _unit(n, d):
    x = RNG.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _numpy_binned(d, tile_c):
    q, c = d.shape
    cp = ((c + tile_c - 1) // tile_c) * tile_c
    if cp != c:
        d = np.concatenate([d, np.full((q, cp - c), np.inf, np.float32)], axis=-1)
    n_tiles = cp // tile_c
    groups = tile_c // LANES
    d4 = d.reshape(q, n_tiles, groups, LANES)
    bin_d = d4.min(axis=2)
    g = d4.argmin(axis=2)
    lane = np.arange(LANES)[None, None, :]
    base = (np.arange(n_tiles) * tile_c)[None, :, None]
    cols = base + g * LANES + lane
    return bin_d.reshape(q, -1), cols.reshape(q, -1)


@pytest.mark.parametrize("c", [512, 700])
def test_xla_binned_scan_matches_numpy(c):
    x = jnp.asarray(_unit(24, 16))
    y = jnp.asarray(_unit(c, 16))
    d = np.asarray(pairwise_distance(x, y, Metric.EUCLIDEAN))
    want_d, want_c = _numpy_binned(d, 256)
    got_d, got_c = xla_binned_scan(x, y, Metric.EUCLIDEAN, tile_c=256, exact=True)
    np.testing.assert_allclose(np.asarray(got_d), want_d, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_c), want_c)
    # every reported column's distance matches the full matrix
    qq, bb = np.nonzero(np.isfinite(np.asarray(got_d)))
    np.testing.assert_allclose(
        np.asarray(got_d)[qq, bb], d[qq, np.asarray(got_c)[qq, bb]], atol=1e-6
    )


def test_pallas_interpret_matches_xla():
    x = jnp.asarray(_unit(16, 8))
    y = jnp.asarray(_unit(300, 8))
    for metric in (Metric.COSINE, Metric.EUCLIDEAN):
        ref_d, ref_c = xla_binned_scan(x, y, metric, tile_c=256, exact=True)
        got_d, got_c = pallas_binned_scan(
            x, y, metric, tile_q=8, tile_c=256, interpret=True, exact=True
        )
        np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref_d), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got_c), np.asarray(ref_c))


def test_folded_scan_interpret_matches_xla_fold():
    """The accumulating kernel's slot minima == the XLA fold over per-tile
    bins, including the non-divisible tail (padding slots stay +inf)."""
    from parallel_hnsw_tpu.ops.pallas_scan import (
        pallas_folded_scan,
        xla_folded_scan,
    )

    x = jnp.asarray(_unit(16, 8))
    y = jnp.asarray(_unit(1500, 8))  # 6 tiles of 256 -> n_slots=4 needs pad
    for metric in (Metric.COSINE, Metric.EUCLIDEAN, Metric.DOT):
        ref_d, ref_c = xla_folded_scan(
            x, y, metric, tile_c=256, n_slots=4, exact=True
        )
        got_d, got_c = pallas_folded_scan(
            x, y, metric, tile_q=8, tile_c=256, n_slots=4, interpret=True,
            exact=True,
        )
        rd, gd = np.asarray(ref_d), np.asarray(got_d)
        np.testing.assert_allclose(gd, rd, atol=1e-5)
        fin = np.isfinite(rd)
        np.testing.assert_array_equal(
            np.asarray(got_c)[fin], np.asarray(ref_c)[fin]
        )


def test_folded_scan_true_neighbors_survive():
    """Every query's true nearest neighbor appears in its folded slab (it is
    the min of whatever slot its column folds into)."""
    from parallel_hnsw_tpu.ops.pallas_scan import pallas_folded_scan

    x = jnp.asarray(_unit(24, 16))
    y = jnp.asarray(_unit(3000, 16))
    gt = np.asarray(
        jnp.argmin(pairwise_distance(x, y, Metric.EUCLIDEAN), axis=-1)
    )
    _, cols = pallas_folded_scan(
        x, y, Metric.EUCLIDEAN, tile_q=8, tile_c=256, n_slots=8,
        interpret=True, exact=True,
    )
    cols = np.asarray(cols)
    assert all(gt[i] in cols[i] for i in range(24))


def test_binned_topk_with_rerank_reaches_full_recall():
    """bins + oversampled exact rerank recover the true top-k (statistical:
    oversample covers the rare congruence-class collisions)."""
    import jax

    from parallel_hnsw_tpu.ops.distance import batched_distance

    x = jnp.asarray(_unit(32, 16))
    y = jnp.asarray(_unit(2000, 16))
    k, oversample = 5, 8
    gt = np.asarray(
        jnp.argsort(pairwise_distance(x, y, Metric.EUCLIDEAN), axis=-1)[:, :k]
    )
    bin_d, bin_c = xla_binned_scan(x, y, Metric.EUCLIDEAN, tile_c=256, exact=True)
    _, pos = jax.lax.top_k(-bin_d, k * oversample)
    cand = jnp.take_along_axis(bin_c, pos, axis=-1)
    d = batched_distance(x, jnp.take(y, cand, axis=0), Metric.EUCLIDEAN)
    d, cand = jax.lax.sort((d, cand), num_keys=2)
    got = np.asarray(cand[:, :k])
    recall = np.mean([len(np.intersect1d(got[i], gt[i])) for i in range(32)]) / k
    assert recall >= 0.99, recall


def test_xla_folded_scan_matches_numpy_fold():
    """xla_folded_scan == a straight numpy fold over per-tile bins."""
    from parallel_hnsw_tpu.ops.pallas_scan import xla_folded_scan

    x = jnp.asarray(_unit(12, 8))
    y = jnp.asarray(_unit(900, 8))  # 4 tiles of 256 (padded), n_slots=2
    d = np.asarray(pairwise_distance(x, y, Metric.EUCLIDEAN))
    bin_d, cols = _numpy_binned(d, 256)
    n_tiles = bin_d.shape[1] // LANES
    n_slots, n_jj = 2, 2
    d4 = bin_d.reshape(12, n_slots, n_jj, LANES)
    c4 = cols.reshape(12, n_slots, n_jj, LANES)
    jj = d4.argmin(axis=2)
    want_d = np.take_along_axis(d4, jj[:, :, None, :], axis=2)[:, :, 0, :].reshape(12, -1)
    want_c = np.take_along_axis(c4, jj[:, :, None, :], axis=2)[:, :, 0, :].reshape(12, -1)
    got_d, got_c = xla_folded_scan(x, y, Metric.EUCLIDEAN, tile_c=256, n_slots=2, exact=True)
    np.testing.assert_allclose(np.asarray(got_d), want_d, atol=1e-6)
    fin = np.isfinite(want_d)
    np.testing.assert_array_equal(np.asarray(got_c)[fin], want_c[fin])
