"""Property tests: bitonic fast merge == reference-semantics sort merge."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallel_hnsw_tpu.constants import EMPTY_DIST, EMPTY_ID
from parallel_hnsw_tpu.ops.bitonic import (
    bitonic_merge,
    compact_valid,
    merge_sorted_with_new,
)
from parallel_hnsw_tpu.ops.queues import merge_queue_with_flags, sort_queue

RNG = np.random.default_rng(7)


# For a fixed query an id always maps to one distance (distance is a function
# of the candidate vector), so the generators derive dist deterministically
# from id.  Some ids share a distance to exercise equal-priority tie handling.


def _dist_of(ids):
    return ((ids % 97).astype(np.float32) + 1.0) / 100.0


def random_queue(batch, cap, fill_frac=0.7, id_range=1000):
    n_fill = int(cap * fill_frac)
    ids = np.full((batch, cap), EMPTY_ID, np.int32)
    dists = np.full((batch, cap), EMPTY_DIST, np.float32)
    for b in range(batch):
        sel = RNG.choice(id_range, n_fill, replace=False).astype(np.int32)
        d = _dist_of(sel)
        order = np.lexsort((sel, d))
        ids[b, :n_fill] = sel[order]
        dists[b, :n_fill] = d[order]
    return jnp.asarray(ids), jnp.asarray(dists)


def random_new(batch, c, id_range=1000, dup_from=None, empty_frac=0.2):
    ids = RNG.integers(0, id_range, (batch, c)).astype(np.int32)
    dists = _dist_of(ids)
    mask = RNG.random((batch, c)) < empty_frac
    ids[mask] = EMPTY_ID
    dists[mask] = EMPTY_DIST
    return jnp.asarray(ids), jnp.asarray(dists)


@pytest.mark.parametrize("cap,c", [(8, 4), (300, 192), (31, 17), (64, 64)])
def test_fast_merge_matches_reference_semantics(cap, c):
    batch = 16
    ids, dists = random_queue(batch, cap)
    flags = jnp.asarray(
        (np.asarray(ids) != EMPTY_ID) & (RNG.random((batch, cap)) < 0.5), jnp.int32
    )
    new_ids, new_dists = random_new(batch, c)

    got = merge_sorted_with_new(ids, dists, flags, new_ids, new_dists)
    want = merge_queue_with_flags(ids, dists, flags, new_ids, new_dists)

    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]), err_msg="ids")
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]), err_msg="dists")
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(want[2]), err_msg="flags")
    np.testing.assert_array_equal(np.asarray(got[3]), np.asarray(want[3]), err_msg="changed")


def test_bitonic_merge_sorts_bitonic_input():
    asc = np.sort(RNG.random((4, 16)).astype(np.float32), axis=-1)
    desc = np.sort(RNG.random((4, 16)).astype(np.float32), axis=-1)[:, ::-1]
    d = jnp.asarray(np.concatenate([asc, desc], -1))
    i = jnp.asarray(RNG.integers(0, 100, (4, 32)), jnp.int32)
    md, mi = bitonic_merge(d, i)
    np.testing.assert_array_equal(np.asarray(md), np.sort(np.asarray(d), axis=-1))


def test_compact_valid_stable():
    ids = jnp.asarray([[5, EMPTY_ID, 3, EMPTY_ID, 7]], jnp.int32)
    dists = jnp.asarray([[0.5, EMPTY_DIST, 0.3, EMPTY_DIST, 0.7]], jnp.float32)
    cd, ci = compact_valid(dists, ids)
    np.testing.assert_array_equal(np.asarray(ci)[0], [5, 3, 7, EMPTY_ID, EMPTY_ID])
    np.testing.assert_allclose(np.asarray(cd)[0][:3], [0.5, 0.3, 0.7])
