"""Bitonic merge primitives for sorted candidate queues.

``jax.lax.sort`` on TPU lowers to a full bitonic sorting network —
O(log² n) compare-exchange stages.  But the beam-search queue is *already
sorted* at every hop; only the freshly scored candidate block is unsorted.
Sorting just the new block (narrow) and then running a single bitonic *merge*
(log₂ n stages) against the queue cuts the dominant per-hop cost several-fold.

All ops operate on the last axis with arbitrary leading batch dims, ordering
ascending by ``(dist, id)`` with EMPTY sentinels sorting last.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from parallel_hnsw_tpu.constants import EMPTY_DIST, EMPTY_ID


def _lex_less(d1, i1, d2, i2):
    return (d1 < d2) | ((d1 == d2) & (i1 < i2))


def bitonic_merge(
    dists: jax.Array, ids: jax.Array, *payload: jax.Array
) -> Tuple[jax.Array, ...]:
    """Merge a bitonic sequence (ascending half ++ descending half) of
    power-of-two length into ascending order by ``(dist, id)``.

    log₂(P) compare-exchange stages, each a reshape + select on the VPU.
    """
    p = dists.shape[-1]
    assert p & (p - 1) == 0, f"length {p} not a power of two"
    arrs = (dists, ids) + tuple(payload)
    k = p // 2
    while k >= 1:
        # partner pairs at distance k: reshape [..., p] -> [..., p//(2k), 2, k]
        shaped = [a.reshape(a.shape[:-1] + (p // (2 * k), 2, k)) for a in arrs]
        lo = [s[..., 0, :] for s in shaped]
        hi = [s[..., 1, :] for s in shaped]
        swap = _lex_less(hi[0], hi[1], lo[0], lo[1])  # swap only if hi < lo
        new_lo = [jnp.where(swap, h, l) for l, h in zip(lo, hi)]
        new_hi = [jnp.where(swap, l, h) for l, h in zip(lo, hi)]
        arrs = tuple(
            jnp.stack([nl, nh], axis=-2).reshape(dists.shape)
            for nl, nh in zip(new_lo, new_hi)
        )
        k //= 2
    return arrs


def compact_valid(
    dists: jax.Array, ids: jax.Array, *payload: jax.Array
) -> Tuple[jax.Array, ...]:
    """Stable-compact entries with ``id != EMPTY_ID`` to the front (order
    preserved), EMPTY sentinels to the tail.  One cumsum + one scatter —
    replaces a full re-sort after dedup marking."""
    n = ids.shape[-1]
    valid = ids != EMPTY_ID
    n_valid = jnp.sum(valid, axis=-1, keepdims=True)
    pos_valid = jnp.cumsum(valid, axis=-1) - 1
    pos_invalid = n_valid + jnp.cumsum(~valid, axis=-1) - 1
    pos = jnp.where(valid, pos_valid, pos_invalid)

    out = []
    flat_pos = pos.reshape(-1, n)
    row = jnp.arange(flat_pos.shape[0])[:, None]
    for a, fill in zip(
        (dists, ids) + tuple(payload),
        (EMPTY_DIST, EMPTY_ID) + tuple(0 for _ in payload),
    ):
        flat = a.reshape(-1, n)
        res = jnp.full_like(flat, fill)
        res = res.at[row, flat_pos].set(flat)
        out.append(res.reshape(a.shape))
    return tuple(out)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def merge_sorted_with_new(
    ids: jax.Array,  # [..., cap] sorted queue
    dists: jax.Array,
    flags: jax.Array,  # [..., cap] payload (expanded bits)
    new_ids: jax.Array,  # [..., c] UNSORTED new block
    new_dists: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fast path for ``merge_queue_with_flags``: sort only the new block, one
    bitonic merge, adjacent dedup, cumsum-scatter compaction, truncate.

    Exactly matches merge_queue_with_flags semantics: ascending ``(dist, id)``
    with stable keep-first dedup (queue entries win over new duplicates — the
    queue half is placed first).
    """
    cap = ids.shape[-1]
    c = new_ids.shape[-1]
    p = _next_pow2(cap + c)

    # sort the new block ascending (narrow sort)
    new_d, new_i = jax.lax.sort(
        (new_dists, new_ids), dimension=-1, num_keys=2, is_stable=True
    )
    new_f = jnp.zeros(new_i.shape, flags.dtype)

    # bitonic layout: [queue asc (cap) | peak padding | new desc (c)].
    # Padding sits at the bitonic peak as (inf, EMPTY_ID) — nondecreasing then
    # nonincreasing under the lexicographic (dist, id) order, so one
    # log2(p)-stage merge sorts the whole thing.
    pad = p - cap - c
    def peak_cat(q, n, fill, dtype=None):
        mid = jnp.full(q.shape[:-1] + (pad,), fill, q.dtype if dtype is None else dtype)
        return jnp.concatenate([q, mid, jnp.flip(n, axis=-1)], axis=-1)

    all_d = peak_cat(dists, new_d, EMPTY_DIST)
    all_i = peak_cat(ids, new_i, EMPTY_ID)
    all_f = peak_cat(flags, new_f, 0)
    m_d, m_i, m_f = bitonic_merge(all_d, all_i, all_f)

    # adjacent dedup: among equal (dist, id), keep one copy.  The merge is not
    # stable, but duplicates always carry equal (dist, id), so survivorship
    # only matters for the expanded-flag payload: OR flags across each
    # duplicate run (runs are <= beam_width+1 long) with doubling shifts so an
    # expanded queue entry never loses its bit to a fresh duplicate.
    for shift in (1, 2, 4, 8):
        nxt_i = jnp.concatenate(
            [m_i[..., shift:], jnp.full(m_i.shape[:-1] + (shift,), EMPTY_ID, m_i.dtype)],
            axis=-1,
        )
        nxt_f = jnp.concatenate(
            [m_f[..., shift:], jnp.zeros(m_f.shape[:-1] + (shift,), m_f.dtype)], axis=-1
        )
        same = (m_i == nxt_i) & (m_i != EMPTY_ID)
        m_f = jnp.where(same, m_f | nxt_f, m_f)

    prev_i = jnp.roll(m_i, 1, axis=-1)
    first_col = jnp.zeros(m_i.shape[:-1] + (1,), bool)
    dup = jnp.concatenate(
        [first_col, (m_i[..., 1:] == prev_i[..., 1:]) & (m_i[..., 1:] != EMPTY_ID)],
        axis=-1,
    )
    m_i = jnp.where(dup, EMPTY_ID, m_i)
    m_d = jnp.where(dup, EMPTY_DIST, m_d)

    c_d, c_i, c_f = compact_valid(m_d, m_i, m_f)
    out_i = c_i[..., :cap]
    out_d = c_d[..., :cap]
    out_f = c_f[..., :cap]
    changed = jnp.any(out_i != ids, axis=-1)
    return out_i, out_d, out_f, changed


def _pad(a: jax.Array, width: int, fill) -> jax.Array:
    cur = a.shape[-1]
    if cur == width:
        return a
    pad_shape = a.shape[:-1] + (width - cur,)
    return jnp.concatenate([a, jnp.full(pad_shape, fill, a.dtype)], axis=-1)
