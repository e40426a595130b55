"""Pallas TPU kernel: fused pairwise-distance scan with in-kernel bin-min.

The flat-scan engines are reduce-bound, not matmul-bound: scoring 1M x 128
against 2048 queries costs ~16ms of MXU time at bf16 but ~110ms end-to-end
when the [Q, C] distance matrix is materialized to HBM and reduced by
top_k / approx_min_k (measured, scripts/scan_study.py).  This kernel keeps
the matrix in VMEM and reduces each [TQ, TC] tile to 128 *bin minima* before
anything is written:

* the tile reshapes to ``[TQ, TC/128, 128]`` — free on TPU (the lane
  dimension is preserved) — and a min over the middle axis yields one
  minimum per *congruence class* ``col % 128``;
* the written output is 1/(TC/128) the size of the distance matrix, so HBM
  traffic collapses, and the host-side top-k runs on the reduced matrix.

A true neighbor is lost only when a strictly closer corpus row shares both
its tile and its ``col % 128`` class — for random corpora that's a
``group_size/C`` collision per candidate pair, recovered by the oversample +
exact rerank of the callers (same scheme as ``approx_min_k`` + rerank).

No reference analogue (CPU flat scan has no reduce problem at 4.6k
evals/core; /root/reference has no flat-scan engine at all).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from parallel_hnsw_tpu.ops.distance import Metric

LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _scan_kernel(
    x_ref, y_ref, w_ref, outd_ref, outi_ref, *, metric: Metric, exact: bool,
    tile_c: int
):
    """One ``[TQ, TC]`` tile: dot on the MXU, then reduce a *monotone
    surrogate* ``t`` and apply the metric's epilogue only to the 128 bin
    minima — the per-element VPU work is a single fused ``w - s*dots``.

    ``w`` is a per-corpus-column additive slab precomputed by the wrapper:
    the corpus norms for L2 metrics (saving a per-query-tile recompute)
    plus ``+inf`` on padding columns (replacing a per-tile iota + compare +
    select over the full ``[TQ, TC]`` tile)."""
    x = x_ref[:]  # [TQ, D]
    y = y_ref[:]  # [TC, D]
    w = w_ref[:]  # [1, TC] f32
    dots = jax.lax.dot_general(
        x,
        y,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST if exact else jax.lax.Precision.DEFAULT,
    )
    l2 = metric in (Metric.EUCLIDEAN, Metric.SQUARED_EUCLIDEAN)
    t = w - (2.0 if l2 else 1.0) * dots

    tq = t.shape[0]
    groups = tile_c // LANES
    t3 = t.reshape(tq, groups, LANES)  # col = g * 128 + lane (row-major)
    bin_t = jnp.min(t3, axis=1)  # [TQ, 128]
    g_idx = jnp.argmin(t3, axis=1).astype(jnp.int32)  # [TQ, 128]

    # epilogue: monotone map from the surrogate to the true distance,
    # applied to 1/groups of the elements
    if metric is Metric.COSINE:
        bin_d = 1.0 + bin_t
    elif metric is Metric.NORMALIZED_COSINE:
        bin_d = 0.5 + 0.5 * bin_t
    elif metric is Metric.DOT:
        bin_d = bin_t
    else:
        xf = x.astype(jnp.float32)
        x2 = jnp.sum(xf * xf, axis=-1, keepdims=True)
        bin_d = jnp.maximum(x2 + bin_t, 0.0)
        if metric is Metric.EUCLIDEAN:
            bin_d = jnp.sqrt(bin_d)

    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, LANES), 1)
    col_base = pl.program_id(0) * tile_c
    outd_ref[:] = bin_d
    outi_ref[:] = col_base + g_idx * LANES + lane


@functools.partial(
    jax.jit, static_argnames=("metric", "tile_q", "tile_c", "interpret", "exact")
)
def pallas_binned_scan(
    x: jax.Array,
    y: jax.Array,
    metric: Metric,
    tile_q: int = 256,
    tile_c: int = 2048,
    interpret: bool = False,
    exact: bool = False,
):
    """``[Q, D] x [C, D] -> (bin_d, bin_cols)`` of shape ``[Q, C//(TC/128)*?]``.

    Each output column j holds the minimum distance (and its corpus column)
    among the tile-j//128 columns congruent to j%128 — a ``TC/128``-to-1
    reduction fused into the distance tile.  Reduced width =
    ``ceil(C/TC) * 128``.

    The grid runs corpus tiles on the OUTER axis: the corpus block index is
    constant across the inner query sweep, so Pallas's pipeline fetches each
    corpus tile from HBM exactly once (queries, 100-1000x smaller, are the
    re-streamed operand).  Corpus norms for L2 metrics and the +inf padding
    bias enter as one per-column f32 slab ``w`` instead of per-tile
    recomputes (see ``_scan_kernel``).
    """
    metric = Metric(metric)
    q, d_ = x.shape
    c, _ = y.shape
    qp = _round_up(q, tile_q)
    cp = _round_up(c, tile_c)
    if qp != q:
        x = jnp.concatenate([x, jnp.zeros((qp - q, d_), x.dtype)])
    if cp != c:
        y = jnp.concatenate([y, jnp.zeros((cp - c, d_), y.dtype)])
    n_c_tiles = cp // tile_c

    if metric in (Metric.EUCLIDEAN, Metric.SQUARED_EUCLIDEAN):
        yf = y.astype(jnp.float32)
        w = jnp.sum(yf * yf, axis=-1)
    else:
        w = jnp.zeros((cp,), jnp.float32)
    if cp != c:
        w = jnp.where(jnp.arange(cp) < c, w, jnp.inf)
    w = w[None, :]

    outd, outi = pl.pallas_call(
        functools.partial(_scan_kernel, metric=metric, exact=exact, tile_c=tile_c),
        out_shape=(
            jax.ShapeDtypeStruct((qp, n_c_tiles * LANES), jnp.float32),
            jax.ShapeDtypeStruct((qp, n_c_tiles * LANES), jnp.int32),
        ),
        grid=(n_c_tiles, qp // tile_q),
        in_specs=[
            pl.BlockSpec((tile_q, d_), lambda j, i: (i, 0)),
            pl.BlockSpec((tile_c, d_), lambda j, i: (j, 0)),
            pl.BlockSpec((1, tile_c), lambda j, i: (0, j)),
        ],
        out_specs=(
            pl.BlockSpec((tile_q, LANES), lambda j, i: (i, j)),
            pl.BlockSpec((tile_q, LANES), lambda j, i: (i, j)),
        ),
        interpret=interpret,
    )(x, y, w)
    return outd[:q], outi[:q]


def _folded_kernel(
    x_ref, y_ref, w_ref, outd_ref, outi_ref, *, metric: Metric, exact: bool,
    tile_c: int, n_jj: int
):
    """Accumulating variant of ``_scan_kernel``: the ``[TQ, 128]`` output
    block is indexed by (query tile, slot) and the corpus-chunk grid axis is
    innermost, so the block stays VMEM-resident across its ``n_jj`` corpus
    tiles and min-folds in place — the classic Pallas accumulate pattern.
    Written output is ``[Q, n_slots*128]`` regardless of corpus size."""
    x = x_ref[:]  # [TQ, D]
    y = y_ref[:]  # [TC, D]
    w = w_ref[:]  # [1, TC] f32
    dots = jax.lax.dot_general(
        x,
        y,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST if exact else jax.lax.Precision.DEFAULT,
    )
    l2 = metric in (Metric.EUCLIDEAN, Metric.SQUARED_EUCLIDEAN)
    t = w - (2.0 if l2 else 1.0) * dots

    tq = t.shape[0]
    groups = tile_c // LANES
    t3 = t.reshape(tq, groups, LANES)
    bin_t = jnp.min(t3, axis=1)  # [TQ, 128] surrogate minima
    g_idx = jnp.argmin(t3, axis=1).astype(jnp.int32)

    s = pl.program_id(1)
    jj = pl.program_id(2)
    col_base = (s * n_jj + jj) * tile_c
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, LANES), 1)
    idx = col_base + g_idx * LANES + lane

    @pl.when(jj == 0)
    def _init():
        outd_ref[:] = bin_t
        outi_ref[:] = idx

    @pl.when(jj != 0)
    def _fold():
        prev = outd_ref[:]
        better = bin_t < prev
        outd_ref[:] = jnp.where(better, bin_t, prev)
        outi_ref[:] = jnp.where(better, idx, outi_ref[:])


@functools.partial(
    jax.jit,
    static_argnames=("metric", "tile_q", "tile_c", "n_slots", "interpret", "exact"),
)
def pallas_folded_scan(
    x: jax.Array,
    y: jax.Array,
    metric: Metric,
    tile_q: int = 256,
    tile_c: int = 2048,
    n_slots: int = 16,
    interpret: bool = False,
    exact: bool = False,
):
    """``[Q, D] x [C, D] -> (bin_d, bin_cols)`` of shape ``[Q, n_slots*128]``.

    Like ``pallas_binned_scan`` but the cross-tile reduction folds INSIDE
    the kernel: output column ``s*128 + l`` holds the min over every corpus
    column with ``(col // tile_c) % 1 ... `` — precisely, corpus tile
    ``t = s*n_jj + jj`` contributes to slot ``s`` — so HBM output traffic
    and the caller's top-k shrink from ``O(C/tile_c * 128)`` to a fixed
    ``n_slots * 128`` columns.  Accumulated in surrogate space; the metric
    epilogue is applied on the reduced slab outside the kernel (monotone,
    so ordering is unchanged).
    """
    metric = Metric(metric)
    q, d_ = x.shape
    c, _ = y.shape
    qp = _round_up(q, tile_q)
    n_c_tiles = max(1, (c + tile_c - 1) // tile_c)
    n_slots = min(n_slots, n_c_tiles)
    n_jj = (n_c_tiles + n_slots - 1) // n_slots
    cp = n_slots * n_jj * tile_c
    if qp != q:
        x = jnp.concatenate([x, jnp.zeros((qp - q, d_), x.dtype)])
    if cp != c:
        y = jnp.concatenate([y, jnp.zeros((cp - c, d_), y.dtype)])

    if metric in (Metric.EUCLIDEAN, Metric.SQUARED_EUCLIDEAN):
        yf = y.astype(jnp.float32)
        w = jnp.sum(yf * yf, axis=-1)
    else:
        w = jnp.zeros((cp,), jnp.float32)
    if cp != c:
        w = jnp.where(jnp.arange(cp) < c, w, jnp.inf)
    w = w[None, :]

    outt, outi = pl.pallas_call(
        functools.partial(
            _folded_kernel, metric=metric, exact=exact, tile_c=tile_c, n_jj=n_jj
        ),
        out_shape=(
            jax.ShapeDtypeStruct((qp, n_slots * LANES), jnp.float32),
            jax.ShapeDtypeStruct((qp, n_slots * LANES), jnp.int32),
        ),
        grid=(qp // tile_q, n_slots, n_jj),
        in_specs=[
            pl.BlockSpec((tile_q, d_), lambda i, s, jj: (i, 0)),
            pl.BlockSpec((tile_c, d_), lambda i, s, jj: (s * n_jj + jj, 0)),
            pl.BlockSpec((1, tile_c), lambda i, s, jj: (0, s * n_jj + jj)),
        ],
        out_specs=(
            pl.BlockSpec((tile_q, LANES), lambda i, s, jj: (i, s)),
            pl.BlockSpec((tile_q, LANES), lambda i, s, jj: (i, s)),
        ),
        interpret=interpret,
    )(x, y, w)
    outt = outt[:q]
    # monotone epilogue on the reduced slab (cheap: n_slots*128 wide)
    if metric is Metric.COSINE:
        outd = 1.0 + outt
    elif metric is Metric.NORMALIZED_COSINE:
        outd = 0.5 + 0.5 * outt
    elif metric is Metric.DOT:
        outd = outt
    else:
        xf = x[:q].astype(jnp.float32)
        x2 = jnp.sum(xf * xf, axis=-1, keepdims=True)
        outd = jnp.maximum(x2 + outt, 0.0)
        if metric is Metric.EUCLIDEAN:
            outd = jnp.sqrt(outd)
    # padding slots (all-inf surrogate) stay +inf through every epilogue
    outd = jnp.where(jnp.isinf(outt), jnp.inf, outd)
    return outd, outi[:q]


def xla_folded_scan(
    x: jax.Array,
    y: jax.Array,
    metric: Metric,
    tile_c: int = 2048,
    n_slots: int = 16,
    exact: bool = False,
):
    """XLA twin of ``pallas_folded_scan`` with identical fold semantics."""
    bin_d, cols = xla_binned_scan(x, y, metric, tile_c=tile_c, exact=exact)
    q = x.shape[0]
    n_c_tiles = bin_d.shape[1] // LANES
    n_slots = min(n_slots, n_c_tiles)
    n_jj = (n_c_tiles + n_slots - 1) // n_slots
    pad_tiles = n_slots * n_jj - n_c_tiles
    if pad_tiles:
        bin_d = jnp.concatenate(
            [bin_d, jnp.full((q, pad_tiles * LANES), jnp.inf, jnp.float32)], axis=1
        )
        cols = jnp.concatenate(
            [cols, jnp.zeros((q, pad_tiles * LANES), jnp.int32)], axis=1
        )
    d4 = bin_d.reshape(q, n_slots, n_jj, LANES)
    c4 = cols.reshape(q, n_slots, n_jj, LANES)
    jj_best = jnp.argmin(d4, axis=2)
    out_d = jnp.take_along_axis(d4, jj_best[:, :, None, :], axis=2)[:, :, 0, :]
    out_i = jnp.take_along_axis(c4, jj_best[:, :, None, :], axis=2)[:, :, 0, :]
    return out_d.reshape(q, -1), out_i.reshape(q, -1)


def xla_binned_scan(
    x: jax.Array, y: jax.Array, metric: Metric, tile_c: int = 2048,
    exact: bool = False,
):
    """XLA reference/fallback with identical binning semantics (CPU tests)."""
    from parallel_hnsw_tpu.ops.distance import pairwise_distance

    q, _ = x.shape
    c, _ = y.shape
    cp = _round_up(c, tile_c)
    d = pairwise_distance(x, y, metric, exact=exact)
    if cp != c:
        d = jnp.concatenate(
            [d, jnp.full((q, cp - c), jnp.inf, jnp.float32)], axis=-1
        )
    n_tiles = cp // tile_c
    groups = tile_c // LANES
    d4 = d.reshape(q, n_tiles, groups, LANES)
    bin_d = jnp.min(d4, axis=2)  # [Q, n_tiles, 128]
    g_idx = jnp.argmin(d4, axis=2).astype(jnp.int32)
    lane = jnp.arange(LANES, dtype=jnp.int32)[None, None, :]
    tile_base = (jnp.arange(n_tiles, dtype=jnp.int32) * tile_c)[None, :, None]
    cols = tile_base + g_idx * LANES + lane
    return bin_d.reshape(q, -1), cols.reshape(q, -1)


def clamp_tile_c(tile_c: int, d: int, itemsize: int = 4) -> int:
    """Bound the corpus tile so the double-buffered VMEM working set
    (corpus tile dominates: tile_c * d * itemsize * 2) stays under ~10MB.
    D=768 at tile_c=4096 blew the 16MB scoped-vmem limit by 8.5MB."""
    cap = max(256, (10 << 20) // (d * 2 * itemsize) // LANES * LANES)
    return max(LANES, min(tile_c, cap))


def binned_scan(
    x, y, metric, tile_c: int = 2048, exact: bool = False, tile_q: int = 0
):
    """Dispatch: Pallas kernel on TPU, XLA fallback elsewhere.  ``tile_c``
    is clamped by vector width so the kernel fits VMEM; both backends use
    the clamped value (identical binning semantics).

    The kernel grid holds each corpus tile resident across the inner query
    sweep (corpus fetched from HBM once per scan); fast mode additionally
    casts inputs to bf16 — halved VMEM footprint and DMA, with the callers'
    exact rerank restoring ordering.  ``tile_q`` 0 = auto (256: the [TQ, TC]
    f32 surrogate tile and its reduce temporaries dominate VMEM; 512 blows
    the scoped-vmem budget at TC=4096 and serializes, measured 3x slower)."""
    if not exact:
        x = x.astype(jnp.bfloat16)
        y = y.astype(jnp.bfloat16)
    itemsize = 2 if not exact else 4
    tile_c = clamp_tile_c(tile_c, x.shape[-1], itemsize)
    if tile_q <= 0:
        tile_q = 256
    platform = None
    try:
        devs = getattr(x, "devices", None)
        if callable(devs):
            platform = next(iter(x.devices())).platform
    except Exception:
        platform = None
    if platform is None:
        dd = jax.config.jax_default_device
        platform = dd.platform if dd is not None else jax.default_backend()
    if platform in ("tpu", "axon"):
        return pallas_binned_scan(
            x, y, metric, tile_q=tile_q, tile_c=tile_c, exact=exact
        )
    return xla_binned_scan(x, y, metric, tile_c=tile_c, exact=exact)


def folded_scan(
    x,
    y,
    metric,
    tile_c: int = 2048,
    n_slots: int = 32,
    exact: bool = False,
    tile_q: int = 0,
):
    """Dispatch for the accumulating kernel (``pallas_folded_scan`` on TPU,
    XLA twin elsewhere), mirroring ``binned_scan``'s bf16 fast mode and
    VMEM-aware tile clamp.  Output is ``[Q, n_slots*128]`` — the caller's
    top-k input no longer grows with the corpus."""
    if not exact:
        x = x.astype(jnp.bfloat16)
        y = y.astype(jnp.bfloat16)
    itemsize = 2 if not exact else 4
    tile_c = clamp_tile_c(tile_c, x.shape[-1], itemsize)
    if tile_q <= 0:
        tile_q = 256
    platform = None
    try:
        devs = getattr(x, "devices", None)
        if callable(devs):
            platform = next(iter(x.devices())).platform
    except Exception:
        platform = None
    if platform is None:
        dd = jax.config.jax_default_device
        platform = dd.platform if dd is not None else jax.default_backend()
    if platform in ("tpu", "axon"):
        return pallas_folded_scan(
            x, y, metric, tile_q=tile_q, tile_c=tile_c, n_slots=n_slots,
            exact=exact,
        )
    return xla_folded_scan(x, y, metric, tile_c=tile_c, n_slots=n_slots, exact=exact)
