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
    x_ref, y_ref, outd_ref, outi_ref, *, metric: Metric, exact: bool,
    tile_c: int, n_real_cols: int
):
    x = x_ref[:]  # [TQ, D]
    y = y_ref[:]  # [TC, D]
    dots = jax.lax.dot_general(
        x,
        y,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST if exact else jax.lax.Precision.DEFAULT,
    )
    if metric is Metric.COSINE:
        d = 1.0 - dots
    elif metric is Metric.NORMALIZED_COSINE:
        d = (1.0 - dots) / 2.0
    elif metric is Metric.DOT:
        d = -dots
    else:
        x2 = jnp.sum(x * x, axis=-1, keepdims=True)
        y2 = jnp.sum(y * y, axis=-1)[None, :]
        d = jnp.maximum(x2 + y2 - 2.0 * dots, 0.0)
        if metric is Metric.EUCLIDEAN:
            d = jnp.sqrt(d)

    tq = d.shape[0]
    groups = tile_c // LANES
    col_base = pl.program_id(1) * tile_c
    # mask padding columns so they can't shadow a real column's bin
    cols = col_base + jax.lax.broadcasted_iota(jnp.int32, (tq, tile_c), 1)
    d = jnp.where(cols < n_real_cols, d, jnp.inf)

    d3 = d.reshape(tq, groups, LANES)  # col = g * 128 + lane (row-major)
    bin_d = jnp.min(d3, axis=1)  # [TQ, 128]
    g_idx = jnp.argmin(d3, axis=1).astype(jnp.int32)  # [TQ, 128]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, LANES), 1)
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

    outd, outi = pl.pallas_call(
        functools.partial(
            _scan_kernel, metric=metric, exact=exact, tile_c=tile_c, n_real_cols=c
        ),
        out_shape=(
            jax.ShapeDtypeStruct((qp, n_c_tiles * LANES), jnp.float32),
            jax.ShapeDtypeStruct((qp, n_c_tiles * LANES), jnp.int32),
        ),
        grid=(qp // tile_q, n_c_tiles),
        in_specs=[
            pl.BlockSpec((tile_q, d_), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_c, d_), lambda i, j: (j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((tile_q, LANES), lambda i, j: (i, j)),
            pl.BlockSpec((tile_q, LANES), lambda i, j: (i, j)),
        ),
        interpret=interpret,
    )(x, y)
    return outd[:q], outi[:q]


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


def clamp_tile_c(tile_c: int, d: int) -> int:
    """Bound the corpus tile so the double-buffered VMEM working set
    (corpus tile dominates: tile_c * d * 4B * 2) stays under ~10MB.
    D=768 at tile_c=4096 blew the 16MB scoped-vmem limit by 8.5MB."""
    cap = max(256, (10 << 20) // (d * 8) // LANES * LANES)
    return max(LANES, min(tile_c, cap))


def binned_scan(x, y, metric, tile_c: int = 2048, exact: bool = False):
    """Dispatch: Pallas kernel on TPU, XLA fallback elsewhere.  ``tile_c``
    is clamped by vector width so the kernel fits VMEM; both backends use
    the clamped value (identical binning semantics)."""
    tile_c = clamp_tile_c(tile_c, x.shape[-1])
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
        return pallas_binned_scan(x, y, metric, tile_c=tile_c, exact=exact)
    return xla_binned_scan(x, y, metric, tile_c=tile_c, exact=exact)
