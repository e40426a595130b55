"""Pallas TPU kernel: tiled pairwise distances.

The MXU path for ``[Q, D] x [C, D] -> [Q, C]`` distance blocks — the compute
core of brute-force seeding (top-layer init), k-means assignment, and exact
rerank.  Blocks of queries and corpus rows are staged through VMEM and
contracted on the MXU at fp32 accuracy; the euclidean family fuses the norm
terms into the same tile pass instead of materializing ``||x||^2 + ||y||^2``
matrices in HBM.

Falls back to the XLA implementation on non-TPU platforms (tests run the
kernel in interpreter mode for semantics coverage).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from parallel_hnsw_tpu.ops.distance import Metric, pairwise_distance


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dist_kernel(x_ref, y_ref, out_ref, *, metric: Metric, exact: bool):
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
        out_ref[:] = 1.0 - dots
    elif metric is Metric.NORMALIZED_COSINE:
        out_ref[:] = (1.0 - dots) / 2.0
    elif metric is Metric.DOT:
        out_ref[:] = -dots
    else:
        x2 = jnp.sum(x * x, axis=-1, keepdims=True)
        y2 = jnp.sum(y * y, axis=-1)[None, :]
        sq = jnp.maximum(x2 + y2 - 2.0 * dots, 0.0)
        if metric is Metric.SQUARED_EUCLIDEAN:
            out_ref[:] = sq
        else:
            out_ref[:] = jnp.sqrt(sq)


@functools.partial(
    jax.jit, static_argnames=("metric", "tile_q", "tile_c", "interpret", "exact")
)
def pallas_pairwise_distance(
    x: jax.Array,
    y: jax.Array,
    metric: Metric,
    tile_q: int = 0,
    tile_c: int = 0,
    interpret: bool = False,
    exact: bool = True,
) -> jax.Array:
    """``[Q, D] x [C, D] -> [Q, C]`` distances via a tiled Pallas kernel.

    Inputs are zero-padded up to tile multiples; padding rows produce garbage
    distances that the caller's shape slice drops.  Tile sizes auto-scale with
    D so the double-buffered VMEM working set stays under the ~16MB budget.
    """
    metric = Metric(metric)
    q, d = x.shape
    c, _ = y.shape
    if tile_q <= 0 or tile_c <= 0:
        # VMEM per grid cell ≈ (tile_q + tile_c) * D * 4B * 2 (double buffer)
        # * ~1.6 (euclidean temporaries + pipeline slack), must stay < 16MB.
        rows_budget = max(192, (10 << 20) // (d * 13))
        tq = min(256, max(64, rows_budget // 4))
        tile_q = tile_q or max(64, (tq // 8) * 8)
        tc = min(512, max(128, rows_budget - tile_q))
        tile_c = tile_c or max(128, (tc // 128) * 128)
    qp = _round_up(q, tile_q)
    cp = _round_up(c, tile_c)
    if qp != q:
        x = jnp.concatenate([x, jnp.zeros((qp - q, d), x.dtype)])
    if cp != c:
        y = jnp.concatenate([y, jnp.zeros((cp - c, d), y.dtype)])

    out = pl.pallas_call(
        functools.partial(_dist_kernel, metric=metric, exact=exact),
        out_shape=jax.ShapeDtypeStruct((qp, cp), jnp.float32),
        grid=(qp // tile_q, cp // tile_c),
        in_specs=[
            pl.BlockSpec((tile_q, d), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_c, d), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((tile_q, tile_c), lambda i, j: (i, j)),
        interpret=interpret,
    )(x, y)
    return out[:q, :c]


def best_pairwise_distance(
    x: jax.Array, y: jax.Array, metric: Metric, exact: bool = True
) -> jax.Array:
    """Dispatch: Pallas kernel on TPU, XLA elsewhere.

    Checks the operand's actual placement, not just the global backend — a
    TPU-backed process may run shard builds on virtual CPU devices via
    ``jax.default_device`` (the multi-chip dry run does)."""
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
        return pallas_pairwise_distance(x, y, metric, exact=exact)
    return pairwise_distance(x, y, metric, exact=exact)
