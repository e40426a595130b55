"""Round-3 MFU study of the fused binned-scan kernel (ops/pallas_scan).

Measures the kernel in isolation and through ``fast_flat_knn`` at 262k and
1M x 128, cosine, warm-cache, host-readback timing — the VERDICT-r2 #6
"push flat-scan MFU past 15%" evidence run.  Prints one JSON line per point.

Usage: python scripts/scan_study_r3.py [q]
"""

import json
import sys
import time

sys.path.insert(0, ".")

from parallel_hnsw_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from parallel_hnsw_tpu.analysis import brute_force_knn, fast_flat_knn
from parallel_hnsw_tpu.graph import DenseSource
from parallel_hnsw_tpu.ops.distance import Metric
from parallel_hnsw_tpu.ops.pallas_scan import binned_scan

M = Metric.COSINE


def timeit(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        # completion sync via a ONE-element readback: slice on device first.
        # (np.asarray(out[0]) read the whole [Q, classes] slab back over the
        # tunnel — ~1 GB at 1M rows, 100x the kernel time — which made the
        # first scan_r3 session's raw-kernel rows readback-dominated garbage.)
        _ = float(np.asarray(out[0][-1:, -1:]))
        best = min(best, time.time() - t0)
    return best


def sweep(q=2048, n=1_048_576, d=128):
    """Tile-shape sweep of the raw kernel: grid-step overhead vs VMEM
    pressure is the open MFU question; measure instead of guessing."""
    from parallel_hnsw_tpu.ops.pallas_scan import clamp_tile_c, pallas_binned_scan

    print(jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = corpus[:q] + 0.05 * rng.standard_normal((q, d)).astype(np.float32)
    cj = jnp.asarray(corpus, jnp.bfloat16)
    qj = jnp.asarray(queries, jnp.bfloat16)
    flops = 2.0 * q * n * d
    from parallel_hnsw_tpu.ops.pallas_scan import pallas_folded_scan

    def run(label, fn):
        # NB: fn must take (queries, corpus) as ARGUMENTS — a lambda closing
        # over the arrays embeds them as jit constants, and the serialized
        # program (corpus included) blows the axon compile tunnel's request
        # limit at 1M rows (HTTP 413, round 4's crashed study).
        try:
            fn(qj, cj)  # compile
            dt = timeit(lambda: fn(qj, cj))
        except Exception as e:  # VMEM blowout → record and move on
            print(f"# {label}: {type(e).__name__}", flush=True)
            return
        print(
            json.dumps(
                {
                    "point": label,
                    "ms": round(dt * 1e3, 2),
                    "qps": round(q / dt),
                    "tf_s": round(flops / dt / 1e12, 1),
                    "mfu_bf16_pct": round(100 * flops / dt / 197e12, 1),
                }
            ),
            flush=True,
        )

    for tile_q in (128, 256, 512):
        for tile_c in (2048, 4096, 8192, 16384):
            if clamp_tile_c(tile_c, d, 2) != tile_c:
                continue
            run(
                f"kernel tq={tile_q} tc={tile_c}",
                jax.jit(
                    lambda qq, cc, tq=tile_q, tc=tile_c: pallas_binned_scan(
                        qq, cc, M, tile_q=tq, tile_c=tc
                    )
                ),
            )
    for tile_q in (256, 512):
        for tile_c in (2048, 4096, 8192):
            for n_slots in (16, 32):
                run(
                    f"folded tq={tile_q} tc={tile_c} ns={n_slots}",
                    jax.jit(
                        lambda qq, cc, tq=tile_q, tc=tile_c, ns=n_slots:
                        pallas_folded_scan(
                            qq, cc, M, tile_q=tq, tile_c=tc, n_slots=ns
                        )
                    ),
                )


def main(q=2048):
    print(jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    for n in (262_144, 1_048_576):
        d = 128
        corpus = rng.standard_normal((n, d)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        queries = corpus[rng.permutation(n)[:q]] + 0.05 * rng.standard_normal(
            (q, d)
        ).astype(np.float32)
        src = DenseSource(vectors=jnp.asarray(corpus))
        qj = jnp.asarray(queries)
        gt_ids, _ = brute_force_knn(src, qj, M, 10, query_block=1024)
        gt = np.asarray(gt_ids)
        print(f"# gt done n={n}", flush=True)

        # kernel alone (bf16 fast mode, as the engines call it)
        # pass the corpus as an ARGUMENT: closing over it embeds a 512MB
        # constant in the serialized program (axon tunnel HTTP 413 at 1M)
        cj = src.vectors
        kfn = jax.jit(lambda q, c: binned_scan(q, c, M, tile_c=4096))
        kfn(qj, cj)  # compile
        dt = timeit(lambda: kfn(qj, cj))
        flops = 2.0 * q * n * d
        print(
            json.dumps(
                {
                    "point": f"kernel {n}x{d} q={q}",
                    "ms": round(dt * 1e3, 2),
                    "qps": round(q / dt),
                    "tf_s": round(flops / dt / 1e12, 1),
                    "mfu_bf16_pct": round(100 * flops / dt / 197e12, 1),
                }
            ),
            flush=True,
        )

        # decomposition baselines for the roofline (round 5): what does XLA
        # pay for the same distance matmul when it must MATERIALIZE the
        # [Q, N] tile stream (bf16) vs when it only reduces it?  The gap
        # between "matmul only" and the fused kernel is the price of index
        # tracking + binning; the gap between "matmul+min" and "matmul only"
        # is the reduce; everything is passed as arguments (HTTP 413).
        cb = jnp.asarray(corpus, jnp.bfloat16)
        qb = jnp.asarray(queries, jnp.bfloat16)
        for label, f in (
            ("matmul only", lambda q, c: (q @ c.T,)),
            ("matmul+min", lambda q, c: (jnp.min(q @ c.T, axis=1)[None, :],)),
        ):
            try:
                xfn = jax.jit(f)
                xfn(qb, cb)  # compile
                dt = timeit(lambda: xfn(qb, cb))
            except Exception as e:
                print(f"# xla {label} {n}: {type(e).__name__}", flush=True)
                continue
            print(
                json.dumps(
                    {
                        "point": f"xla {label} {n}x{d} q={q}",
                        "ms": round(dt * 1e3, 2),
                        "tf_s": round(flops / dt / 1e12, 1),
                        "mfu_bf16_pct": round(100 * flops / dt / 197e12, 1),
                    }
                ),
                flush=True,
            )

        # end-to-end engine (kernel + approx_min_k + exact rerank)
        for ovs in (4, 8):
            fast_flat_knn(src, qj, M, 10, oversample=ovs)  # compile
            dt = timeit(lambda: fast_flat_knn(src, qj, M, 10, oversample=ovs))
            ids, _ = fast_flat_knn(src, qj, M, 10, oversample=ovs)
            got = np.asarray(ids)[:, :10]
            rec = float(
                np.mean([len(np.intersect1d(got[i], gt[i])) for i in range(q)])
                / 10.0
            )
            print(
                json.dumps(
                    {
                        "point": f"fast_flat_knn {n}x{d} ovs={ovs}",
                        "ms": round(dt * 1e3, 2),
                        "qps": round(q / dt),
                        "recall_at_10": round(rec, 4),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sweep":
        sweep(*(int(a) for a in sys.argv[2:]))
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 else 2048)
