"""Benchmark harness — run on real TPU hardware.

Default workload: the reference's own bench (benches/bench.rs:54-63): build a
graph over ~10k random 100-d unit vectors with the cosine metric, then measure
batched query throughput at the default operating point (ef=300).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Other BASELINE.md configs: ``--mode pq`` (PQ codebook + code graph + rerank),
``--mode sharded`` (mesh-sharded search), ``--dataset x.fvecs`` (real dataset
via the native loader, e.g. SIFT1M when files are available).

The reference publishes no numbers (BASELINE.md) and the Rust toolchain is
absent, so ``vs_baseline`` divides by REF_SINGLE_CORE_QPS — a *measured*
number: native/ref_model.c is a single-core C port of the reference's build
and query pipeline (semantics sources in its header; the query path mirrors
tests/ref_model.py, which reproduces the reference's own golden search
expectations).  The C model is strictly faster per operation than the Rust
(binary heap vs a full visit-queue re-sort per pop, lib.rs:242-244;
generation-stamped arrays vs HashSet), so its throughput is an upper bound on
the reference's.  Run `python scripts/ref_c_bench.py` to reproduce; results
recorded in BENCH_NOTES.md "Reference baseline (measured)".

Build throughput is timed on a SECOND build (same shapes, warm compilation
cache) so the recorded number measures the pipeline, not the remote-compile
tunnel; the cold (first) build time is reported alongside on stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import traceback

import numpy as np

# Measured on this host via scripts/ref_c_bench.py (native/ref_model.c),
# 10k x 100 cosine, reference defaults — see BENCH_NOTES.md "Reference
# baseline (measured)".  The reference's recall@10 saturates at 0.9246 at its
# ef=300 default (it never reaches the 0.95 floor on this workload), so its
# best-recall operating point IS the denominator.
REF_SINGLE_CORE_QPS = 580.3  # ef=300/pd=2, recall@10=0.9246 (its maximum)
REF_SINGLE_CORE_BUILD_VPS = 399.5  # full generate incl. per-rung improve


def _emit_error(exc: BaseException) -> None:
    """Always leave ONE parseable JSON line, even on total failure.

    Round 3's driver capture died at axon backend init during a chip outage
    and the record was a bare traceback (BENCH_r03.json rc=1).  The contract
    is one JSON line per run; a failed run reports itself in-band."""
    traceback.print_exc(file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "bench failed before measurement",
                "value": 0.0,
                "unit": "qps",
                "vs_baseline": 0.0,
                "error": f"{type(exc).__name__}: {exc}",
            }
        )
    )


def wait_for_backend() -> None:
    """Bounded wait for the TPU backend with backoff (outage resilience).

    Probes in a SUBPROCESS: a failed in-process ``jax.devices()`` poisons
    jax's backend cache, and a wedged tunnel can hang a client in recvfrom
    (so each probe gets a hard timeout).  After the first successful probe,
    sleeps a settle delay — the axon chip grant releases lazily and an
    immediate re-attach can die with FAILED_PRECONDITION.

    Tunables (env): BENCH_BACKEND_WAIT_S total budget (default 1500s — the
    grant wedge is ~10 min, so wait at least 20), BENCH_SETTLE_S post-probe
    settle (default 180s), BENCH_PROBE_EVERY_S (default 90s).  Skipped
    entirely on CPU-only runs (JAX_PLATFORMS=cpu).
    """
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return
    budget = float(os.environ.get("BENCH_BACKEND_WAIT_S", "1500"))
    settle = float(os.environ.get("BENCH_SETTLE_S", "180"))
    every = float(os.environ.get("BENCH_PROBE_EVERY_S", "90"))
    deadline = time.time() + budget
    probe = [sys.executable, "-c", "import jax; jax.devices()"]
    first = True
    while True:
        try:
            rc = subprocess.run(
                probe, capture_output=True, timeout=240
            ).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            if not first:
                # a prior probe failed → the backend just came back; give the
                # grant time to settle before the real client attaches
                print(f"# backend up; settling {settle:.0f}s", file=sys.stderr)
                time.sleep(settle)
            return
        first = False
        if time.time() + every > deadline:
            raise RuntimeError(
                f"TPU backend unavailable after {budget:.0f}s of probing"
            )
        print("# backend unavailable; retrying", file=sys.stderr)
        time.sleep(every)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--count", type=int, default=10_000)
    p.add_argument("--dim", type=int, default=100)
    p.add_argument(
        "--mode", choices=["dense", "pq", "sharded", "exact"], default="dense"
    )
    p.add_argument("--dataset", type=str, default=None, help="fvecs corpus path")
    p.add_argument(
        "--no-improve",
        dest="improve",
        action="store_false",
        help="skip improve_index / relink during build",
    )
    p.add_argument("--probe-depth", type=int, default=8)
    p.add_argument("--query-block", type=int, default=2048)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument(
        "--fixed-op",
        action="store_true",
        help="skip the operating-point selection and bench at the reference "
        "default (ef=300) only",
    )
    p.add_argument(
        "--recall-floor",
        type=float,
        default=0.95,
        help="recall@10 floor for the operating-point selection (the driver "
        "target: QPS at recall@10 >= 0.95, BASELINE.md)",
    )
    args = p.parse_args()

    wait_for_backend()

    from parallel_hnsw_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from parallel_hnsw_tpu.analysis import brute_force_knn
    from parallel_hnsw_tpu.index import Hnsw
    from parallel_hnsw_tpu.ops.distance import Metric
    from parallel_hnsw_tpu.params import BuildParams
    from parallel_hnsw_tpu.utils.data import random_unit_corpus

    metric = Metric.NORMALIZED_COSINE
    if args.dataset:
        import jax.numpy as jnp

        from parallel_hnsw_tpu.graph import DenseSource
        from parallel_hnsw_tpu.utils.datasets import read_vecs

        vecs = read_vecs(args.dataset, count=args.count if args.count else -1)
        source = DenseSource(vectors=jnp.asarray(vecs))
        args.count, args.dim = vecs.shape
        metric = Metric.EUCLIDEAN  # SIFT-style datasets are L2
    else:
        source = random_unit_corpus(args.count, args.dim, seed=42)
    bp = BuildParams()
    sp = bp.optimization.search.replace(probe_depth=args.probe_depth)
    queries = source.vectors

    if args.mode == "pq":
        from parallel_hnsw_tpu.params import PqBuildParams
        from parallel_hnsw_tpu.pq import QuantizedHnsw

        dsub = 4 if args.dim % 4 == 0 else 5
        t0 = time.time()
        index = QuantizedHnsw.new(
            min(4096, args.count), source, dsub, metric, PqBuildParams(),
            seed=0, exact_quantize=True,
        )
        build_s = time.time() - t0
        search_fn = lambda q: index.search(q, sp, exact_quantize=True)
        tag = f"PQ({index.quantizer.nsub}x{dsub})"
    elif args.mode == "sharded":
        from parallel_hnsw_tpu.parallel import ShardedHnsw, default_mesh

        t0 = time.time()
        index = ShardedHnsw.generate(source, default_mesh(), bp, metric, seed=0,
                                     improve=args.improve)
        build_s = time.time() - t0
        search_fn = lambda q: index.search(q, sp, k=sp.number_of_candidates)
        tag = f"sharded x{default_mesh().devices.size}"
    elif args.mode == "exact":
        from parallel_hnsw_tpu.analysis import brute_force_knn

        build_s = float("nan")  # no index build
        search_fn = lambda q: brute_force_knn(source, q, metric, 10, args.query_block)
        tag = "exact MXU scan"
    else:
        # First build populates/validates the compilation cache (the remote-
        # compile tunnel can cost minutes on fresh programs); the SECOND
        # build, at identical bucketed shapes, measures the pipeline itself.
        t0 = time.time()
        index = Hnsw.generate(source, None, bp, metric, seed=0, improve=args.improve)
        cold_s = time.time() - t0
        t0 = time.time()
        index = Hnsw.generate(source, None, bp, metric, seed=0, improve=args.improve)
        build_s = time.time() - t0
        print(
            f"# build cold (incl. compiles): {cold_s:.1f}s; warm: {build_s:.1f}s",
            file=sys.stderr,
        )
        search_fn = lambda q: index.search(q, sp, query_block=args.query_block)
        tag = "dense"
    build_rate = args.count / build_s

    # ground truth for recall@10 on a query subsample
    q_eval = queries[: min(args.count, 10_000)]
    gt_ids, _ = brute_force_knn(source, q_eval, metric, 10)
    gt = np.asarray(gt_ids)

    def measure(fn):
        ids, dists = fn(q_eval)  # warmup (compile)
        got = np.asarray(ids[:, :10])
        # full-eval-set recall: the gate is a recall floor, so compute it on
        # every query (VERDICT r2 weak #9)
        inter = np.asarray(
            [len(np.intersect1d(got[i], gt[i])) for i in range(len(gt))]
        )
        recall = float(inter.mean() / 10.0)
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.time()
            out = fn(q_eval)
            # force completion via host readback — block_until_ready is
            # unreliable on the tunneled runtime
            _ = int(np.asarray(out[0][-1, 0]))
            best = min(best, time.time() - t0)
        return recall, len(gt) / best

    recall_at_10, qps = measure(search_fn)

    if args.mode == "dense" and not args.fixed_op:
        # Operating-point selection: the driver target is QPS at
        # recall@10 >= recall_floor (BASELINE.md:20-21), so bench the graph at
        # progressively cheaper (ef, probe_depth) points and keep the fastest
        # one that clears the floor.  The ef=300 reference-default number above
        # remains the parity anchor.
        passing = []
        for ef, pd in ((100, 2), (60, 2), (40, 2), (24, 2), (16, 2), (12, 1), (10, 1)):
            sp_try = sp.replace(
                number_of_candidates=ef,
                upper_layer_candidate_count=min(ef, sp.upper_layer_candidate_count),
                probe_depth=pd,
            )
            r, q_ = measure(lambda qq: index.search(qq, sp_try, query_block=args.query_block))
            print(f"# op point ef={ef} pd={pd}: recall@10={r:.4f} qps={q_:.0f}",
                  file=sys.stderr)
            if r < args.recall_floor:
                break
            passing.append(sp_try)
            if q_ > qps:
                recall_at_10, qps, sp = r, q_, sp_try
        # Hop-slab variant: neighbor-major feature slabs cut the hop to ONE
        # gather per expanded node (the hop's gather is issue-rate bound —
        # BENCH_NOTES "Gather micro-study").  Unrouted f32 slabs return
        # byte-identical results (tests/test_hop_slabs.py), so the recall
        # curve is unchanged; re-measure the cheapest passing points.
        # Slab variants, cheapest passing points only.  Two tiers measured in
        # the round-4 levers study (BENCH_NOTES "traversal levers"): f32 slabs
        # (byte-identical results, 2.0x at the gate) and bf16 routing rows +
        # slabs (exact full-precision rerank restores ordering; 2.6x).  Keep
        # whichever wins at or above the recall floor.
        def try_variant(tag_name, enable):
            nonlocal recall_at_10, qps, sp, tag
            try:
                t0 = time.time()
                enable()
                print(f"# {tag_name} built in {time.time() - t0:.1f}s",
                      file=sys.stderr)
                for sp_try in passing[-2:]:
                    r, q_ = measure(
                        lambda qq: index.search(qq, sp_try, query_block=args.query_block)
                    )
                    print(
                        f"# {tag_name} op point ef={sp_try.number_of_candidates} "
                        f"pd={sp_try.probe_depth}: recall@10={r:.4f} qps={q_:.0f}",
                        file=sys.stderr,
                    )
                    if r >= args.recall_floor and q_ > qps:
                        recall_at_10, qps, sp = r, q_, sp_try
                        tag = tag_name
                return True
            except Exception as e:  # byte budget exceeded, or any slab-path
                # failure — never lose the already-measured gate numbers
                print(f"# {tag_name} skipped: {type(e).__name__}: {e}",
                      file=sys.stderr)
                return False

        try_variant("dense+slabs", index.enable_hop_slabs)
        try_variant(
            "dense+routed_slabs",
            lambda: (index.enable_routing(dr=None), index.enable_hop_slabs()),
        )
        if tag != "dense+routed_slabs":
            index.disable_routing()
            if tag == "dense+slabs":
                index.enable_hop_slabs()
            else:
                index.disable_hop_slabs()

    # Repeat protocol (round-4 gate captures differed by 40% between
    # sessions): re-measure the selected operating point a second time and
    # report the MIN with the observed spread, so the recorded number is the
    # conservative end of the session's own variance.
    spread_pct = None
    if args.mode == "dense" and not args.fixed_op:
        r2, q2 = measure(lambda qq: index.search(qq, sp, query_block=args.query_block))
        if r2 >= args.recall_floor or r2 >= recall_at_10:
            spread_pct = round(100.0 * abs(qps - q2) / max(qps, q2), 1)
            print(f"# repeat measure: qps={q2:.0f} (first {qps:.0f}, "
                  f"spread {spread_pct}%)", file=sys.stderr)
            if q2 < qps:
                recall_at_10, qps = r2, q2

    build_note = (
        "no build" if build_s != build_s else f"{build_s:.1f}s ({build_rate:.0f} vec/s)"
    )
    print(
        f"# build: {build_note} improve={args.improve}; recall@10={recall_at_10:.4f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": (
                    f"QPS/chip, {tag} ({args.count}x{args.dim}, "
                    f"ef={sp.number_of_candidates}, recall@10={recall_at_10:.4f}"
                    + (
                        ""
                        if build_s != build_s
                        else f", build={build_rate:.0f} vec/s = "
                        f"{build_rate / REF_SINGLE_CORE_BUILD_VPS:.1f}x ref"
                    )
                    + ")"
                ),
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / REF_SINGLE_CORE_QPS, 2),
                **(
                    {"repeat_spread_pct": spread_pct}
                    if spread_pct is not None
                    else {}
                ),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except BaseException as e:  # noqa: BLE001 — one JSON line, no matter what
        _emit_error(e)
        raise SystemExit(1)
