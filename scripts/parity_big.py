"""Recall parity: reference-semantics model vs the TPU engine at 100k scale.

VERDICT r2 Missing #3: the engine expands only queue members (classic
ef-search) where the reference revisits nodes via its unbounded
visit_queue/visited lists (src/lib.rs:191-244); parity was only demonstrated
at 600/3,000 nodes.  This runs `tests/ref_model.py` (the validated NumPy
model of the reference's serial search) against the engine ON THE SAME
100k graph with sampled queries, closing the question at scale.

CPU-only by design: recall is platform-independent and the model is NumPy;
forcing the cpu platform also keeps this safe to run while a chip job holds
the TPU grant.  Usage: python scripts/parity_big.py [count] [nq]
(expects /tmp/idx_c2_<count> built by big_bench.py config2).
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from parallel_hnsw_tpu.io import deserialize_hnsw  # noqa: E402
from parallel_hnsw_tpu.params import SearchParams  # noqa: E402

sys.path.insert(0, "scripts")
sys.path.insert(0, "tests")
from big_bench import corpus  # noqa: E402
from ref_model import search_layers as ref_search_layers  # noqa: E402


def main(count=100_000, nq=192, k=10, efs=(24, 100, 300)):
    source = corpus(count, 128, unit=False)
    index = deserialize_hnsw(f"/tmp/idx_c2_{count}", source=source)
    data = np.asarray(source.vectors).astype(np.float64)
    np_layers = [(np.asarray(l.nodes), np.asarray(l.neighbors)) for l in index.layers]

    rng = np.random.default_rng(7)
    q_idx = rng.permutation(count)[:nq]
    queries = data[q_idx]

    # exact GT by blocked host matmul (f64)
    gt = np.empty((nq, k), np.int64)
    for i in range(nq):
        d = np.linalg.norm(data - queries[i], axis=-1)
        gt[i] = np.argpartition(d, k)[:k][np.argsort(d[np.argpartition(d, k)[:k]])]

    for ef in efs:
        sp = SearchParams(
            number_of_candidates=ef,
            upper_layer_candidate_count=min(ef, 100),
            probe_depth=2,
        )
        ids, _ = index.search(source.vectors[q_idx], sp, query_block=256)
        ours = np.asarray(ids[:, :k])
        ref_hits = tpu_hits = 0
        for qi in range(nq):
            q = queries[qi]

            def dist_to(vec_id: int) -> float:
                return float(np.linalg.norm(q - data[vec_id]))

            ref = ref_search_layers(
                np_layers, dist_to,
                number_of_candidates=ef,
                upper_layer_candidate_count=min(ef, 100),
                probe_depth=2,
            )
            ref_ids = [i for i, _ in ref][:k]
            ref_hits += len(np.intersect1d(ref_ids, gt[qi]))
            tpu_hits += len(np.intersect1d(ours[qi], gt[qi]))
        print(json.dumps({
            "count": count, "ef": ef, "queries": nq,
            "ref_semantics_recall_at_10": round(ref_hits / (nq * k), 4),
            "tpu_engine_recall_at_10": round(tpu_hits / (nq * k), 4),
        }), flush=True)


if __name__ == "__main__":
    count = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    main(count, nq)
