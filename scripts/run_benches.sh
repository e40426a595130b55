#!/usr/bin/env bash
# Reproduce the BENCH_NOTES.md numbers on the TPU chip.
# Each bench prints one JSON line on stdout (plus a # comment on stderr).
set -uo pipefail
cd "$(dirname "$0")/.."

echo "== dense graph search (reference bench.rs workload) =="
python bench.py

echo "== exact MXU scan =="
python bench.py --mode exact

echo "== PQ (codebook + code graph + rerank) =="
python bench.py --mode pq --count 4000 --dim 64

echo "== sharded (single-chip mesh here; N-chip on real meshes) =="
python bench.py --mode sharded --count 4000 --dim 64

echo "== 100k scale =="
python bench.py --count 100000 --dim 128 --query-block 8192

echo "== 10M compressed flat scan =="
python scripts/demo_10m_pq.py
