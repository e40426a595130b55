"""Optimization-loop tests: relinking improves recall toward 1.0."""

import jax.numpy as jnp
import numpy as np
import pytest

from parallel_hnsw_tpu.analysis import first_hit_recall
from parallel_hnsw_tpu.build import generate
from parallel_hnsw_tpu.graph import assert_layer_invariants
from parallel_hnsw_tpu.optimize import (
    improve_neighbors,
    link_layer_to_better_neighbors,
    stochastic_recall,
)
from parallel_hnsw_tpu.ops.distance import Metric
from parallel_hnsw_tpu.params import BuildParams
from parallel_hnsw_tpu.utils.data import random_unit_corpus

METRIC = Metric.NORMALIZED_COSINE


def build_small(count=600, dim=16, seed=5):
    source = random_unit_corpus(count, dim)
    bp = BuildParams()
    layers = generate(source, jnp.arange(count), bp, METRIC, seed=seed)
    return source, bp, layers


def test_relink_improves_or_keeps_recall():
    source, bp, layers = build_small()
    op = bp.optimization.replace(recall_proportion=1.0)
    before = stochastic_recall(layers, source, METRIC, op)
    layers2, changed = link_layer_to_better_neighbors(
        layers, len(layers) - 1, source, METRIC, op.search
    )
    after = stochastic_recall(layers2, source, METRIC, op)
    assert after >= before - 0.02, (before, after)
    assert_layer_invariants(layers2)


def test_improve_neighbors_reaches_high_recall():
    # 16-dim random corpus is hard for a raw build; the improvement loop must
    # lift recall (reference gate: src/lib.rs:2228-2229 reaches 1.0)
    source, bp, layers = build_small()
    op = bp.optimization.replace(recall_proportion=1.0)
    layers, recall = improve_neighbors(layers, source, METRIC, op)
    assert recall >= 0.95, recall
    full = first_hit_recall(layers, source, METRIC, op.search)
    assert full >= 0.95, full
