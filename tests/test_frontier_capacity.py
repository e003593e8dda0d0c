"""Frontier capacity: auto-sizing guarantees and bounded drop impact.

The frontier's overflow policy (worst entries shed at merges) was
previously only *observable* (n_dropped); these tests pin what it costs:

- auto-sized capacity (>= n_rows) provably never drops — every (node,
  level) row enters the frontier at most once (the enqueued bitmap);
- an undersized frontier degrades enrichment gracefully, not
  catastrophically: drops happen, yet the tight-cap run still recovers
  most of what the lossless run finds (drops are always the *worst*
  current entries, so the best-first sweep's head is preserved).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rad_tpu.build.reference import build_hnsw
from rad_tpu.fp import random_fingerprints
from rad_tpu.fp.pack import popcount_rows
from rad_tpu.fp.tanimoto import tanimoto_matrix
from rad_tpu.traverse import device as dev


@pytest.fixture(scope="module")
def built():
    fps = random_fingerprints(3000, n_bits=128, density=0.25, seed=5)
    graph = build_hnsw(fps, connectivity=8, expansion_add=48, seed=1)
    target = random_fingerprints(1, n_bits=128, density=0.25, seed=6)[0]
    return graph, target


def _run(graph, target, frontier_capacity, n_to_score, buffer_capacity=256):
    dg = dev.prepare_device_graph(graph)
    packed = jnp.asarray(np.asarray(graph.packed))
    pops = jnp.asarray(np.asarray(graph.popcounts))
    t = jnp.asarray(target)
    t_pop = popcount_rows(t[None, :])[0]
    state = dev.init_state(dg, frontier_capacity,
                           buffer_capacity=buffer_capacity)
    n_top = graph.layer_sizes[graph.max_level]
    seeds = jnp.arange(n_top, dtype=jnp.int32)
    seed_scores = tanimoto_matrix(t[None, :], packed[:n_top])[0]
    state = dev.prime(state, dg, seeds, seed_scores)
    state = dev.fused_run(state, dg, packed, pops, t, t_pop,
                          jnp.int32(n_to_score), batch=32)
    return state


@pytest.mark.slow
def test_auto_capacity_never_drops(built):
    graph, target = built
    dg = dev.prepare_device_graph(graph)
    auto = dev.auto_frontier_capacity(dg.n_rows)
    assert auto >= dg.n_rows
    state = _run(graph, target, None, n_to_score=2500)
    assert int(state.n_dropped) == 0
    assert int(state.n_scored) >= 2500
    assert state.f_score.shape[0] == auto


@pytest.mark.slow
def test_tight_capacity_drops_but_degrades_gracefully(built):
    graph, target = built
    n_top_eval = 100
    exact = _run(graph, target, None, n_to_score=900)
    tight = _run(graph, target, 256, n_to_score=900, buffer_capacity=64)
    assert int(tight.n_dropped) > 0, \
        "test must actually force drops to mean anything"

    # ground truth: the library's true top-N by the on-device scorer
    packed = jnp.asarray(np.asarray(graph.packed))
    d = np.asarray(tanimoto_matrix(jnp.asarray(target)[None, :], packed))[0]
    true_top = set(np.argsort(d, kind="stable")[:n_top_eval].tolist())

    def found(state):
        ids = dev.read_order_log(state)
        return len(true_top & set(ids.tolist()))

    f_exact, f_tight = found(exact), found(tight)
    assert f_exact > 0
    # the forced-drop run keeps most of the lossless run's recovery
    assert f_tight >= 0.7 * f_exact, (f_tight, f_exact,
                                      int(tight.n_dropped))


def test_auto_capacity_clamps(built):
    assert dev.auto_frontier_capacity(10) == 1 << 12        # floor
    assert dev.auto_frontier_capacity(3_000_000) == 1 << 22  # next pow2
    assert dev.auto_frontier_capacity(1 << 30) == 1 << 22    # ceiling
