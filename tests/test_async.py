"""Async scoring bridge tests: pipelined driver + jitted io_callback loop."""

import numpy as np
import pytest

import jax.numpy as jnp

from rad_tpu.build.reference import build_hnsw
from rad_tpu.fp import random_fingerprints
from rad_tpu.store.smiles_store import InMemorySmilesStore
from rad_tpu.traverse import device as dev
from rad_tpu.traverse.callback import (
    make_callback_scorer,
    traverse_with_callback,
)
from rad_tpu.traverse.driver import DeviceTraverser


@pytest.fixture(scope="module")
def setup():
    n = 250
    fps = random_fingerprints(n, n_bits=64, density=0.3, seed=19)
    graph = build_hnsw(fps, connectivity=4, expansion_add=20, seed=6)
    keys = np.asarray(graph.keys)
    rng = np.random.default_rng(2)
    table = {int(k): float(s)
             for k, s in zip(keys, rng.permutation(n).astype(float))}
    store = InMemorySmilesStore({int(k): f"P_{int(k)}" for k in keys})

    def scoring_fn(smiles):
        return table[int(smiles.split("_")[1])]

    return graph, store, scoring_fn, table


def test_pipelined_traversal_invariants(setup):
    graph, store, scoring_fn, table = setup
    tr = DeviceTraverser(graph, scoring_fn, store, batch_size=4,
                         frontier_capacity=1 << 12, n_score_threads=1)
    tr.prime()
    stats = tr.traverse(n_to_score=10**9, timeout=120, pipeline_depth=3)
    assert stats["termination_reason"] == "queue_empty"
    mols = tr.get_molecules()
    ids = [m[0] for m in mols]
    assert len(ids) == len(set(ids)), "order log duplicated under pipelining"
    assert len(ids) == stats["n_scored"]
    keys = np.asarray(graph.keys)
    for nid, score, _ in mols:
        assert score == table[int(keys[nid])]
    tr.shutdown()


def test_pipelined_same_scored_set_as_sync(setup):
    graph, store, scoring_fn, _ = setup
    t1 = DeviceTraverser(graph, scoring_fn, store, batch_size=4,
                         frontier_capacity=1 << 12, n_score_threads=1)
    t1.prime()
    t1.traverse(n_to_score=10**9, timeout=120, pipeline_depth=1)
    t2 = DeviceTraverser(graph, scoring_fn, store, batch_size=4,
                         frontier_capacity=1 << 12, n_score_threads=1)
    t2.prime()
    t2.traverse(n_to_score=10**9, timeout=120, pipeline_depth=4)
    s1 = {(m[0], m[1]) for m in t1.get_molecules()}
    s2 = {(m[0], m[1]) for m in t2.get_molecules()}
    assert s1 == s2
    t1.shutdown()
    t2.shutdown()


def test_callback_loop_matches_stepwise(setup):
    graph, store, scoring_fn, table = setup
    dg = dev.prepare_device_graph(graph)

    # stepwise reference
    tr = DeviceTraverser(graph, scoring_fn, store, batch_size=4,
                         frontier_capacity=1 << 12, n_score_threads=1)
    tr.prime()
    tr.traverse(n_to_score=10**9, timeout=120)
    ref_mols = tr.get_molecules()
    tr.shutdown()

    # compiled io_callback loop
    score_ids = make_callback_scorer(graph, scoring_fn, store)
    state = dev.init_state(dg, frontier_capacity=1 << 12)
    n_top = graph.layer_sizes[graph.max_level]
    ids = np.arange(n_top, dtype=np.int32)
    seed_scores = score_ids(ids).astype(np.float32)
    state = dev.prime(state, dg, jnp.asarray(ids), jnp.asarray(seed_scores))
    state, steps = traverse_with_callback(state, dg, score_ids,
                                          n_to_score=10**9, batch=4)
    assert steps > 0
    count = int(state.n_scored)
    log = np.asarray(state.order_log)[:count]
    scores = np.asarray(state.scores)[log]
    assert [m[0] for m in ref_mols] == log.tolist()
    np.testing.assert_allclose([m[1] for m in ref_mols], scores, atol=1e-6)


def test_fused_run_matches_fused_steps(setup):
    """The single-program while_loop (fused_run) must equal iterated
    fused_step calls exactly."""
    graph, store, scoring_fn, _ = setup
    from rad_tpu.fp import random_fingerprints
    from rad_tpu.fp.pack import popcount_rows
    from rad_tpu.fp.tanimoto import tanimoto_matrix

    dg = dev.prepare_device_graph(graph)
    packed = jnp.asarray(np.asarray(graph.packed))
    pops = jnp.asarray(np.asarray(graph.popcounts))
    target = jnp.asarray(random_fingerprints(1, 64, 0.3, 123)[0])
    tp = popcount_rows(target[None, :])[0]
    n_top = graph.layer_sizes[graph.max_level]
    ids = jnp.arange(n_top, dtype=jnp.int32)
    seeds = tanimoto_matrix(target[None, :], packed[:n_top])[0]

    s1 = dev.prime(dev.init_state(dg, frontier_capacity=1 << 12), dg, ids,
                   seeds)
    for _ in range(20):
        s1 = dev.fused_step(s1, dg, packed, pops, target, tp, batch=4)

    s2 = dev.prime(dev.init_state(dg, frontier_capacity=1 << 12), dg, ids,
                   seeds)
    s2 = dev.fused_run(s2, dg, packed, pops, target, tp,
                       jnp.int32(10**9), batch=4, max_steps=20)

    assert int(s1.n_scored) == int(s2.n_scored) > n_top
    np.testing.assert_array_equal(np.asarray(s1.order_log),
                                  np.asarray(s2.order_log))
    np.testing.assert_allclose(np.asarray(s1.f_score),
                               np.asarray(s2.f_score), atol=1e-6)


def test_fused_run_narrow_width_agrees(setup):
    """narrow_width only trims -1 padding from the score/integrate half:
    the scored set, order log, frontier, and drop counts must be identical
    to the full-width run — including steps that overflow the narrow
    branch (batch*M0 candidates > narrow_width forces the fallback)."""
    graph, store, scoring_fn, _ = setup
    from rad_tpu.fp import random_fingerprints
    from rad_tpu.fp.pack import popcount_rows
    from rad_tpu.fp.tanimoto import tanimoto_matrix

    dg = dev.prepare_device_graph(graph)
    packed = jnp.asarray(np.asarray(graph.packed))
    pops = jnp.asarray(np.asarray(graph.popcounts))
    target = jnp.asarray(random_fingerprints(1, 64, 0.3, 123)[0])
    tp = popcount_rows(target[None, :])[0]
    n_top = graph.layer_sizes[graph.max_level]
    ids = jnp.arange(n_top, dtype=jnp.int32)
    seeds = tanimoto_matrix(target[None, :], packed[:n_top])[0]

    def run(narrow):
        s = dev.prime(dev.init_state(dg, frontier_capacity=1 << 12), dg,
                      ids, seeds)
        # exhaustive: budget beyond graph size so both runs sweep fully
        return dev.fused_run(s, dg, packed, pops, target, tp,
                             jnp.int32(10**9), batch=4,
                             narrow_width=narrow)

    full = run(None)
    for w in (8, 16):  # < batch * M0; 8 forces frequent full fallbacks
        nar = run(w)
        assert int(nar.n_scored) == int(full.n_scored) > n_top
        np.testing.assert_array_equal(np.asarray(nar.order_log),
                                      np.asarray(full.order_log))
        np.testing.assert_array_equal(np.asarray(nar.scored),
                                      np.asarray(full.scored))
        np.testing.assert_allclose(np.asarray(nar.f_score),
                                   np.asarray(full.f_score), atol=1e-6)
        assert int(nar.n_dropped) == int(full.n_dropped)


def test_frontier_buffer_sizes_agree(setup):
    """Tiny buffer (always-merge), moderate buffer (frequent merges), and
    huge buffer (no merge until the end) must all produce identical
    traversals — the buffer only changes *when* merges happen."""
    graph, store, scoring_fn, _ = setup
    logs = []
    for bufc in (16, 256, 1 << 14):
        tr = DeviceTraverser(graph, scoring_fn, store, batch_size=4,
                             frontier_capacity=1 << 12,
                             buffer_capacity=bufc, n_score_threads=1)
        tr.prime()
        tr.traverse(n_to_score=10**9, timeout=120)
        logs.append([m[:2] for m in tr.get_molecules()])
        assert int(tr.state.n_dropped) == 0
        tr.shutdown()
    assert logs[0] == logs[1] == logs[2]


def test_callback_loop_n_to_score(setup):
    graph, store, scoring_fn, _ = setup
    dg = dev.prepare_device_graph(graph)
    score_ids = make_callback_scorer(graph, scoring_fn, store)
    state = dev.init_state(dg, frontier_capacity=1 << 12)
    n_top = graph.layer_sizes[graph.max_level]
    ids = np.arange(n_top, dtype=np.int32)
    state = dev.prime(state, dg, jnp.asarray(ids),
                      jnp.asarray(score_ids(ids).astype(np.float32)))
    state, _ = traverse_with_callback(state, dg, score_ids,
                                      n_to_score=60, batch=4)
    assert int(state.n_scored) >= 60


def test_concurrent_callback_traversals_use_own_scorers():
    """Reentrancy: two overlapping traverse_with_callback calls must each
    see their own scoring function (regression: a process-global scorer
    slot let one traversal clobber the other's)."""
    import threading

    import numpy as np

    from rad_tpu.build.reference import build_hnsw
    from rad_tpu.fp import random_fingerprints
    from rad_tpu.fp.tanimoto import tanimoto_matrix
    import jax.numpy as jnp
    from rad_tpu.traverse import device as dev

    fps = random_fingerprints(300, n_bits=64, density=0.3, seed=31)
    graph = build_hnsw(fps, connectivity=4, expansion_add=24, seed=2)
    dg = dev.prepare_device_graph(graph)

    def make_scorer(offset):
        def score_ids(ids):
            ids = np.asarray(ids)
            out = np.full(ids.shape, np.inf, np.float32)
            ok = ids >= 0
            out[ok] = (ids[ok].astype(np.float32) * 7 % 101) + offset
            return out
        return score_ids

    results = {}

    def run(tag, offset):
        state = dev.init_state(dg, frontier_capacity=1 << 10)
        n_top = graph.layer_sizes[graph.max_level]
        ids = jnp.arange(n_top, dtype=jnp.int32)
        seed_scores = jnp.asarray(
            make_scorer(offset)(np.arange(n_top)))
        state = dev.prime(state, dg, ids, seed_scores)
        state, _ = traverse_with_callback(
            state, dg, make_scorer(offset), n_to_score=150, batch=8)
        results[tag] = np.asarray(state.scores)

    t1 = threading.Thread(target=run, args=("a", 0.0))
    t2 = threading.Thread(target=run, args=("b", 1000.0))
    t1.start(); t2.start(); t1.join(); t2.join()

    a, b = results["a"], results["b"]
    fa = np.isfinite(a)
    fb = np.isfinite(b)
    # every score must come from the traversal's OWN scorer
    assert (a[fa] < 1000.0).all(), "traversal A got B's scores"
    assert (b[fb] >= 1000.0).all(), "traversal B got A's scores"
