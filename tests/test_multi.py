"""Multi-campaign traversal: per-campaign bit-parity with solo runs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rad_tpu.build.reference import build_hnsw
from rad_tpu.fp import random_fingerprints
from rad_tpu.fp.pack import popcount_rows
from rad_tpu.fp.tanimoto import tanimoto_matrix
from rad_tpu.traverse import device as dev
from rad_tpu.traverse.multi import (campaign_state, fused_run_multi,
                                    init_multi, prime_multi)


@pytest.fixture(scope="module")
def setup():
    fps = random_fingerprints(600, n_bits=128, density=0.25, seed=41)
    graph = build_hnsw(fps, connectivity=4, expansion_add=24, seed=6)
    dg = dev.prepare_device_graph(graph)
    packed = jnp.asarray(np.asarray(graph.packed))
    pops = jnp.asarray(np.asarray(graph.popcounts))
    targets = jnp.asarray(
        random_fingerprints(3, n_bits=128, density=0.25, seed=77))
    t_pops = popcount_rows(targets)
    return graph, dg, packed, pops, targets, t_pops


def _solo(dg, packed, pops, target, t_pop, budget, frontier, buffer):
    n_top = int(jnp.sum(dg.offsets[dg.max_level + 1]
                        - dg.offsets[dg.max_level]))
    ids = jnp.arange(n_top, dtype=jnp.int32)
    seed = tanimoto_matrix(target[None, :], packed[:n_top])[0]
    st = dev.init_state(dg, frontier_capacity=frontier,
                        buffer_capacity=buffer, head_capacity=None)
    st = dev.prime(st, dg, ids, seed)
    return dev.fused_run(st, dg, packed, pops, target, t_pop,
                         jnp.int32(budget), batch=4)


@pytest.mark.slow
def test_multi_campaign_matches_solo_runs(setup):
    """Each campaign of the batched sweep ends bit-identical to running it
    alone: same scored set, same scores, same insertion order — across
    different per-campaign budgets (freezing) and the lifted merge cond."""
    graph, dg, packed, pops, targets, t_pops = setup
    frontier, buffer = 1 << 11, 1 << 8
    budgets = jnp.asarray([80, 150, 120], jnp.int32)

    states = init_multi(dg, 3, frontier_capacity=frontier,
                        buffer_capacity=buffer)
    n_top = graph.layer_sizes[graph.max_level]
    ids = jnp.arange(n_top, dtype=jnp.int32)
    seeds = tanimoto_matrix(targets, packed[:n_top])
    states = prime_multi(states, dg, ids, seeds)
    states = fused_run_multi(states, dg, packed, pops, targets, t_pops,
                             budgets, batch=4)

    for i in range(3):
        solo = _solo(dg, packed, pops, targets[i], t_pops[i],
                     int(budgets[i]), frontier, buffer)
        ci = campaign_state(states, i)
        assert int(ci.n_scored) == int(solo.n_scored), f"campaign {i}"
        np.testing.assert_array_equal(np.asarray(ci.scored),
                                      np.asarray(solo.scored))
        np.testing.assert_array_equal(
            np.asarray(ci.scores)[np.asarray(solo.scored)],
            np.asarray(solo.scores)[np.asarray(solo.scored)])
        np.testing.assert_array_equal(dev.read_order_log(ci),
                                      dev.read_order_log(solo))
        assert int(ci.n_dropped) == 0 and int(solo.n_dropped) == 0


def test_multi_campaign_budgets_respected(setup):
    graph, dg, packed, pops, targets, t_pops = setup
    states = init_multi(dg, 3, frontier_capacity=1 << 11,
                        buffer_capacity=1 << 8)
    n_top = graph.layer_sizes[graph.max_level]
    ids = jnp.arange(n_top, dtype=jnp.int32)
    seeds = tanimoto_matrix(targets, packed[:n_top])
    states = prime_multi(states, dg, ids, seeds)
    budgets = jnp.asarray([50, 200, 100], jnp.int32)
    states = fused_run_multi(states, dg, packed, pops, targets, t_pops,
                             budgets, batch=4)
    n = np.asarray(states.n_scored)
    # each campaign met its budget (graph is large enough) without the
    # slowest campaign dragging the finished ones past theirs by more
    # than one batch's worth of discoveries
    assert (n >= np.asarray(budgets)).all()
    assert (n <= np.asarray(budgets) + 4 * dg.m0).all()


@pytest.mark.slow
def test_panel_example_runs_and_recovers(capsys):
    """Anti-rot execution of examples/panel_screening.py + the batch-depth
    property: at batch 8 (tens of guidance rounds) every receptor recovers
    nearly all of its true top-100 at a 10% budget."""
    import os
    import sys
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples"))
    import panel_screening

    rc = panel_screening.main(["--n", "6000", "--receptors", "2",
                               "--batch", "8"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "receptor 1" in out
    mean = int(out.rsplit(":", 1)[1].split("/")[0])
    assert mean >= 90, out


@pytest.mark.slow
def test_batch_depth_guidance_property(setup):
    """The documented depth trade (docs/ARCHITECTURE.md): a batch that
    compresses the whole budget into ~1 round floods the entry region and
    loses the score gradient, while a deep batch follows it."""
    graph, dg, packed, pops, targets, t_pops = setup
    # score table = similarity to target 0 (a real gradient on this graph)
    from rad_tpu.fp.tanimoto import tanimoto_matrix
    table = tanimoto_matrix(targets[:1], packed)[0]
    budget = 120

    def run(batch):
        states = init_multi(dg, 1, frontier_capacity=1 << 11,
                            buffer_capacity=1 << 8)
        n_top = graph.layer_sizes[graph.max_level]
        ids = jnp.arange(n_top, dtype=jnp.int32)
        states = prime_multi(states, dg, ids, table[None, :n_top])
        from rad_tpu.traverse.multi import fused_run_multi_tables
        states = fused_run_multi_tables(states, dg, table[None],
                                        jnp.int32(budget), batch=batch)
        st = campaign_state(states, 0)
        scored = np.asarray(st.scored)
        top = np.argsort(np.asarray(table), kind="stable")[:30]
        return sum(scored[i] for i in top)

    deep = run(2)       # ~15 guidance rounds
    shallow = run(32)   # budget gone in ~1 round
    assert deep > shallow, (deep, shallow)
    # uniform-random fixture = weak gradient; the clustered-library case
    # (test_panel_example_runs_and_recovers) pins the strong-recovery end
    assert deep >= 10, deep


@pytest.mark.slow
def test_multi_two_level_same_scored_set(setup):
    """Two-level multi (scalar-lifted refill) scores the same SET as the
    single-level multi at a lossless frontier — only equal-score pop
    order may differ (the documented two-level caveat)."""
    graph, dg, packed, pops, targets, t_pops = setup
    n_top = graph.layer_sizes[graph.max_level]
    ids = jnp.arange(n_top, dtype=jnp.int32)
    seeds = tanimoto_matrix(targets, packed[:n_top])
    budgets = jnp.asarray([100, 160, 130], jnp.int32)

    def run(head):
        states = init_multi(dg, 3, frontier_capacity=1 << 11,
                            buffer_capacity=1 << 7, head_capacity=head)
        states = prime_multi(states, dg, ids, seeds)
        return fused_run_multi(states, dg, packed, pops, targets, t_pops,
                               budgets, batch=4)

    flat = run(None)
    two = run(1 << 8)  # head 256 < frontier 2048 -> real cold store
    for i in range(3):
        a = campaign_state(flat, i)
        b = campaign_state(two, i)
        assert int(a.n_dropped) == 0 and int(b.n_dropped) == 0
        np.testing.assert_array_equal(np.asarray(a.scored),
                                      np.asarray(b.scored))
        assert int(a.n_scored) == int(b.n_scored)


@pytest.mark.slow
def test_multi_campaign_packed_adjacency_bit_identical(setup):
    """The vmapped multi-campaign engine over a PACKED (grouped bit-field)
    adjacency table ends bit-identical to the int32 run — the packed
    decode is a shared-operand gather, the vmapped-gather-safe layout."""
    graph, dg, packed, pops, targets, t_pops = setup
    frontier, buffer = 1 << 11, 1 << 8
    budgets = jnp.asarray([80, 150, 120], jnp.int32)
    dg_p = dev.pack_device_graph(dg, chunk=256)
    assert dg_p.adj_bits < 32

    n_top = graph.layer_sizes[graph.max_level]
    ids = jnp.arange(n_top, dtype=jnp.int32)
    seeds = tanimoto_matrix(targets, packed[:n_top])

    finals = []
    for d in (dg, dg_p):
        states = init_multi(d, 3, frontier_capacity=frontier,
                            buffer_capacity=buffer)
        states = prime_multi(states, d, ids, seeds)
        finals.append(fused_run_multi(states, d, packed, pops, targets,
                                      t_pops, budgets, batch=4))
    a, b = finals
    np.testing.assert_array_equal(np.asarray(a.scored), np.asarray(b.scored))
    np.testing.assert_array_equal(np.asarray(a.order_log),
                                  np.asarray(b.order_log))
    np.testing.assert_allclose(np.asarray(a.scores), np.asarray(b.scores),
                               atol=0)
    np.testing.assert_array_equal(np.asarray(a.n_scored),
                                  np.asarray(b.n_scored))
