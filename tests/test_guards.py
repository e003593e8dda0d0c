"""Guards for measured TPU-kernel hazards + round-3 ADVICE fixes.

The round-2 verdict asked for the known-faulting configurations (vmapped
multi engine at small batch on big graphs; >2^20-key vmapped frontier
sorts) to raise at call time instead of living only in docs — a library
user must not be able to hard-fault the worker (VERDICT r2 item #4).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rad_tpu.build.reference import build_hnsw
from rad_tpu.fp import random_fingerprints
from rad_tpu.traverse import device as dev
from rad_tpu.traverse import multi as multi_mod
from rad_tpu.traverse.multi import fused_run_multi_tables, init_multi


@pytest.fixture(scope="module")
def small_dg():
    fps = random_fingerprints(300, n_bits=128, density=0.25, seed=3)
    graph = build_hnsw(fps, connectivity=4, expansion_add=16, seed=0)
    return dev.prepare_device_graph(graph)


def test_init_multi_rejects_wide_vmapped_sort(small_dg):
    with pytest.raises(ValueError, match="vmapped merge sorts"):
        init_multi(small_dg, n_campaigns=4,
                   frontier_capacity=(1 << 21), buffer_capacity=1 << 15)


def test_init_multi_allow_hazard_overrides(small_dg):
    st = init_multi(small_dg, n_campaigns=2,
                    frontier_capacity=(1 << 21), buffer_capacity=1 << 10,
                    allow_hazard=True)
    assert st.f_score.shape == (2, 1 << 21)


def test_init_multi_single_campaign_unrestricted(small_dg):
    st = init_multi(small_dg, n_campaigns=1,
                    frontier_capacity=(1 << 21), buffer_capacity=1 << 10)
    assert st.f_score.shape == (1, 1 << 21)


def test_init_multi_clamps_auto_frontier(small_dg, monkeypatch):
    # force the auto size above the cap without building a huge graph
    monkeypatch.setattr(dev, "auto_frontier_capacity",
                        lambda n_rows, cap_max=1 << 22: 1 << 22)
    st = init_multi(small_dg, n_campaigns=3, buffer_capacity=1 << 15)
    per_campaign = st.f_score.shape[1] + st.cold_score.shape[1] \
        + st.f_buf_score.shape[1]
    assert per_campaign <= multi_mod.MULTI_MAX_SORT_KEYS


def test_multi_batch_guard_fires(small_dg, monkeypatch):
    # the measured hazard is at >=2^20 rows; shrink the threshold so the
    # guard logic is exercised against the small test graph
    monkeypatch.setattr(multi_mod, "MULTI_BIG_GRAPH_ROWS", 128)
    states = init_multi(small_dg, n_campaigns=2,
                        frontier_capacity=1 << 10,
                        buffer_capacity=1 << 8)
    tables = jnp.ones((2, small_dg.n_nodes), jnp.float32)
    with pytest.raises(ValueError, match="single-program deadline"):
        fused_run_multi_tables(states, small_dg, tables,
                               jnp.int32(10), batch=8)


def test_multi_batch_guard_allows_small_graphs(small_dg):
    # default thresholds: a test-scale graph at batch 8 is fine
    # (frontier differs from the guard-fires test so the jit cache cannot
    # alias the two traces)
    states = init_multi(small_dg, n_campaigns=2,
                        frontier_capacity=1 << 11,
                        buffer_capacity=1 << 8)
    n_top = int(small_dg.offsets[small_dg.max_level + 1]
                - small_dg.offsets[small_dg.max_level])
    ids = jnp.arange(n_top, dtype=jnp.int32)
    tables = jnp.asarray(
        np.random.default_rng(0).random((2, small_dg.n_nodes)),
        jnp.float32)
    states = multi_mod.prime_multi(states, small_dg, ids, tables[:, :n_top])
    out = fused_run_multi_tables(states, small_dg, tables,
                                 jnp.int32(20), batch=8)
    assert int(out.n_scored[0]) >= 20


def test_traverser_rejects_unknown_engine_kwargs():
    """ADVICE r2: a typo'd / unsupported engine kwarg raises a clear
    ValueError naming the supported options, not a bare TypeError."""
    from rad_tpu import HNSWIndex, RADTraverser

    fps = random_fingerprints(300, n_bits=128, density=0.25, seed=3)
    idx = HNSWIndex(ndim=128, connectivity=4, expansion_add=16)
    idx.add(np.arange(300), fps)
    idx.build(backend="host")
    tr = RADTraverser(graph=idx.graph,
                      scoring_fn=lambda smi: float(len(smi)))
    try:
        tr.prime()
        with pytest.raises(ValueError, match="does not accept"):
            tr.traverse(n_to_score=10, checkpoint_pth="/tmp/x.npz")
        # the engine still works after the rejected call
        stats = tr.traverse(n_to_score=10)
        assert stats["n_scored"] >= 10
    finally:
        tr.shutdown()


@pytest.mark.slow
def test_sharded_multi_batch_guard_fires(monkeypatch):
    """The pod multi-campaign step enforces the same small-batch hazard
    guard as the single-chip multi engine — make_sharded_step_multi must
    not be a bypass (review r3s9)."""
    import jax

    from rad_tpu.fp.pack import popcount_rows
    from rad_tpu.parallel import make_mesh
    from rad_tpu.parallel.sharded import make_sharded_step_multi, shard_graph
    from rad_tpu.traverse.multi import init_multi, prime_multi

    fps = random_fingerprints(300, n_bits=128, density=0.25, seed=7)
    graph = build_hnsw(fps, connectivity=4, expansion_add=16, seed=0)
    dg = dev.prepare_device_graph(graph)
    mesh = make_mesh(len(jax.devices()), axis_names=("graph",))
    sg = shard_graph(graph, mesh)
    monkeypatch.setattr(multi_mod, "MULTI_BIG_GRAPH_ROWS", 128)

    targets = random_fingerprints(2, n_bits=128, density=0.25, seed=8)
    targets_j = jnp.asarray(targets)
    t_pops = popcount_rows(targets_j)
    states = init_multi(dg, 2, frontier_capacity=1 << 10,
                        buffer_capacity=1 << 8)
    n_top = graph.layer_sizes[graph.max_level]
    states = prime_multi(states, dg, jnp.arange(n_top, dtype=jnp.int32),
                         jnp.zeros((2, n_top), jnp.float32))
    step = make_sharded_step_multi(sg, mesh, batch=8)
    with pytest.raises(ValueError, match="single-program deadline"):
        step(states, targets_j, t_pops, jnp.asarray([10, 10], jnp.int32))
    # allow_hazard overrides (trace only needs to start; run one step)
    step_ok = make_sharded_step_multi(sg, mesh, batch=8, allow_hazard=True)
    states = step_ok(states, targets_j, t_pops,
                     jnp.asarray([10, 10], jnp.int32))
    assert int(states.n_scored[0]) >= 0


def test_init_multi_rejects_oversized_buffer(small_dg):
    """The sort-hazard guard must hold when the BUFFER alone (not the
    frontier) exceeds the vmapped-sort limit (review r3s9 — the
    auto-clamp floor could not bring frontier+buffer under it)."""
    with pytest.raises(ValueError, match="buffer_capacity"):
        init_multi(small_dg, n_campaigns=4, buffer_capacity=1 << 21)


def test_search_device_jit_requires_m0_packed(small_dg):
    """A packed-adjacency search without m0_packed raises a clear error
    instead of a TypeError deep in tracing (review r3s9)."""
    import jax.numpy as jnp

    from rad_tpu.search.knn import search_device_jit

    with pytest.raises(ValueError, match="m0_packed is required"):
        search_device_jit(
            jnp.zeros((8, 4), jnp.uint32), jnp.zeros((8,), jnp.int32),
            jnp.zeros((4, 8), jnp.uint32), jnp.zeros((3,), jnp.int32),
            jnp.zeros((2, 4), jnp.uint32), k=2, ef=4, max_level=0,
            adj_bits=16, adj_group=2)
