"""Traversal tests: state structures, host coordination engine, device engine,
and host-vs-device semantic parity."""

import numpy as np
import pytest

from rad_tpu.build.reference import build_hnsw
from rad_tpu.fp import random_fingerprints
from rad_tpu.service.local import LocalHNSWService
from rad_tpu.store.smiles_store import InMemorySmilesStore
from rad_tpu.traverse.coordinator import CoordinationService
from rad_tpu.traverse.driver import DeviceTraverser
from rad_tpu.traverse.structures import (
    HostPriorityQueue,
    HostScoredSet,
    HostVisitedSet,
)
from rad_tpu.traverse.workers import WorkerPool, ScoringWorker


# --------------------------------------------------------------------------
# state structures
# --------------------------------------------------------------------------

def test_pq_min_pop_and_overwrite():
    pq = HostPriorityQueue()
    pq.insert(1, 0, 5.0)
    pq.insert(2, 0, 3.0)
    pq.insert(3, 1, 4.0)
    pq.insert(2, 0, 7.0)  # ZADD overwrite semantics
    assert pq.pop() == (3, 1, 4.0)
    assert pq.pop() == (1, 0, 5.0)
    assert pq.pop() == (2, 0, 7.0)
    assert pq.pop() is None


def test_visited_once_per_level():
    v = HostVisitedSet()
    assert v.checkAndInsert(5, 0) is False
    assert v.checkAndInsert(5, 0) is True
    assert v.checkAndInsert(5, 1) is False
    assert len(v) == 2


def test_scored_set_once_only_and_order():
    s = HostScoredSet()
    s.insert(10, 2.0, "CC")
    s.insert(11, 1.0, "CO")
    s.insert(10, 99.0, "XX")  # insert-if-absent: ignored
    assert s.getScore(10) == 2.0
    assert len(s) == 2
    assert s.get_molecules() == [(10, 2.0, "CC"), (11, 1.0, "CO")]
    assert s.get_best_molecules(1) == [(11, 1.0, "CO")]
    assert list(s) == [(10, 2.0), (11, 1.0)]


def test_scored_set_save(tmp_path):
    s = HostScoredSet()
    s.insert(1, 1.5)
    s.insert(2, 2.5)
    p = tmp_path / "out.txt"
    s.save(str(p))
    assert p.read_text() == "1 1.5\n2 2.5\n"


# --------------------------------------------------------------------------
# shared fixture: a small graph + deterministic scoring table
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def setup():
    n = 150
    fps = random_fingerprints(n, n_bits=64, density=0.3, seed=5)
    graph = build_hnsw(fps, connectivity=4, expansion_add=20, seed=2)
    rng = np.random.default_rng(0)
    # distinct scores keyed by *user key* so host/device agree independent of
    # internal id permutation
    keys = np.asarray(graph.keys)
    table = {int(k): float(s) for k, s in
             zip(keys, rng.permutation(n).astype(float))}
    smiles_map = {int(k): f"SMI_{int(k)}" for k in keys}
    store = InMemorySmilesStore(smiles_map)

    def scoring_fn(smiles: str) -> float:
        return table[int(smiles.split("_")[1])]

    return graph, store, scoring_fn, table


def _run_host_engine(graph, store, scoring_fn, n_workers, n_to_score):
    service = LocalHNSWService(graph, store)
    coord = CoordinationService(service, worker_timeout=10,
                                heartbeat_interval=1)
    # prime exactly as the traverser does (rad/traverser.py:128-176)
    top = service.get_top_level_nodes()
    pairs = list(zip(top[0::2], top[1::2]))
    start_level = max(0, graph.max_level - 1)
    for nid, smi in pairs:
        score = scoring_fn(smi)
        coord.scored_set.insert(nid, score, smi)
        if not coord.visited_set.checkAndInsert(nid, start_level):
            coord.priority_queue.insert(nid, start_level, score)
    coord.start()
    pool = WorkerPool(coord, scoring_fn, n_workers=n_workers)
    pool.start_all()
    import time
    deadline = time.time() + 60
    while time.time() < deadline:
        done, reason = coord.check_termination(n_to_score=n_to_score)
        if done:
            break
        time.sleep(0.02)
    pool.stop_all()
    coord.shutdown()
    service.shutdown()
    return coord, reason


# --------------------------------------------------------------------------
# host engine
# --------------------------------------------------------------------------

def test_host_engine_basic(setup):
    graph, store, scoring_fn, table = setup
    coord, reason = _run_host_engine(graph, store, scoring_fn,
                                     n_workers=1, n_to_score=60)
    assert reason in ("n_to_score", "queue_empty")
    mols = coord.scored_set.get_molecules()
    assert len(mols) >= 60 or reason == "queue_empty"
    # no duplicate scoring (the reference's race regression,
    # tests/test_integration.py:157-161)
    ids = [m[0] for m in mols]
    assert len(ids) == len(set(ids))
    # scores match the deterministic table
    keys = np.asarray(graph.keys)
    for nid, score, smi in mols:
        assert score == table[int(keys[nid])]
        assert smi == f"SMI_{int(keys[nid])}"


def test_host_engine_multiworker_race_free(setup):
    graph, store, scoring_fn, table = setup
    coord, reason = _run_host_engine(graph, store, scoring_fn,
                                     n_workers=4, n_to_score=100)
    mols = coord.scored_set.get_molecules()
    ids = [m[0] for m in mols]
    assert len(ids) == len(set(ids)), "duplicate scoring under concurrency"
    assert len(ids) >= 100 or reason == "queue_empty"


def _reachable_from_seeds(graph):
    """Nodes reachable by the traversal: BFS over *out-edges* on every layer
    starting from the top-layer seed set, following descent (a node expanded
    at layer l is re-expanded at l-1)."""
    import collections
    seeds = range(graph.layer_sizes[graph.max_level])
    start_level = max(0, graph.max_level - 1)
    seen = set()
    scored = set(seeds)
    q = collections.deque((s, start_level) for s in seeds)
    tables = [np.asarray(t) for t in graph.neighbors]
    while q:
        u, l = q.popleft()
        if (u, l) in seen:
            continue
        seen.add((u, l))
        row = tables[l][u]
        for v in row[row >= 0]:
            scored.add(int(v))
            if (int(v), l) not in seen:
                q.append((int(v), l))
        if l > 0:
            q.append((u, l - 1))
    return scored


def test_host_engine_queue_empty_scores_reachable_set(setup):
    graph, store, scoring_fn, table = setup
    coord, reason = _run_host_engine(graph, store, scoring_fn,
                                     n_workers=2, n_to_score=10**9)
    assert reason == "queue_empty"
    reachable = _reachable_from_seeds(graph)
    assert len(reachable) >= len(graph) - 5  # sanity: nearly everything
    assert {m[0] for m in coord.scored_set.get_molecules()} == reachable


def test_worker_stats_and_heartbeat(setup):
    graph, store, scoring_fn, _ = setup
    service = LocalHNSWService(graph, store)
    coord = CoordinationService(service, heartbeat_interval=0.05)
    coord.start()
    w = ScoringWorker(coord, scoring_fn)
    w.start()
    import time
    time.sleep(0.3)
    assert coord.worker_heartbeat(w.worker_id) is True
    stats = coord.get_coordination_stats()
    assert stats["total_workers"] == 1
    w.stop()
    coord.shutdown()
    s = w.get_worker_stats()
    assert s["worker_id"] == w.worker_id
    assert not s["running"]


# --------------------------------------------------------------------------
# device engine
# --------------------------------------------------------------------------

def test_device_engine_basic(setup):
    graph, store, scoring_fn, table = setup
    tr = DeviceTraverser(graph, scoring_fn, store, batch_size=4,
                         frontier_capacity=1 << 12, n_score_threads=1)
    n_top = tr.prime()
    assert n_top == graph.layer_sizes[graph.max_level]
    stats = tr.traverse(n_to_score=60)
    assert stats["n_scored"] >= 60
    mols = tr.get_molecules()
    ids = [m[0] for m in mols]
    assert len(ids) == len(set(ids)), "duplicate scoring on device"
    keys = np.asarray(graph.keys)
    for nid, score, smi in mols:
        assert score == table[int(keys[nid])]
    best = tr.get_best_molecules(5)
    assert [m[1] for m in best] == sorted(m[1] for m in mols)[:5]
    tr.shutdown()


def test_device_engine_exhausts_graph(setup):
    graph, store, scoring_fn, _ = setup
    tr = DeviceTraverser(graph, scoring_fn, store, batch_size=8,
                         frontier_capacity=1 << 12, n_score_threads=1)
    tr.prime()
    stats = tr.traverse(n_to_score=10**9, timeout=120)
    assert stats["termination_reason"] == "queue_empty"
    reachable = _reachable_from_seeds(graph)
    assert {m[0] for m in tr.get_molecules()} == reachable
    assert int(tr.state.n_dropped) == 0
    tr.shutdown()


def test_device_matches_host_engine_order(setup):
    """batch=1 device traversal must reproduce the host engine's expansion
    semantics exactly: same scored set and same traversal order (ties are
    impossible — scores are a permutation)."""
    graph, store, scoring_fn, _ = setup
    coord, _ = _run_host_engine(graph, store, scoring_fn,
                                n_workers=1, n_to_score=10**9)
    host_mols = coord.scored_set.get_molecules()

    tr = DeviceTraverser(graph, scoring_fn, store, batch_size=1,
                         frontier_capacity=1 << 12, n_score_threads=1)
    tr.prime()
    tr.traverse(n_to_score=10**9, timeout=120)
    dev_mols = tr.get_molecules()
    tr.shutdown()

    assert len(host_mols) == len(dev_mols)
    # same global scored set with same scores
    assert {(m[0], m[1]) for m in host_mols} == \
        {(m[0], m[1]) for m in dev_mols}
    # same traversal (insertion) order
    assert [m[0] for m in host_mols] == [m[0] for m in dev_mols]


def test_single_layer_graph_traversal():
    """Degenerate graph where every node is on layer 0 (possible at small N
    or unlucky level sampling): prime seeds layer 0 directly."""
    import dataclasses as dc

    from rad_tpu.graph.storage import HNSWGraph
    from rad_tpu.fp.pack import popcount_rows_np

    fps = random_fingerprints(40, n_bits=64, density=0.3, seed=51)
    from rad_tpu.build.reference import build_hnsw
    g = build_hnsw(fps, connectivity=4, expansion_add=16, seed=0)
    if g.max_level != 0:
        # force a single-layer view of the same library
        g = HNSWGraph(packed=g.packed, popcounts=g.popcounts, keys=g.keys,
                      levels=np.zeros(len(g), np.int32),
                      neighbors=(np.asarray(g.neighbors[0]),),
                      ndim=g.ndim, connectivity=g.connectivity)
    assert g.max_level == 0
    store = InMemorySmilesStore({int(k): f"S_{int(k)}"
                                 for k in np.asarray(g.keys)})
    table = {int(k): float(i)
             for i, k in enumerate(np.asarray(g.keys))}
    tr = DeviceTraverser(g, lambda s: table[int(s.split("_")[1])], store,
                         batch_size=4, frontier_capacity=1 << 10,
                         n_score_threads=1)
    n_top = tr.prime()
    assert n_top == len(g)  # the whole library is the "top layer"
    stats = tr.traverse(n_to_score=10**9, timeout=60)
    assert stats["termination_reason"] == "queue_empty"
    ids = [m[0] for m in tr.get_molecules()]
    assert len(ids) == len(set(ids)) == len(g)
    tr.shutdown()


def test_device_prime_required(setup):
    graph, store, scoring_fn, _ = setup
    tr = DeviceTraverser(graph, scoring_fn, store)
    with pytest.raises(RuntimeError):
        tr.traverse(n_to_score=5)
    tr.shutdown()


@pytest.mark.slow
def test_order_log_incremental_drain():
    """read_order_log_since: a host polling between steps reconstructs the
    complete insertion order even when total scored exceeds the ring."""
    import jax.numpy as jnp

    from rad_tpu.build.reference import build_hnsw
    from rad_tpu.fp import random_fingerprints
    from rad_tpu.fp.pack import popcount_rows
    from rad_tpu.fp.tanimoto import tanimoto_matrix
    from rad_tpu.traverse import device as dev

    fps = random_fingerprints(500, n_bits=64, density=0.3, seed=17)
    graph = build_hnsw(fps, connectivity=4, expansion_add=24, seed=3)
    dg = dev.prepare_device_graph(graph)
    packed = jnp.asarray(np.asarray(graph.packed))
    pops = jnp.asarray(np.asarray(graph.popcounts))
    target = jnp.asarray(fps[42])
    t_pop = popcount_rows(target[None, :])[0]

    cap = 64  # tiny ring: total scored will lap it many times
    state = dev.init_state(dg, log_capacity=cap)
    n_top = graph.layer_sizes[graph.max_level]
    state = dev.prime(state, dg, jnp.arange(n_top, dtype=jnp.int32),
                      tanimoto_matrix(target[None, :], packed[:n_top])[0])

    seen = 0
    drained = []
    for _ in range(200):
        if dev.frontier_empty(state):
            break
        state = dev.fused_step(state, dg, packed, pops, target, t_pop,
                               batch=8)
        drained.extend(dev.read_order_log_since(state, seen).tolist())
        seen = int(state.n_scored)

    full = [int(i) for i in drained]
    # the first drain also picks up the primed seeds (positions [0, n_top))
    assert len(full) == int(state.n_scored)
    assert len(set(full)) == len(full), "drained ids must be unique"
    # overrun raises instead of silently losing entries
    with pytest.raises(RuntimeError):
        dev.read_order_log_since(state, 0)


@pytest.mark.slow
def test_frontier_live_counter_matches_scan():
    """The O(1) f_live counter is the termination signal; it must agree
    with the O(C) recount after prime, every step, and across merges."""
    import jax.numpy as jnp

    from rad_tpu.build.reference import build_hnsw
    from rad_tpu.fp import random_fingerprints
    from rad_tpu.fp.pack import popcount_rows
    from rad_tpu.fp.tanimoto import tanimoto_matrix
    from rad_tpu.traverse import device as dev

    fps = random_fingerprints(800, n_bits=64, density=0.3, seed=23)
    graph = build_hnsw(fps, connectivity=4, expansion_add=24, seed=5)
    dg = dev.prepare_device_graph(graph)
    packed = jnp.asarray(np.asarray(graph.packed))
    pops = jnp.asarray(np.asarray(graph.popcounts))
    target = jnp.asarray(fps[3])
    t_pop = popcount_rows(target[None, :])[0]

    # small buffer forces frequent merges; small frontier forces drops
    state = dev.init_state(dg, frontier_capacity=256, buffer_capacity=64)
    n_top = graph.layer_sizes[graph.max_level]
    state = dev.prime(state, dg, jnp.arange(n_top, dtype=jnp.int32),
                      tanimoto_matrix(target[None, :], packed[:n_top])[0])
    assert int(state.f_live) == int(dev.frontier_live_scan(state))

    for _ in range(120):
        if int(state.f_live) == 0:
            break
        state = dev.fused_step(state, dg, packed, pops, target, t_pop,
                               batch=8)
        assert int(state.f_live) == int(dev.frontier_live_scan(state))
    assert int(state.n_dropped) > 0, "test must cross the merge/drop path"
    assert int(state.f_live) == 0, "sweep must exhaust"


def test_prime_insert_if_absent():
    """prime() has integrate()'s once-only semantics (review r3s9):
    duplicate seed ids and re-primes of a live state must not
    double-count n_scored, duplicate the order log, or push a frontier
    row twice."""
    import jax.numpy as jnp

    from rad_tpu.traverse import device as dev

    fps = random_fingerprints(400, n_bits=128, density=0.25, seed=21)
    graph = build_hnsw(fps, connectivity=4, expansion_add=24, seed=2)
    dg = dev.prepare_device_graph(graph)
    n_top = graph.layer_sizes[graph.max_level]
    ids = np.arange(n_top, dtype=np.int32)
    dup_ids = jnp.asarray(np.concatenate([ids, ids, [-1]]).astype(np.int32))
    sc = np.linspace(0.1, 0.9, n_top).astype(np.float32)
    dup_sc = jnp.asarray(np.concatenate([sc, sc + 100.0, [0.0]])
                         .astype(np.float32))

    st = dev.init_state(dg, frontier_capacity=1 << 10, head_capacity=None)
    st = dev.prime(st, dg, dup_ids, dup_sc)
    assert int(st.n_scored) == n_top                 # uniques only
    log = np.asarray(st.order_log)[:n_top]
    assert sorted(log.tolist()) == ids.tolist()      # no duplicates
    np.testing.assert_allclose(np.asarray(st.scores)[:n_top], sc)
    assert int(st.f_live) == n_top                   # one push per row

    # re-prime of a live state is a no-op
    st2 = dev.prime(st, dg, jnp.asarray(ids), jnp.asarray(sc))
    assert int(st2.n_scored) == n_top
    assert int(st2.f_live) == int(st.f_live)

    # reference state primed once with the clean list agrees exactly
    ref = dev.init_state(dg, frontier_capacity=1 << 10, head_capacity=None)
    ref = dev.prime(ref, dg, jnp.asarray(ids), jnp.asarray(sc))
    np.testing.assert_array_equal(np.asarray(st.f_score),
                                  np.asarray(ref.f_score))
    np.testing.assert_array_equal(np.asarray(st.f_row),
                                  np.asarray(ref.f_row))


@pytest.mark.slow
def test_prime_midrun_two_level_invariant():
    """A mid-run prime on a two-level frontier folds the append buffer
    into the re-sort (review r3s9): afterwards the buffer is empty and
    every live head entry is <= watermark <= every cold entry — the
    invariant that makes batched pops globally exact."""
    import jax.numpy as jnp

    from rad_tpu.traverse import device as dev

    fps = random_fingerprints(600, n_bits=128, density=0.25, seed=22)
    graph = build_hnsw(fps, connectivity=4, expansion_add=24, seed=3)
    dg = dev.prepare_device_graph(graph)
    n_top = graph.layer_sizes[graph.max_level]
    ids = jnp.arange(n_top, dtype=jnp.int32)

    # tiny head forces spills; run some steps so the buffer holds entries
    st = dev.init_state(dg, frontier_capacity=1 << 8,
                        buffer_capacity=1 << 6, head_capacity=1 << 4)
    target = jnp.asarray(random_fingerprints(1, 128, 0.25, seed=23)[0])
    from rad_tpu.fp.pack import popcount_rows
    t_pop = popcount_rows(target[None, :])[0]
    packed = jnp.asarray(np.asarray(graph.packed))
    pops = jnp.asarray(np.asarray(graph.popcounts))
    from rad_tpu.parallel.sharded import tanimoto_to_target_scorer
    seed_scores = tanimoto_to_target_scorer(
        packed[:n_top], pops[:n_top], target, t_pop).astype(jnp.float32)
    st = dev.prime(st, dg, ids, seed_scores)
    for _ in range(12):
        st = dev.fused_step(st, dg, packed, pops, target, t_pop, batch=4)
        if int(st.f_buf_n) > 0:
            break
    assert int(st.f_buf_n) > 0, "test needs live buffer entries at prime"

    # mid-run re-prime (seen seeds no-op; the buffer fold still runs)
    st2 = dev.prime(st, dg, ids, seed_scores * 0.5)
    assert int(st2.f_buf_n) == 0
    assert np.all(np.isinf(np.asarray(st2.f_buf_score)))
    c = st2.f_score.shape[0]
    live = np.arange(c) >= int(st2.f_cursor)
    head = np.asarray(st2.f_score)[live]
    head = head[np.isfinite(head)]
    wm = float(st2.watermark)
    cold = np.asarray(st2.cold_score)[: int(st2.cold_n)]
    if head.size and np.isfinite(wm):
        assert head.max() <= wm + 1e-7
    if cold.size and np.isfinite(wm):
        assert cold.min() >= wm - 1e-7
