"""Top-level API tests: HNSWIndex facade + RADTraverser lifecycle.

Mirrors the reference's integration-test strategy
(tests/test_integration.py: full prime+traverse on a small random index,
single & multi worker, both termination conditions, duplicate-scoring
regression; tests/test_redis_auth.py MockHNSW patterns)."""

import numpy as np
import pytest

import rad_tpu
from rad_tpu import HNSWIndex, RADTraverser
from rad_tpu.api.factories import (
    create_distributed_traverser,
    create_local_traverser,
)
from rad_tpu.fp import random_fingerprints, unpack_fingerprints
from rad_tpu.store.smiles_store import InMemorySmilesStore


@pytest.fixture(scope="module")
def index():
    idx = HNSWIndex(ndim=64, connectivity=4, expansion_add=20,
                    backend="host", seed=0)
    fps = random_fingerprints(120, n_bits=64, density=0.3, seed=9)
    keys = np.arange(1000, 1000 + 120)  # non-trivial user keys
    idx.add(keys, fps)
    idx.build()
    return idx


@pytest.fixture(scope="module")
def scoring_setup(index):
    keys = np.asarray(index.graph.keys)
    rng = np.random.default_rng(4)
    table = {int(k): float(s)
             for k, s in zip(keys, rng.permutation(len(keys)).astype(float))}
    store = InMemorySmilesStore({int(k): f"MOL_{int(k)}" for k in keys})

    def scoring_fn(smiles):
        return table[int(smiles.split("_")[1])]

    return store, scoring_fn, table


def test_index_add_build_properties(index):
    assert len(index) == 120
    assert index.size == 120
    assert index.connectivity == 4
    assert index.dtype == "b1"
    assert index.max_level >= 1
    assert index.memory_usage > 0
    stats = index.levels_stats
    assert stats[0].nodes == 120


def test_index_accepts_unpacked_bits():
    idx = HNSWIndex(ndim=64, connectivity=4, expansion_add=10, backend="host")
    fps = random_fingerprints(30, n_bits=64, seed=1)
    bits = unpack_fingerprints(fps)
    idx.add(np.arange(30), bits)
    assert len(idx.graph) == 30


def test_index_search_returns_keys(index):
    packed = np.asarray(index.graph.packed)
    d, keys = index.search(packed[[5]], k=3, expansion_search=32)
    assert d[0, 0] == 0
    assert int(keys[0, 0]) == int(np.asarray(index.graph.keys)[5])


def test_index_search_exact(index):
    packed = np.asarray(index.graph.packed)
    d, keys = index.search(packed[[5]], k=3, exact=True)
    assert d[0, 0] == 0


def test_index_save_load_roundtrip(tmp_path, index):
    p = str(tmp_path / "idx.npz")
    index.save(p)
    loaded = HNSWIndex.load(p, view=True)
    assert len(loaded) == len(index)
    assert loaded.max_level == index.max_level
    d, keys = loaded.search(np.asarray(index.graph.packed)[[3]], k=1)
    assert d[0, 0] == 0


def test_index_fork_api(index):
    top = index.get_top_level_nodes()
    assert len(top) >= 2
    nbrs = index.get_neighbors(0, 0)
    assert len(nbrs) % 2 == 0
    keys = np.asarray(index.graph.keys)[[3, 7]].tolist()
    assert index.get_node_ids_from_keys(keys) == [3, 7]


def test_index_duplicate_keys_rejected():
    idx = HNSWIndex(ndim=64, connectivity=4, backend="host")
    fps = random_fingerprints(4, n_bits=64)
    idx.add([1, 1, 2, 3], fps)
    with pytest.raises(ValueError):
        idx.build()


# --------------------------------------------------------------------------
# RADTraverser lifecycle — local (device engine)
# --------------------------------------------------------------------------

def test_local_traverser_lifecycle(index, scoring_setup):
    store, scoring_fn, table = scoring_setup
    t = create_local_traverser(index, scoring_fn, smiles_store=store,
                               batch_size=4, n_score_threads=1)
    assert t.engine == "device"
    t.prime()
    stats = t.traverse(n_to_score=50)
    assert stats["n_scored"] >= 50
    mols = t.get_molecules()
    ids = [m[0] for m in mols]
    assert len(ids) == len(set(ids))  # race regression parity
    best = t.get_best_molecules(10)
    assert [m[1] for m in best] == sorted(m[1] for m in mols)[:10]
    # state property views
    assert len(t.scored_set) == len(mols)
    assert len(t.visited_set) > 0
    assert t.scored_set.getScore(ids[0]) == mols[0][1]
    tstats = t.get_traversal_stats()
    assert tstats["engine"] == "device"
    assert tstats["n_scored"] == len(mols)
    t.shutdown()
    with pytest.raises(RuntimeError):
        t.prime()


def test_traverser_requires_prime(index, scoring_setup):
    store, scoring_fn, _ = scoring_setup
    t = create_local_traverser(index, scoring_fn, smiles_store=store)
    with pytest.raises(RuntimeError):
        t.traverse(n_to_score=5)
    t.shutdown()


def test_traverser_requires_termination_condition(index, scoring_setup):
    store, scoring_fn, _ = scoring_setup
    t = create_local_traverser(index, scoring_fn, smiles_store=store)
    t.prime()
    with pytest.raises(ValueError):
        t.traverse()
    t.shutdown()


def test_traverser_requires_scoring_fn(index):
    with pytest.raises(ValueError):
        RADTraverser(graph=index.graph, scoring_fn=None)


def test_timeout_termination(index, scoring_setup):
    store, scoring_fn, _ = scoring_setup
    import time

    def slow_fn(smiles):
        time.sleep(0.05)
        return scoring_fn(smiles)

    t = create_local_traverser(index, slow_fn, smiles_store=store,
                               batch_size=2, n_score_threads=1)
    t.prime()
    stats = t.traverse(timeout=0.5)
    assert stats["termination_reason"] == "timeout"
    t.shutdown()


# --------------------------------------------------------------------------
# RADTraverser — distributed (host engine, worker pool)
# --------------------------------------------------------------------------

def test_distributed_traverser_multiworker(index, scoring_setup):
    store, scoring_fn, table = scoring_setup
    t = create_distributed_traverser(index, scoring_fn, smiles_store=store,
                                     heartbeat_interval=0.2)
    assert t.engine == "host"
    t.prime()
    stats = t.traverse(n_workers=3, n_to_score=60, poll_interval=0.02)
    assert stats["n_scored"] >= 60 or stats["termination_reason"] == "queue_empty"
    mols = t.get_molecules()
    ids = [m[0] for m in mols]
    assert len(ids) == len(set(ids)), "duplicate scoring under 3 workers"
    keys = np.asarray(index.graph.keys)
    for nid, score, smi in mols:
        assert score == table[int(keys[nid])]
    t.shutdown()


def test_device_and_host_modes_agree(index, scoring_setup):
    store, scoring_fn, _ = scoring_setup
    t1 = create_local_traverser(index, scoring_fn, smiles_store=store,
                                batch_size=1, n_score_threads=1)
    t1.prime()
    t1.traverse(n_to_score=10**9, timeout=60)
    dev_mols = t1.get_molecules()
    t1.shutdown()

    t2 = create_distributed_traverser(index, scoring_fn, smiles_store=store)
    t2.prime()
    t2.traverse(n_workers=1, n_to_score=10**9, poll_interval=0.02)
    host_mols = t2.get_molecules()
    t2.shutdown()

    assert [m[0] for m in dev_mols] == [m[0] for m in host_mols]
    assert {m[:2] for m in dev_mols} == {m[:2] for m in host_mols}


def test_traverse_resumable_in_session(index, scoring_setup):
    """Calling traverse() again continues from the current frontier (the
    analogue of re-attaching to a Redis namespace mid-run)."""
    store, scoring_fn, _ = scoring_setup
    t = create_local_traverser(index, scoring_fn, smiles_store=store,
                               batch_size=4, n_score_threads=1)
    t.prime()
    t.traverse(n_to_score=30)
    first = len(t.scored_set)
    assert first >= 30
    t.traverse(n_to_score=60)
    second = len(t.scored_set)
    assert second >= 60 > first - 10
    ids = [m[0] for m in t.get_molecules()]
    assert len(ids) == len(set(ids))
    t.shutdown()


def test_lazy_top_level_imports():
    assert rad_tpu.HNSWIndex is HNSWIndex
    assert callable(rad_tpu.create_remote_traverser)


def test_add_after_build_rebuilds():
    """usearch Index.add semantics on a built index: append triggers a
    rebuild that keeps the old rows (reference README.md:58)."""
    idx = HNSWIndex(ndim=64, connectivity=4, expansion_add=20,
                    backend="host", seed=0)
    fps = random_fingerprints(80, n_bits=64, density=0.3, seed=9)
    idx.add(np.arange(80), fps)
    idx.build()
    more = random_fingerprints(20, n_bits=64, density=0.3, seed=10)
    idx.add(np.arange(100, 120), more)
    assert len(idx) == 100
    g = idx.graph  # implicit rebuild
    assert len(g) == 100
    # the appended vectors are searchable: self-query hits the new key
    d, keys = idx.search(more[:3], k=1)
    assert (np.asarray(d)[:, 0] == 0).all()
    assert set(np.asarray(keys)[:, 0]) <= set(range(100, 120))


def test_add_after_load_keeps_loaded_rows(tmp_path):
    """Appending to an index loaded from disk must not drop the loaded
    library (the graph came with no pending rows)."""
    idx = HNSWIndex(ndim=64, connectivity=4, expansion_add=20,
                    backend="host", seed=0)
    fps = random_fingerprints(60, n_bits=64, density=0.3, seed=11)
    idx.add(np.arange(60), fps)
    idx.save(str(tmp_path / "g.npz"))

    idx2 = HNSWIndex.load(str(tmp_path / "g.npz"), backend="host")
    more = random_fingerprints(10, n_bits=64, density=0.3, seed=12)
    idx2.add(np.arange(100, 110), more)
    assert len(idx2) == 70
    d, keys = idx2.search(fps[:3], k=1)
    assert (np.asarray(d)[:, 0] == 0).all()
    assert set(np.asarray(keys)[:, 0]) <= set(range(60))


def test_index_accepts_packbits_rows():
    """Migration path: np.packbits [N, ndim/8] uint8 fingerprints — the
    layout reference/usearch pipelines hold (reference README.md:58-63) —
    build the identical graph and serve queries in the same layout."""
    rng = np.random.default_rng(11)
    bits = (rng.random((96, 64)) < 0.3).astype(np.uint8)
    keys = np.arange(96)

    idx_u32 = HNSWIndex(ndim=64, connectivity=4, expansion_add=20,
                        backend="host", seed=0)
    from rad_tpu.fp.pack import pack_fingerprints
    idx_u32.add(keys, pack_fingerprints(bits))
    idx_u32.build()

    idx_pb = HNSWIndex(ndim=64, connectivity=4, expansion_add=20,
                       backend="host", seed=0)
    idx_pb.add(keys, np.packbits(bits, axis=1))
    idx_pb.build()

    np.testing.assert_array_equal(np.asarray(idx_u32.graph.packed),
                                  np.asarray(idx_pb.graph.packed))
    for l, (a, b) in enumerate(zip(idx_u32.graph.neighbors,
                                   idx_pb.graph.neighbors)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    d1, k1 = idx_u32.search(pack_fingerprints(bits[:5]), k=3, exact=True)
    d2, k2 = idx_pb.search(np.packbits(bits[:5], axis=1), k=3, exact=True)
    np.testing.assert_array_equal(k1, k2)
    np.testing.assert_allclose(d1, d2)


def test_host_traverse_resumable_in_session(index, scoring_setup):
    """Second traverse() on the HOST engine continues the campaign: the
    coordinator's sticky termination verdict and timeout epoch are reset
    per round (regression: a second call instantly returned the first
    round's 'n_to_score' with nothing new scored)."""
    store, scoring_fn, _ = scoring_setup
    t = create_distributed_traverser(index, scoring_fn, smiles_store=store)
    t.prime()
    t.traverse(n_workers=1, n_to_score=20, poll_interval=0.02)
    first = len(t.scored_set)
    assert first >= 20
    stats = t.traverse(n_workers=1, n_to_score=first + 20,
                       poll_interval=0.02)
    second = len(t.scored_set)
    # the regression symptom: round 2 returns instantly with round 1's
    # 'n_to_score' verdict and nothing new scored. (A fast round 1 may
    # have overshot and drained the whole 120-node library — then
    # 'queue_empty' with no growth is the correct outcome.)
    if stats["termination_reason"] == "n_to_score":
        assert second >= first + 20
    else:
        assert stats["termination_reason"] == "queue_empty"
    t.shutdown()


def test_factory_n_workers_is_traverse_default(index, scoring_setup):
    """create_distributed_traverser(n_workers=N) seeds the pool size used
    when traverse() is not given one (regression: silently dropped)."""
    store, scoring_fn, _ = scoring_setup
    t = create_distributed_traverser(index, scoring_fn, n_workers=3,
                                     smiles_store=store)
    assert t._default_n_workers == 3
    t.prime()
    t.traverse(n_to_score=30, poll_interval=0.02)
    assert len(t._pool.workers) == 3
    # an explicit traverse() argument still wins
    t.traverse(n_workers=2, n_to_score=len(t.scored_set) + 5,
               poll_interval=0.02)
    assert len(t._pool.workers) == 2
    t.shutdown()


def test_api_subpackage_exports_pod_factory():
    """rad_tpu.api exports all four factories (create_pod_traverser was
    importable from rad_tpu but not rad_tpu.api)."""
    from rad_tpu.api import create_pod_traverser as f1
    from rad_tpu import create_pod_traverser as f2
    assert f1 is f2
