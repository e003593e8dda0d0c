"""Bounded visited hash set (rad_tpu.search.visited).

Pins the properties the beam engines rely on:
- membership is exact on hit (no false positives ever);
- inserts are idempotent and order-independent (max-combine scatter);
- overflow fails open (unmarked, never corrupts existing entries);
- the searches built on it keep their recall (vs the dense-visited
  behavior they replaced) while batch memory is independent of N.
"""

import jax.numpy as jnp
import numpy as np

import pytest

from rad_tpu.search.visited import (hashset_check_insert,
                                    hashset_check_insert_batch,
                                    hashset_init, visited_capacity_for)


def test_check_insert_basic():
    t = hashset_init(64)
    ids = jnp.array([5, 9, 5, 700], jnp.int32)
    valid = jnp.array([True, True, True, False])
    t, seen = hashset_check_insert(t, ids, valid)
    # nothing present before the first call; invalid lanes never "seen"
    assert not bool(seen.any())
    t2, seen2 = hashset_check_insert(t, ids, valid)
    np.testing.assert_array_equal(np.asarray(seen2), [True, True, True,
                                                      False])
    # re-insert of present ids is a no-op (same valid mask)
    np.testing.assert_array_equal(np.asarray(t), np.asarray(t2))


def test_no_false_positives_dense_fill():
    # fill half the table with random ids; everything NOT inserted must
    # report unseen (exact id comparison, unlike a bloom filter)
    rng = np.random.default_rng(0)
    cap = 256
    t = hashset_init(cap)
    inserted = rng.choice(10_000, size=cap // 2, replace=False).astype(
        np.int32)
    for lo in range(0, inserted.size, 32):
        chunk = jnp.asarray(inserted[lo:lo + 32])
        t, _ = hashset_check_insert(t, chunk, jnp.ones(chunk.shape, bool))
    others = np.setdiff1d(np.arange(10_000, 20_000, dtype=np.int32),
                          inserted)[:64]
    _, seen = hashset_check_insert(t, jnp.asarray(others),
                                   jnp.ones(64, bool))
    assert not bool(seen.any())
    # membership of inserted ids is best-effort (probe-depth overflow fails
    # open), but at 50% load the hit rate must stay high
    _, seen_in = hashset_check_insert(t, jnp.asarray(inserted),
                                      jnp.ones(inserted.size, bool))
    assert float(np.mean(np.asarray(seen_in))) >= 0.9


def test_overflow_fails_open():
    # tiny table, many ids: inserts past capacity are dropped (ids stay
    # unmarked = revisit allowed), but previously-inserted ids stay marked
    cap = 16
    t = hashset_init(cap)
    first = jnp.arange(0, 8, dtype=jnp.int32)
    t, _ = hashset_check_insert(t, first, jnp.ones(8, bool))
    flood = jnp.arange(100, 400, 3, dtype=jnp.int32)
    t, _ = hashset_check_insert(t, flood, jnp.ones(flood.shape[0], bool))
    _, seen = hashset_check_insert(t, first, jnp.ones(8, bool))
    assert bool(seen.all()), "existing entries must survive overflow"


def test_batched_matches_single():
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 1000, size=(4, 16)).astype(np.int32)
    valid = rng.random((4, 16)) < 0.8
    tb = jnp.full((4, 128), -1, jnp.int32)
    tb, seen_b = hashset_check_insert_batch(tb, jnp.asarray(ids),
                                            jnp.asarray(valid))
    for r in range(4):
        t = hashset_init(128)
        t, seen = hashset_check_insert(t, jnp.asarray(ids[r]),
                                       jnp.asarray(valid[r]))
        np.testing.assert_array_equal(np.asarray(seen),
                                      np.asarray(seen_b[r]))
        np.testing.assert_array_equal(np.asarray(t), np.asarray(tb[r]))


def test_capacity_helper():
    cap = visited_capacity_for(64, 32)
    assert cap & (cap - 1) == 0
    assert cap >= 4 * 64 * 32  # ≥ the expected visit count (4·ef·M0)


def _built(n=2000):
    from rad_tpu.build.reference import build_hnsw
    from rad_tpu.fp import random_fingerprints

    fps = random_fingerprints(n, n_bits=256, density=0.2, seed=7)
    graph = build_hnsw(fps, connectivity=8, expansion_add=64, seed=0)
    queries = np.asarray(random_fingerprints(16, n_bits=256, density=0.2,
                                             seed=8))
    return graph, queries


@pytest.mark.slow
def test_search_recall_with_bounded_visited():
    """End-to-end: device search recall with the hash-table visited holds
    against the brute-force top-k (the regime the dense [B,N] visited used
    to serve)."""
    from rad_tpu.fp.tanimoto import tanimoto_matrix
    from rad_tpu.search.knn import search_device

    graph, queries = _built()
    d, ids = search_device(graph, queries, k=10, expansion_search=128)
    exact = np.asarray(tanimoto_matrix(jnp.asarray(queries), graph.packed))
    hits = 0
    for qi in range(16):
        true_top = set(np.argsort(exact[qi], kind="stable")[:10].tolist())
        hits += len(true_top & set(np.asarray(ids[qi]).tolist()))
    recall = hits / (16 * 10)
    assert recall >= 0.85, f"recall {recall:.2f} with bounded visited"


def test_search_survives_tiny_visited_capacity():
    """Fail-open under heavy overflow: a deliberately undersized table must
    still terminate (iteration cap) and return valid, sorted, honest
    results — recall may drop, correctness may not."""
    from rad_tpu.search.knn import search_device

    graph, queries = _built(n=500)
    d, ids = search_device(graph, queries, k=5, expansion_search=32,
                           visited_capacity=64)
    d, ids = np.asarray(d), np.asarray(ids)
    assert (np.diff(d, axis=1) >= -1e-6).all()
    assert (ids >= 0).all() and (ids < len(graph)).all()
    assert len({tuple(r) for r in ids}) > 1  # not degenerate


@pytest.mark.slow
def test_device_build_hash_path_matches_dense(monkeypatch):
    """Force the builder's hash-visited path at test scale: the built graph
    must deliver the same search recall as the dense-visited build (the
    gate changes memory, not semantics)."""
    from rad_tpu.build.device import build_hnsw_device
    from rad_tpu.fp import random_fingerprints
    from rad_tpu.fp.tanimoto import tanimoto_matrix
    from rad_tpu.search.knn import search_device
    import rad_tpu.search.visited as vis

    fps = random_fingerprints(1500, n_bits=128, density=0.25, seed=21)

    g_dense = build_hnsw_device(fps, connectivity=6, expansion_add=32,
                                seed=0, batch_size=64)
    monkeypatch.setattr(vis, "DENSE_VISITED_BUDGET", 0)
    g_hash = build_hnsw_device(fps, connectivity=6, expansion_add=32,
                               seed=0, batch_size=64)
    monkeypatch.undo()

    queries = np.asarray(random_fingerprints(16, n_bits=128, density=0.25,
                                             seed=22))

    def recall(graph):
        d, ids = search_device(graph, queries, k=10, expansion_search=64)
        exact = np.asarray(tanimoto_matrix(jnp.asarray(queries),
                                           graph.packed))
        hits = 0
        for qi in range(16):
            top = set(np.argsort(exact[qi], kind="stable")[:10].tolist())
            hits += len(top & set(np.asarray(ids[qi]).tolist()))
        return hits / 160

    r_dense, r_hash = recall(g_dense), recall(g_hash)
    assert r_hash >= r_dense - 0.05, (r_dense, r_hash)
