"""True incremental insertion (usearch Index.add mechanism parity).

insert_into_graph renumbers ids (level-sorted invariant) and runs an O(K)
device insert pass against the existing graph; these tests pin graph
validity, key stability, searchability of both old and new rows, recall
parity with a full rebuild, and determinism.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rad_tpu.api.index import HNSWIndex
from rad_tpu.build.incremental import insert_into_graph
from rad_tpu.build.reference import build_hnsw
from rad_tpu.fp import random_fingerprints, tanimoto_matrix
from rad_tpu.search.knn import search_device


@pytest.fixture(scope="module")
def fps():
    return random_fingerprints(600, n_bits=256, density=0.2, seed=17)


@pytest.fixture(scope="module")
def inc_graph(fps):
    base = build_hnsw(fps[:500], connectivity=8, expansion_add=48, seed=3)
    return insert_into_graph(base, fps[500:],
                             new_keys=np.arange(500, 600),
                             expansion_add=48, seed=5, batch_size=32)


def test_incremental_graph_valid(inc_graph, fps):
    g = inc_graph
    assert len(g) == 600
    levels = np.asarray(g.levels)
    assert (np.diff(levels) <= 0).all()
    for l, t in enumerate(g.neighbors):
        t = np.asarray(t)
        valid = t[t >= 0]
        assert (valid < g.layer_sizes[l]).all()
        assert (t != np.arange(t.shape[0])[:, None]).all(), "self loops"
    keys = np.asarray(g.keys)
    assert sorted(keys.tolist()) == list(range(600))
    np.testing.assert_array_equal(np.asarray(g.packed), fps[keys])


def test_incremental_new_nodes_linked(inc_graph):
    g = inc_graph
    keys = np.asarray(g.keys)
    t0 = np.asarray(g.neighbors[0])
    new_deg = (t0[keys >= 500] >= 0).sum(axis=1)
    assert (new_deg > 0).all()
    assert new_deg.mean() >= g.connectivity


@pytest.mark.slow
def test_incremental_recall_parity(inc_graph, fps):
    queries = random_fingerprints(24, n_bits=256, density=0.2, seed=71)

    def recall(graph):
        full = np.asarray(tanimoto_matrix(
            jnp.asarray(queries), jnp.asarray(np.asarray(graph.packed))))
        truth = [set(np.argsort(full[i], kind="stable")[:10].tolist())
                 for i in range(24)]
        _, ids = search_device(graph, queries, k=10, expansion_search=128)
        ids = np.asarray(ids)
        return np.mean([len(set(ids[i].tolist()) & truth[i]) / 10
                        for i in range(24)])

    mono = build_hnsw(fps, connectivity=8, expansion_add=48, seed=3)
    r_inc, r_mono = recall(inc_graph), recall(mono)
    # measured: 0.99 vs 1.00
    assert r_inc >= r_mono - 0.05, f"rebuild={r_mono} incremental={r_inc}"


@pytest.mark.slow
def test_incremental_deterministic(fps):
    base = build_hnsw(fps[:200], connectivity=6, expansion_add=24, seed=3)
    kw = dict(new_keys=np.arange(200, 260), expansion_add=24, seed=9,
              batch_size=16)
    g1 = insert_into_graph(base, fps[200:260], **kw)
    g2 = insert_into_graph(base, fps[200:260], **kw)
    for a, b in zip(g1.neighbors, g2.neighbors):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_incremental_duplicate_key_rejected(fps):
    base = build_hnsw(fps[:100], connectivity=6, expansion_add=24, seed=3)
    with pytest.raises(ValueError, match="duplicate"):
        insert_into_graph(base, fps[100:110],
                          new_keys=np.arange(10))  # collide with 0..99


@pytest.mark.slow
def test_index_insert_api(fps):
    idx = HNSWIndex(ndim=256, connectivity=6, expansion_add=24,
                    backend="host", seed=0)
    idx.add(np.arange(150), fps[:150])
    idx.build()
    idx.insert(np.arange(500, 520), fps[150:170], batch_size=16)
    assert len(idx) == 170
    # both old and new rows searchable by self-query
    d, keys = idx.search(fps[:3], k=1)
    assert (np.asarray(d)[:, 0] == 0).all()
    d, keys = idx.search(fps[150:153], k=1)
    assert (np.asarray(d)[:, 0] == 0).all()
    assert set(np.asarray(keys)[:, 0].tolist()) <= set(range(500, 520))
    # id/key round trip survives the renumbering
    ids = idx.get_node_ids_from_keys([500, 519, 0])
    got = np.asarray(idx.graph.keys)[ids]
    np.testing.assert_array_equal(got, [500, 519, 0])
    # a later add() still keeps everything (rebuild path)
    idx.add(np.arange(900, 910), fps[170:180])
    assert len(idx) == 180
    assert len(idx.graph) == 180


def test_incremental_key_length_mismatch_rejected(fps):
    """ADVICE r2: a keys array whose length disagrees with the fingerprint
    count raises instead of silently truncating."""
    base = build_hnsw(fps[:100], connectivity=4, expansion_add=20, seed=1)
    with pytest.raises(ValueError, match="mismatched lengths"):
        insert_into_graph(base, fps[100:110],
                          new_keys=np.arange(5000, 5020),
                          expansion_add=20)
