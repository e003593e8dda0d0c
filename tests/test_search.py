"""Device kNN search tests: parity with the host oracle + recall."""

import numpy as np
import pytest

from rad_tpu.build.reference import build_hnsw, search_hnsw
from rad_tpu.fp import random_fingerprints, tanimoto_matrix
from rad_tpu.search.knn import search_device

import jax.numpy as jnp


@pytest.fixture(scope="module")
def built():
    fps = random_fingerprints(400, n_bits=256, density=0.2, seed=21)
    graph = build_hnsw(fps, connectivity=8, expansion_add=60, seed=3)
    queries = random_fingerprints(16, n_bits=256, density=0.2, seed=77)
    return graph, queries


def test_device_search_self_query(built):
    graph, _ = built
    q = np.asarray(graph.packed)[[7, 100, 399]]
    d, ids = search_device(graph, q, k=1, expansion_search=32)
    d, ids = np.asarray(d), np.asarray(ids)
    assert (d[:, 0] == 0).all()
    assert ids[:, 0].tolist() == [7, 100, 399]


def test_device_search_recall(built):
    graph, queries = built
    d, ids = search_device(graph, queries, k=10, expansion_search=128)
    ids = np.asarray(ids)
    full = np.asarray(tanimoto_matrix(
        jnp.asarray(queries), jnp.asarray(np.asarray(graph.packed))))
    true_ids = np.argsort(full, axis=1, kind="stable")[:, :10]
    recall = np.mean([
        len(set(ids[i].tolist()) & set(true_ids[i].tolist())) / 10
        for i in range(len(queries))
    ])
    assert recall >= 0.85, f"device recall@10 = {recall}"


def test_device_search_results_sorted_and_valid(built):
    graph, queries = built
    d, ids = search_device(graph, queries, k=10, expansion_search=64)
    d, ids = np.asarray(d), np.asarray(ids)
    assert (np.diff(d, axis=1) >= -1e-6).all(), "distances must be ascending"
    assert (ids >= 0).all() and (ids < len(graph)).all()
    # distances are honest: recompute
    packed = np.asarray(graph.packed)
    for i in range(3):
        recomputed = np.asarray(tanimoto_matrix(
            jnp.asarray(queries[i:i+1]), jnp.asarray(packed[ids[i]])))[0]
        np.testing.assert_allclose(d[i], recomputed, atol=1e-6)


def test_device_matches_host_oracle_quality(built):
    """Device beam and host beam find results of equivalent quality."""
    graph, queries = built
    d_dev, _ = search_device(graph, queries, k=5, expansion_search=64)
    d_host, _ = search_hnsw(graph, queries, k=5, expansion_search=64)
    # mean top-5 distance within noise of each other
    assert abs(float(np.mean(np.asarray(d_dev))) -
               float(np.mean(d_host))) < 0.02
