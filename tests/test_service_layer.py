"""Service-layer tests: registry, local service contract, MockHNSW stub.

Mirrors the reference's service-layer strategy: the [id, smiles, ...] pair
format with/without a DB (tests/test_service_layer_smiles.py:150-190), the
registry + factories (tests/test_hnsw_service.py), and the MockHNSW
pure-python stub pattern (tests/test_redis_auth.py:24-43) for exercising
the traverser without any real graph."""

import threading

import numpy as np
import pytest

from rad_tpu.api.traverser import RADTraverser
from rad_tpu.build.reference import build_hnsw
from rad_tpu.fp import random_fingerprints
from rad_tpu.service.base import HNSWService
from rad_tpu.service.local import LocalHNSWService
from rad_tpu.service.registry import (
    ServiceRegistry,
    create_local_hnsw_service,
    get_default_registry,
)
from rad_tpu.store.smiles_store import InMemorySmilesStore


@pytest.fixture(scope="module")
def graph():
    fps = random_fingerprints(80, n_bits=64, density=0.3, seed=37)
    return build_hnsw(fps, connectivity=4, expansion_add=16, seed=2)


class MockHNSW(HNSWService):
    """Canned-response stub (pattern parity with the reference's MockHNSW):
    a 4-node star graph on one level."""

    def __init__(self):
        self.calls = []

    def get_neighbors(self, node_id, level):
        self.calls.append(("neighbors", node_id, level))
        nbrs = {0: [1, "S1", 2, "S2", 3, "S3"],
                1: [0, "S0"], 2: [0, "S0"], 3: [0, "S0"]}
        return nbrs[node_id]

    def get_top_level_nodes(self):
        return [0, "S0"]

    def is_healthy(self):
        return True

    def shutdown(self):
        pass

    def get_service_info(self):
        return {"service_type": "mock"}

    def get_hnsw_info(self):
        return {"max_level": 1, "size": 4, "connectivity": 3, "ndim": 64}


def test_local_service_pair_format(graph):
    keys = np.asarray(graph.keys)
    store = InMemorySmilesStore({int(k): f"X_{int(k)}" for k in keys})
    svc = LocalHNSWService(graph, store)
    out = svc.get_neighbors(0, 0)
    assert all(out[i + 1] == f"X_{int(keys[out[i]])}"
               for i in range(0, len(out), 2))
    svc.shutdown()


def test_local_service_empty_smiles_without_db(graph):
    """Empty-SMILES contract when no store is attached
    (reference tests/test_service_layer_smiles.py:150-190)."""
    svc = LocalHNSWService(graph, None)
    out = svc.get_neighbors(0, 0)
    assert all(s == "" for s in out[1::2])
    top = svc.get_top_level_nodes()
    assert all(s == "" for s in top[1::2])
    svc.shutdown()


def test_service_post_shutdown_errors(graph):
    svc = LocalHNSWService(graph)
    svc.shutdown()
    assert not svc.is_healthy()
    with pytest.raises(RuntimeError):
        svc.get_neighbors(0, 0)
    with pytest.raises(RuntimeError):
        svc.get_hnsw_info()


def test_service_metrics_and_info(graph):
    svc = LocalHNSWService(graph)
    for _ in range(5):
        svc.get_top_level_nodes()
    info = svc.get_service_info()
    assert info["request_count"] == 5
    assert info["service_type"] == "local"
    hinfo = svc.get_hnsw_info()
    assert hinfo["size"] == len(graph)
    svc.shutdown()


def test_concurrent_requests_single_service(graph):
    """5 threads x 10 requests through one service
    (reference tests/test_hnsw_service.py:57-113)."""
    svc = LocalHNSWService(graph)
    errors = []

    def hammer():
        try:
            for _ in range(10):
                out = svc.get_neighbors(0, 0)
                assert len(out) >= 2
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=hammer) for _ in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert svc.get_service_info()["request_count"] == 50
    svc.shutdown()


def test_registry_default_and_named(graph):
    reg = ServiceRegistry()
    a, b = LocalHNSWService(graph), LocalHNSWService(graph)
    reg.register_service("a", a)
    reg.register_service("b", b)
    assert reg.get_service() is a          # first registered is default
    assert reg.get_service("b") is b
    reg.unregister_service("a")
    assert reg.get_service() is b
    with pytest.raises(KeyError):
        reg.get_service("zzz")
    reg.shutdown_all()
    assert reg.list_services() == []


def test_factory_registers_in_default_registry(graph):
    svc = create_local_hnsw_service(graph, service_name="factory-test")
    assert get_default_registry().get_service("factory-test") is svc
    get_default_registry().unregister_service("factory-test")
    svc.shutdown()


def test_traverser_over_mock_service():
    """Full lifecycle against the stub — no graph, no device arrays."""
    mock = MockHNSW()
    scores = {"S0": 1.0, "S1": 0.5, "S2": 2.0, "S3": 3.0}
    t = RADTraverser(hnsw_service=mock, scoring_fn=lambda s: scores[s],
                     deployment_mode="distributed")
    assert t.engine == "host"
    t.prime()
    stats = t.traverse(n_workers=2, n_to_score=4, poll_interval=0.01)
    mols = t.get_molecules()
    ids = [m[0] for m in mols]
    assert len(ids) == len(set(ids))
    assert set(ids) <= {0, 1, 2, 3}
    assert len(ids) == 4 or stats["termination_reason"] == "queue_empty"
    best = t.get_best_molecules(1)[0]
    assert best[1] == 0.5 and best[2] == "S1"
    t.shutdown()
    assert any(c[0] == "neighbors" for c in mock.calls)


def test_factory_reference_signature(graph, tmp_path):
    """The reference calls create_local_hnsw_service(hnsw_index,
    database_path=...) (reference README.md:104-110) — both the index
    facade and the database_path kwarg must work."""
    from rad_tpu.api.index import HNSWIndex
    from rad_tpu.store.smiles_store import create_smiles_db

    keys = np.asarray(graph.keys)
    db = str(tmp_path / "mols.db")
    create_smiles_db(db, [(int(k), f"SMI_{int(k)}") for k in keys])

    idx = HNSWIndex.from_graph(graph)
    svc = create_local_hnsw_service(idx, database_path=db, register=False)
    pairs = svc.get_top_level_nodes()
    assert len(pairs) >= 2 and len(pairs) % 2 == 0
    assert pairs[1].startswith("SMI_")
    svc.shutdown()


def test_sqlite_store_close_closes_all_threads(tmp_path):
    """close() closes EVERY thread's connection, and post-close use is
    quiet/consistent: batch lookups return {}, len() returns 0, and no
    fresh connection is silently opened (regression: close() only closed
    the calling thread's handle and __len__ reopened the database)."""
    import threading

    from rad_tpu.store.smiles_store import SQLiteSmilesStore, create_smiles_db

    db = str(tmp_path / "smiles.db")
    create_smiles_db(db, [(i, f"S_{i}") for i in range(20)])
    store = SQLiteSmilesStore(db)

    hits = {}

    def worker(tid):
        hits[tid] = store.get_smiles_batch([tid])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(hits[i] == {i: f"S_{i}"} for i in range(3))
    # main + 3 worker threads each opened a connection
    assert len(store._all_conns) == 4

    store.close()
    assert store._all_conns == []
    assert store.get_smiles_batch([1]) == {}
    assert len(store) == 0
    with pytest.raises(RuntimeError):
        store._conn()
