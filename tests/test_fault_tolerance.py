"""Failure-detection / recovery tests (SURVEY.md §5 aux subsystems):
dead-worker detection, in-flight work reassignment, stale-assignment GC,
scoring-function failures."""

import time

import numpy as np
import pytest

from rad_tpu.build.reference import build_hnsw
from rad_tpu.fp import random_fingerprints
from rad_tpu.service.local import LocalHNSWService
from rad_tpu.store.smiles_store import InMemorySmilesStore
from rad_tpu.traverse.coordinator import CoordinationService
from rad_tpu.traverse.driver import DeviceTraverser
from rad_tpu.traverse.workers import ScoringWorker


@pytest.fixture()
def wiring():
    n = 120
    fps = random_fingerprints(n, n_bits=64, density=0.3, seed=43)
    graph = build_hnsw(fps, connectivity=4, expansion_add=16, seed=3)
    keys = np.asarray(graph.keys)
    rng = np.random.default_rng(7)
    table = {int(k): float(s)
             for k, s in zip(keys, rng.permutation(n).astype(float))}
    store = InMemorySmilesStore({int(k): f"F_{int(k)}" for k in keys})
    service = LocalHNSWService(graph, store)

    def scoring_fn(s):
        return table[int(s.split("_")[1])]

    return graph, service, scoring_fn


def _prime(coord, service, scoring_fn, graph):
    top = service.get_top_level_nodes()
    lvl = max(0, graph.max_level - 1)
    for nid, smi in zip(top[0::2], top[1::2]):
        s = scoring_fn(smi)
        coord.scored_set.insert(nid, s, smi)
        if not coord.visited_set.checkAndInsert(nid, lvl):
            coord.priority_queue.insert(nid, lvl, s)


def test_dead_worker_work_reassigned(wiring):
    """A worker that takes work and vanishes: the monitor marks it dead
    after worker_timeout and re-enqueues its assignment
    (reference rad/coordination_service.py:522-605)."""
    graph, service, scoring_fn = wiring
    coord = CoordinationService(service, worker_timeout=0.3,
                                heartbeat_interval=0.1,
                                monitor_interval=0.05)
    _prime(coord, service, scoring_fn, graph)
    coord.start()
    try:
        coord.register_worker("zombie")
        item = coord.request_work("zombie")
        assert item is not None
        pq_after_pop = len(coord.priority_queue)
        # zombie never heartbeats, never submits
        deadline = time.time() + 5
        while time.time() < deadline:
            stats = coord.get_coordination_stats()
            if stats["reassigned_work_items"] >= 1:
                break
            time.sleep(0.05)
        stats = coord.get_coordination_stats()
        assert stats["reassigned_work_items"] >= 1
        assert stats["workers"]["zombie"]["status"] == "dead"
        assert len(coord.priority_queue) == pq_after_pop + 1
        # a healthy worker can now finish the job
        w = ScoringWorker(coord, scoring_fn, poll_interval=0.01)
        w.start()
        deadline = time.time() + 30
        while time.time() < deadline:
            done, reason = coord.check_termination(n_to_score=10**9)
            if done:
                break
            time.sleep(0.05)
        w.stop()
        ids = [m[0] for m in coord.scored_set.get_molecules()]
        assert len(ids) == len(set(ids))
        assert len(ids) > 2
    finally:
        coord.shutdown()
        service.shutdown()


def test_heartbeat_revives_worker(wiring):
    graph, service, scoring_fn = wiring
    coord = CoordinationService(service, worker_timeout=0.2,
                                monitor_interval=0.05)
    coord.start()
    try:
        coord.register_worker("w1")
        time.sleep(0.5)  # exceeds timeout -> dead
        stats = coord.get_coordination_stats()
        assert stats["workers"]["w1"]["status"] == "dead"
        assert coord.worker_heartbeat("w1") is True
        assert coord.get_coordination_stats()["workers"]["w1"]["status"] \
            == "active"
    finally:
        coord.shutdown()
        service.shutdown()


def test_stale_submission_dropped(wiring):
    """Results for reassigned work ids are rejected (idempotent recovery)."""
    graph, service, scoring_fn = wiring
    coord = CoordinationService(service, worker_timeout=60)
    _prime(coord, service, scoring_fn, graph)
    coord.register_worker("w")
    item = coord.request_work("w")
    # simulate reassignment: requeue and drop the assignment record
    with coord._lock:
        coord._outstanding.pop(item.work_id)
    ok = coord.submit_work_results("w", item.work_id,
                                   [(0, 1.0, "F_0")])
    assert ok is False
    coord.shutdown()
    service.shutdown()


def test_failed_work_requeued_immediately(wiring):
    """A scoring_fn exception releases the work item for IMMEDIATE
    requeue (fail_work) instead of stranding it until the
    2x-worker_timeout stale GC — a transient failure must not stall the
    frontier entry for minutes."""
    graph, service, scoring_fn = wiring
    coord = CoordinationService(service, worker_timeout=60)
    _prime(coord, service, scoring_fn, graph)
    coord.register_worker("w")
    item = coord.request_work("w")
    assert item is not None
    pq_after_pop = len(coord.priority_queue)
    assert coord.fail_work("w", item.work_id) is True
    assert len(coord.priority_queue) == pq_after_pop + 1
    assert coord.fail_work("w", item.work_id) is False  # already released
    # a stale submit after the release is rejected
    assert coord.submit_work_results("w", item.work_id, []) is False

    # end-to-end: a worker whose scoring_fn always raises on one molecule
    # still lets a healthy worker finish, with no duplicate scores
    boom = {"armed": True}

    def flaky(s):
        if boom["armed"] and int(s.split("_")[1]) % 3 == 0:
            raise RuntimeError("dock crashed")
        return scoring_fn(s)

    coord.start()
    try:
        w = ScoringWorker(coord, flaky, poll_interval=0.01)
        w.start()
        time.sleep(0.5)
        boom["armed"] = False  # transient failure clears
        deadline = time.time() + 30
        while time.time() < deadline:
            done, _ = coord.check_termination(n_to_score=10**9)
            if done:
                break
            time.sleep(0.05)
        w.stop()
        assert done
        ids = [m[0] for m in coord.scored_set.get_molecules()]
        assert len(ids) == len(set(ids))
        assert len(ids) > 2
    finally:
        coord.shutdown()
        service.shutdown()


def test_scoring_failures_use_failed_score(wiring):
    """Device driver: scoring exceptions become failed_score (+inf default)
    and the traversal keeps going (reference workers record errors and
    continue, rad/distributed_worker.py:335-346)."""
    graph, _, scoring_fn = wiring
    keys = np.asarray(graph.keys)
    store = InMemorySmilesStore({int(k): f"F_{int(k)}" for k in keys})
    calls = {"n": 0}

    def flaky(s):
        calls["n"] += 1
        if calls["n"] % 5 == 0:
            raise RuntimeError("dock crashed")
        return scoring_fn(s)

    tr = DeviceTraverser(graph, flaky, store, batch_size=4,
                         frontier_capacity=1 << 12, n_score_threads=1,
                         failed_score=999.0)
    tr.prime()
    tr.traverse(n_to_score=10**9, timeout=60)
    mols = tr.get_molecules()
    assert tr.stats["scoring_errors"] > 0
    failed = [m for m in mols if m[1] == 999.0]
    assert len(failed) == tr.stats["scoring_errors"]
    ids = [m[0] for m in mols]
    assert len(ids) == len(set(ids))
    tr.shutdown()


def test_reregistration_keeps_assignments(wiring):
    """A duplicate register (retried POST after a lost response, or a
    worker restart under the same id) must not wipe the worker's
    assigned_work: reassignment-on-death would otherwise never find the
    in-flight items, stranding them until the 2x-timeout stale GC."""
    graph, service, scoring_fn = wiring
    coord = CoordinationService(service, worker_timeout=0.5,
                                monitor_interval=0.05)
    _prime(coord, service, scoring_fn, graph)
    coord.register_worker("w1")
    item = coord.request_work("w1")
    assert item is not None
    assert coord._workers["w1"].assigned_work == {item.work_id}

    coord.register_worker("w1")  # duplicate registration
    assert coord._workers["w1"].assigned_work == {item.work_id}

    coord.start()
    try:
        # the worker goes silent; its item must be requeued at timeout
        deadline = time.time() + 5.0
        while time.time() < deadline:
            if coord._reassigned_count >= 1:
                break
            time.sleep(0.05)
        assert coord._reassigned_count >= 1
        assert item.work_id not in coord._outstanding
    finally:
        coord.shutdown()


def test_reset_termination_clears_sticky_verdict(wiring):
    """check_termination memoizes its verdict; reset_termination() starts
    a fresh round (new timeout epoch, no stale reason)."""
    graph, service, scoring_fn = wiring
    coord = CoordinationService(service)
    _prime(coord, service, scoring_fn, graph)
    done, reason = coord.check_termination(n_to_score=1)
    assert done and reason == "n_to_score"
    # sticky: even a relaxed budget returns the memoized verdict
    done, reason = coord.check_termination(n_to_score=10**9)
    assert done and reason == "n_to_score"
    coord.reset_termination()
    done, reason = coord.check_termination(n_to_score=10**9)
    assert not done and reason is None
