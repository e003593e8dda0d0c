"""Host-spilled order log: complete traversal order beyond the device ring.

The reference keeps insertion order in an unbounded Redis LIST
(rad/scored.py); the device engine keeps a fixed ring. These tests pin the
contract that a driver with ``order_log_spill`` recovers the COMPLETE
insertion order even when the device ring is far smaller than the number
of molecules scored (docs/SCALING.md 2B-molecule regime).
"""

import numpy as np
import pytest

from rad_tpu.build.reference import build_hnsw
from rad_tpu.fp import random_fingerprints
from rad_tpu.store.smiles_store import InMemorySmilesStore
from rad_tpu.traverse.driver import DeviceTraverser
from rad_tpu.traverse.spill import SpilledOrderLog


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

    return graph, store, scoring_fn


def _run(graph, store, scoring_fn, **kw):
    tr = DeviceTraverser(graph, scoring_fn, store, batch_size=4,
                         frontier_capacity=1 << 12, n_score_threads=1, **kw)
    tr.prime()
    tr.traverse(n_to_score=10**9, timeout=120, pipeline_depth=1)
    mols = tr.get_molecules()
    tr.shutdown()
    return tr, [m[0] for m in mols]


def test_spilled_order_matches_unbounded_ring(setup):
    graph, store, scoring_fn = setup
    _, order_full = _run(graph, store, scoring_fn)      # ring = N (lossless)
    tr, order_spill = _run(graph, store, scoring_fn,
                           log_capacity=64, order_log_spill=True)
    assert len(order_full) >= 0.95 * len(graph)  # near-total sweep
    assert order_spill == order_full, \
        "spilled order differs from the unbounded-ring order"
    # the device ring really was undersized
    assert tr.state.order_log.shape[0] == 64
    assert tr.n_scored > 64


def test_spill_to_file(setup, tmp_path):
    graph, store, scoring_fn = setup
    path = str(tmp_path / "order.i32")
    _, order_full = _run(graph, store, scoring_fn)
    _, order_spill = _run(graph, store, scoring_fn, log_capacity=64,
                          order_log_spill=path)
    assert order_spill == order_full
    on_disk = np.fromfile(path, dtype="<i4")
    np.testing.assert_array_equal(on_disk, np.asarray(order_full))
    # resumable: a new log over the same file starts at the file length
    log = SpilledOrderLog(path)
    assert len(log) == len(order_full)
    np.testing.assert_array_equal(log.read(), on_disk)


def test_spilled_log_read_slicing(tmp_path):
    log = SpilledOrderLog()
    log.append(np.arange(10, dtype=np.int32))
    log.append(np.arange(10, 25, dtype=np.int32))
    assert len(log) == 25
    np.testing.assert_array_equal(log.read(), np.arange(25))
    np.testing.assert_array_equal(log.read(5, 10), np.arange(5, 15))
    np.testing.assert_array_equal(log.read(20), np.arange(20, 25))
    assert SpilledOrderLog().read().size == 0


@pytest.mark.slow
def test_pod_spill_on_device_scorer(setup):
    from rad_tpu.parallel.pod import PodTraverser

    graph, _, _ = setup
    target = np.asarray(graph.packed)[7]
    tr_ref = PodTraverser(graph, target_packed=target, n_devices=2,
                          batch_size=4)
    tr_ref.prime()
    tr_ref.traverse(n_to_score=10**9, timeout=120)
    order_ref = [m[0] for m in tr_ref.get_molecules()]

    tr = PodTraverser(graph, target_packed=target, n_devices=2,
                      batch_size=4, log_capacity=64, order_log_spill=True)
    tr.prime()
    tr.traverse(n_to_score=10**9, timeout=120)
    order = [m[0] for m in tr.get_molecules()]
    assert order == order_ref
    assert tr.n_scored > 64


def test_truncate_ram_and_file(tmp_path):
    """ADVICE r2: truncate() drops tail entries in both storage modes."""
    ram = SpilledOrderLog()
    ram.append(np.arange(10, dtype=np.int32))
    ram.append(np.arange(10, 20, dtype=np.int32))
    ram.truncate(7)
    assert len(ram) == 7
    assert ram.read().tolist() == list(range(7))
    ram.truncate(100)  # no-op beyond length
    assert len(ram) == 7

    path = str(tmp_path / "order.bin")
    f = SpilledOrderLog(path)
    f.append(np.arange(20, dtype=np.int32))
    f.truncate(5)
    assert len(f) == 5
    assert f.read().tolist() == list(range(5))
    # a resumed log sees the truncated length
    g = SpilledOrderLog(path)
    assert len(g) == 5


def test_load_checkpoint_trims_stale_spill(setup, tmp_path):
    """Resuming from a checkpoint truncates spill entries the pre-crash
    run wrote beyond the checkpoint's n_scored (ADVICE r2)."""
    graph, store, scoring_fn = setup
    spill_path = str(tmp_path / "order_resume.bin")
    ckpt = str(tmp_path / "state.npz")
    tr = DeviceTraverser(graph, scoring_fn, store, batch_size=4,
                         frontier_capacity=1 << 12, n_score_threads=1,
                         log_capacity=64, order_log_spill=spill_path)
    tr.prime()
    tr.traverse(n_to_score=40, timeout=120)
    tr.save_checkpoint(ckpt)
    n_at_ckpt = tr.n_scored
    tr.traverse(n_to_score=120, timeout=120)  # runs past the checkpoint
    assert len(tr._spill) > n_at_ckpt
    tr.shutdown()

    tr2 = DeviceTraverser(graph, scoring_fn, store, batch_size=4,
                          frontier_capacity=1 << 12, n_score_threads=1,
                          log_capacity=64, order_log_spill=spill_path)
    tr2.load_checkpoint(ckpt)
    assert len(tr2._spill) == tr2.n_scored == n_at_ckpt
    tr2.shutdown()
