"""Traversal checkpoint/resume + profiling utils."""

import numpy as np

from rad_tpu.build.reference import build_hnsw
from rad_tpu.fp import random_fingerprints
from rad_tpu.store.smiles_store import InMemorySmilesStore
from rad_tpu.traverse.driver import DeviceTraverser
from rad_tpu.utils import Timer


def _setup():
    n = 200
    fps = random_fingerprints(n, n_bits=64, density=0.3, seed=29)
    graph = build_hnsw(fps, connectivity=4, expansion_add=16, seed=8)
    keys = np.asarray(graph.keys)
    rng = np.random.default_rng(5)
    table = {int(k): float(s)
             for k, s in zip(keys, rng.permutation(n).astype(float))}
    store = InMemorySmilesStore({int(k): f"C_{int(k)}" for k in keys})
    return graph, store, lambda s: table[int(s.split("_")[1])]


def test_checkpoint_resume_continues_identically(tmp_path):
    graph, store, fn = _setup()
    # run to completion in one go
    t_full = DeviceTraverser(graph, fn, store, batch_size=4,
                             frontier_capacity=1 << 12, n_score_threads=1)
    t_full.prime()
    t_full.traverse(n_to_score=10**9, timeout=60)
    full_mols = t_full.get_molecules()
    t_full.shutdown()

    # run halfway, checkpoint, resume in a fresh traverser
    t1 = DeviceTraverser(graph, fn, store, batch_size=4,
                         frontier_capacity=1 << 12, n_score_threads=1)
    t1.prime()
    t1.traverse(n_to_score=60)
    ckpt = str(tmp_path / "trav.npz")
    t1.save_checkpoint(ckpt)
    mid_count = t1.n_scored
    t1.shutdown()

    t2 = DeviceTraverser(graph, fn, store, batch_size=4,
                         frontier_capacity=1 << 12, n_score_threads=1)
    t2.load_checkpoint(ckpt)
    assert t2.n_scored == mid_count
    t2.traverse(n_to_score=10**9, timeout=60)
    resumed_mols = t2.get_molecules()
    t2.shutdown()

    assert [m[0] for m in full_mols] == [m[0] for m in resumed_mols]
    assert [m[1] for m in full_mols] == [m[1] for m in resumed_mols]


def test_checkpoint_rejects_wrong_graph(tmp_path):
    graph, store, fn = _setup()
    t = DeviceTraverser(graph, fn, store, n_score_threads=1)
    t.prime()
    ckpt = str(tmp_path / "c.npz")
    t.save_checkpoint(ckpt)
    t.shutdown()

    other = build_hnsw(random_fingerprints(50, n_bits=64, seed=1),
                       connectivity=4, expansion_add=8)
    t2 = DeviceTraverser(other, fn, store, n_score_threads=1)
    import pytest
    with pytest.raises(ValueError):
        t2.load_checkpoint(ckpt)
    t2.shutdown()


def test_order_log_ring_keeps_most_recent(tmp_path):
    """Past log capacity the ring keeps the newest entries, oldest first."""
    from rad_tpu.traverse import device as dev

    graph, store, fn = _setup()
    t = DeviceTraverser(graph, fn, store, batch_size=4,
                        frontier_capacity=1 << 12, log_capacity=16,
                        n_score_threads=1)
    t.prime()
    t.traverse(n_to_score=10**9, timeout=60)
    assert t.n_scored > 16
    log = dev.read_order_log(t.state)
    assert len(log) == 16
    ids = [m[0] for m in t.get_molecules()]
    assert ids == log.tolist()
    assert len(set(ids)) == 16
    t.shutdown()


def test_timer_sections():
    t = Timer()
    with t.section("a"):
        pass
    with t.section("a"):
        pass
    s = t.stats()
    assert s["a"]["count"] == 2
    assert s["a"]["total_seconds"] >= 0


def test_profile_trace_writes_dump(tmp_path):
    import jax.numpy as jnp

    from rad_tpu.utils import profile_trace

    logdir = str(tmp_path / "trace")
    with profile_trace(logdir):
        (jnp.arange(1024.0) * 2).block_until_ready()
    import os
    found = [f for _, _, fs in os.walk(logdir) for f in fs]
    assert found, "profiler produced no trace files"


def test_global_mesh_helper():
    from rad_tpu.parallel.multihost import global_mesh

    mesh = global_mesh(("graph",))
    assert mesh.shape["graph"] == 8


def test_periodic_checkpointing_survives_crash(tmp_path):
    """traverse(checkpoint_path=...) persists atomically mid-run; a
    process crash loses at most one interval and the resumed campaign's
    scored set is consistent (once-only invariants hold across the
    crash boundary)."""
    graph, store, fn = _setup()
    ckpt = str(tmp_path / "auto.npz")

    t1 = DeviceTraverser(graph, fn, store, batch_size=4,
                         frontier_capacity=1 << 12, n_score_threads=1)
    t1.prime()
    t1.traverse(n_to_score=60, checkpoint_path=ckpt, checkpoint_interval=2)
    assert (tmp_path / "auto.npz").exists()
    saved_count_mid = t1.n_scored
    # the process "dies" here: t1 is discarded without save_checkpoint();
    # recovery must come purely from the periodic file
    t1.shutdown()

    # fresh process: resume from the checkpoint file
    t2 = DeviceTraverser(graph, fn, store, batch_size=4,
                         frontier_capacity=1 << 12, n_score_threads=1)
    t2.load_checkpoint(ckpt)
    assert t2.n_scored == saved_count_mid
    t2.traverse(n_to_score=10**9, timeout=60)
    resumed = t2.get_molecules()
    t2.shutdown()

    # uninterrupted oracle
    t3 = DeviceTraverser(graph, fn, store, batch_size=4,
                         frontier_capacity=1 << 12, n_score_threads=1)
    t3.prime()
    t3.traverse(n_to_score=10**9, timeout=60)
    full = t3.get_molecules()
    t3.shutdown()

    ids_r = [m[0] for m in resumed]
    assert len(ids_r) == len(set(ids_r)), "once-only violated across resume"
    assert resumed == full, "resumed campaign diverged from uninterrupted"


def test_batch_depth_warning_emitted(caplog):
    """traverse() warns when the budget allows fewer than ~8 best-first
    rounds at the configured batch (docs/ARCHITECTURE.md batch-depth)."""
    import logging
    graph, store, fn = _setup()
    t = DeviceTraverser(graph, fn, store, batch_size=64, n_score_threads=1)
    t.prime()
    with caplog.at_level(logging.WARNING, logger="rad_tpu.traverse.driver"):
        t.traverse(n_to_score=40)
    t.shutdown()
    assert any("best-first rounds" in r.message for r in caplog.records)

    t2 = DeviceTraverser(graph, fn, store, batch_size=2, n_score_threads=1)
    t2.prime()
    with caplog.at_level(logging.WARNING, logger="rad_tpu.traverse.driver"):
        caplog.clear()
        t2.traverse(n_to_score=200)  # 200/(2*8) = 12.5 rounds >= 8
    t2.shutdown()
    assert not any("best-first rounds" in r.message for r in caplog.records)


def test_checkpoint_roundtrip_any_suffix(tmp_path):
    """save_checkpoint/load_checkpoint round-trip for paths NOT ending in
    .npz (np.savez appends the suffix; the atomic rename normalizes it —
    review r3s9: the pair used to fail on its own output)."""
    import numpy as np

    from rad_tpu.build.reference import build_hnsw
    from rad_tpu.fp import random_fingerprints
    from rad_tpu.traverse.driver import DeviceTraverser

    fps = random_fingerprints(300, n_bits=128, density=0.25, seed=31)
    graph = build_hnsw(fps, connectivity=4, expansion_add=16, seed=1)
    scores = np.linspace(0.0, 1.0, 300, dtype=np.float32)

    def scorer(ids):
        return scores[np.asarray(ids)]

    t = DeviceTraverser(graph, scorer, batch_size=8)
    t.prime()
    t.traverse(n_to_score=40)
    p = str(tmp_path / "run.ckpt")        # no .npz suffix on purpose
    t.save_checkpoint(p)
    import os
    assert os.path.exists(p)              # file lands at exactly `path`

    t2 = DeviceTraverser(graph, scorer, batch_size=8)
    t2.load_checkpoint(p)
    assert t2.n_scored == t.n_scored
    np.testing.assert_array_equal(np.asarray(t2.state.order_log),
                                  np.asarray(t.state.order_log))
