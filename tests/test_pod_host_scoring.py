"""Pod engine with a HOST scoring function (the real RAD use case at scale).

The reference's whole purpose is calling an external docking program per
molecule (rad/distributed_worker.py:296-308) over a library too large for
one machine. Here the graph is sharded over the 8-way CPU mesh and the
scoring function runs on the host; these tests pin:

- bit-identity of the pod host-scored traversal vs the single-device host
  driver (same scored ids, same order, same scores);
- pipeline_depth > 1 preserves the once-only invariants and the scored set;
- the fully-sharded-state layout agrees with the replicated-state layout;
- API validation and SMILES-bearing results in host mode.
"""

import numpy as np
import pytest

from rad_tpu.build.reference import build_hnsw
from rad_tpu.fp import random_fingerprints
from rad_tpu.parallel import make_mesh
from rad_tpu.parallel.pod import PodTraverser
from rad_tpu.traverse.driver import DeviceTraverser


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, axis_names=("graph",))


@pytest.fixture(scope="module")
def built():
    fps = random_fingerprints(600, n_bits=128, density=0.25, seed=11)
    return build_hnsw(fps, connectivity=6, expansion_add=32, seed=1)


def scoring_fn(smiles: str) -> float:
    # deterministic stand-in for a docking program (smiles is str(key)
    # when no store is attached)
    k = int(smiles)
    return float((1103515245 * k + 12345) % 99991) / 99991.0


def _run_single(graph, n_to_score, batch=16):
    dt = DeviceTraverser(graph, scoring_fn, batch_size=batch,
                         n_score_threads=4)
    dt.prime()
    dt.traverse(n_to_score=n_to_score)
    return dt


@pytest.mark.slow
def test_pod_host_scoring_bit_identical(mesh, built):
    n_to_score = 300
    dt = _run_single(built, n_to_score)
    pt = PodTraverser(built, scoring_fn=scoring_fn, mesh=mesh,
                      batch_size=16, n_score_threads=4)
    pt.prime()
    stats = pt.traverse(n_to_score=n_to_score)
    assert stats["termination_reason"] == "n_to_score"

    from rad_tpu.traverse.device import read_order_log
    np.testing.assert_array_equal(read_order_log(pt.state),
                                  read_order_log(dt.state))
    np.testing.assert_array_equal(np.asarray(pt.state.scores),
                                  np.asarray(dt.state.scores))
    assert pt.n_scored == dt.n_scored
    pt.shutdown()
    dt.shutdown()


def test_pod_host_scoring_pipelined_set_agrees(mesh, built):
    """pipeline_depth=4: traversal order may interleave, but the scored set
    is duplicate-free and every score is correct (the reference's
    multi-worker race regression, tests/test_integration.py:157-161)."""
    pt = PodTraverser(built, scoring_fn=scoring_fn, mesh=mesh,
                      batch_size=16, n_score_threads=4)
    pt.prime()
    pt.traverse(n_to_score=300, pipeline_depth=4)
    mols = pt.get_molecules()
    ids = [m[0] for m in mols]
    assert len(ids) == len(set(ids)), "duplicate scoring"
    assert len(ids) >= 300
    for i, s, smi in mols[:50]:
        # smiles is str(user key) when no store is attached; scores must
        # match the deterministic function of the SMILES, not the node id
        assert s == pytest.approx(scoring_fn(smi), abs=1e-6)
    pt.shutdown()


@pytest.mark.slow
def test_pod_host_scoring_sharded_state_agrees(mesh, built):
    """Billion-scale layout (scored/scores/enqueued row-sharded) produces
    the same scored set as the replicated layout."""
    a = PodTraverser(built, scoring_fn=scoring_fn, mesh=mesh, batch_size=16)
    a.prime()
    a.traverse(n_to_score=200)
    b = PodTraverser(built, scoring_fn=scoring_fn, mesh=mesh, batch_size=16,
                     shard_state=True)
    b.prime()
    b.traverse(n_to_score=200)
    from rad_tpu.traverse.device import read_order_log
    np.testing.assert_array_equal(read_order_log(a.state),
                                  read_order_log(b.state))
    assert a.n_scored == b.n_scored
    a.shutdown()
    b.shutdown()


def test_host_mode_results_carry_smiles(mesh, built):
    pt = PodTraverser(built, scoring_fn=scoring_fn, mesh=mesh, batch_size=8)
    pt.prime()
    pt.traverse(n_to_score=50)
    best = pt.get_best_molecules(5)
    assert len(best) == 5
    assert all(len(t) == 3 for t in best)          # (id, score, smiles)
    assert best == sorted(best, key=lambda t: t[1])
    pt.shutdown()


def test_ctor_validation(built, mesh):
    with pytest.raises(ValueError):
        PodTraverser(built, mesh=mesh)             # neither scorer
    with pytest.raises(ValueError):
        PodTraverser(built, target_packed=np.asarray(built.packed)[0],
                     scoring_fn=scoring_fn, mesh=mesh)   # both


def test_pod_deployment_mode_via_radtraverser(mesh, built):
    """RADTraverser(deployment_mode='pod') runs the full 5-call lifecycle
    over the sharded engine with state views and stats."""
    from rad_tpu import create_pod_traverser

    t = create_pod_traverser(built, scoring_fn, mesh=mesh, batch_size=16)
    t.prime()
    stats = t.traverse(n_to_score=150)
    assert stats["n_scored"] >= 150
    best = t.get_best_molecules(10)
    assert len(best) == 10 and best == sorted(best, key=lambda x: x[1])
    assert len(t.scored_set) >= 150
    ts = t.get_traversal_stats()
    assert ts["deployment_mode"] == "pod"
    t.shutdown()


@pytest.mark.slow
def test_pod_checkpoint_resume(mesh, built, tmp_path):
    a = PodTraverser(built, scoring_fn=scoring_fn, mesh=mesh, batch_size=16)
    a.prime()
    a.traverse(n_to_score=120)
    p = str(tmp_path / "pod_ckpt.npz")
    a.save_checkpoint(p)
    n_a = a.n_scored
    a.traverse(n_to_score=300)

    b = PodTraverser(built, scoring_fn=scoring_fn, mesh=mesh, batch_size=16)
    b.load_checkpoint(p)
    assert b.n_scored == n_a
    b.traverse(n_to_score=300)
    from rad_tpu.traverse.device import read_order_log
    np.testing.assert_array_equal(read_order_log(a.state),
                                  read_order_log(b.state))
    a.shutdown(); b.shutdown()


def test_scoring_bridge_keeps_virtual_keys_lazy():
    """HostScoringBridge must not materialize VirtualArray key maps (a v2
    slim serving graph's keys are 8 B/node): the bridge keeps the virtual
    object and indexes it per batch."""
    from rad_tpu.graph.storage import ArangeKeys
    from rad_tpu.traverse.pipeline import HostScoringBridge

    bridge = HostScoringBridge(ArangeKeys(1000), scoring_fn,
                               n_score_threads=1)
    assert isinstance(bridge.keys, ArangeKeys)  # not np.asarray'd
    assert bridge.smiles_for_ids(np.array([3, 7])) == ["3", "7"]
    scores = bridge.score_batch(np.array([5, -1, 9], np.int32))
    assert scores.shape == (3,)
    assert scores[0] == pytest.approx(scoring_fn("5"))
    assert scores[1] == pytest.approx(scoring_fn("9"))  # packed left
    bridge.shutdown()
