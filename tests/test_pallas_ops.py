"""Parity: fused candidate-pipeline kernels vs the engine's XLA chain.

The kernels (rad_tpu.traverse.pallas_ops, interpreter mode here) must be
bit-identical to the exact XLA formulation they would replace in
expand_impl / integrate_impl (rad_tpu/traverse/device.py) — same dedup
(first occurrence in candidate order), same compaction order, same
post-insert score lookup, same masks.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rad_tpu.traverse.device import DENSE_OPS
from rad_tpu.traverse.pallas_ops import (candidate_filter_pallas,
                                         integrate_candidates_pallas)


def xla_candidate_filter(cand_flat, scored):
    """Verbatim expand_impl lines (rad_tpu/traverse/device.py:611-625)."""
    n = scored.shape[0]
    cand_ok = cand_flat >= 0
    safe_cand = jnp.where(cand_ok, cand_flat, 0)
    unscored = cand_ok & ~DENSE_OPS.gather_scored(scored, safe_cand)
    ids = jnp.where(unscored, cand_flat, n)
    mask = unscored & DENSE_OPS.first_occurrence(ids, n)
    k = ids.shape[0]
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    return jnp.full((k,), -1, jnp.int32).at[
        jnp.where(mask, pos, k)].set(cand_flat, mode="drop")


def xla_integrate(to_score, new_scores, cand_flat, row_flat, scored,
                  scores, enqueued):
    """Verbatim integrate_impl lines (device.py:684-718), minus the
    order-log scatter (stays outside the kernel either way)."""
    n = scored.shape[0]
    n_rows = enqueued.shape[0]
    ts_ok = to_score >= 0
    already = DENSE_OPS.gather_scored(scored, jnp.where(ts_ok, to_score, 0))
    fresh = ts_ok & ~already
    ts_idx = jnp.where(fresh, to_score, n)
    scores = DENSE_OPS.scatter_scores(scores, ts_idx, new_scores)
    scored = DENSE_OPS.scatter_scored(scored, ts_idx, jnp.ones_like(ts_ok))

    cand_ok = cand_flat >= 0
    safe_cand = jnp.where(cand_ok, cand_flat, 0)
    row_key = jnp.where(cand_ok, row_flat, n_rows)
    first = DENSE_OPS.first_occurrence(row_key, n_rows)
    not_enq = ~DENSE_OPS.gather_enqueued(
        enqueued, jnp.where(cand_ok, row_flat, 0))
    push = cand_ok & not_enq & first
    enq_idx = jnp.where(push, row_flat, n_rows)
    enqueued = DENSE_OPS.scatter_enqueued(enqueued, enq_idx,
                                          jnp.ones_like(push))
    cand_score = jnp.where(push, DENSE_OPS.gather_scores(scores, safe_cand),
                           jnp.inf)
    return scored, scores, enqueued, fresh, push, cand_score


def make_case(rng, n=512, k=256, n_rows=700, scored_frac=0.5):
    cand = rng.integers(-1, n, size=k).astype(np.int32)
    cand[rng.random(k) < 0.2] = -1
    # force duplicates
    cand[k // 2:] = np.where(rng.random(k - k // 2) < 0.5,
                             cand[: k - k // 2], cand[k // 2:])
    scored = rng.random(n) < scored_frac
    scores = np.where(scored, rng.random(n), np.inf).astype(np.float32)
    enqueued = rng.random(n_rows) < 0.4
    row = np.minimum(np.maximum(cand, 0) + rng.integers(0, 3, size=k),
                     n_rows - 1).astype(np.int32)
    return (jnp.asarray(cand), jnp.asarray(scored), jnp.asarray(scores),
            jnp.asarray(enqueued), jnp.asarray(row))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_candidate_filter_parity(seed):
    rng = np.random.default_rng(seed)
    cand, scored, _, _, _ = make_case(rng)
    got = candidate_filter_pallas(cand, scored, interpret=True)
    want = xla_candidate_filter(cand, scored)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_candidate_filter_all_invalid():
    cand = jnp.full((64,), -1, jnp.int32)
    scored = jnp.zeros((128,), jnp.bool_)
    got = candidate_filter_pallas(cand, scored, interpret=True)
    assert np.all(np.asarray(got) == -1)


@pytest.mark.parametrize("seed", [3, 4, 5])
def test_integrate_parity(seed):
    rng = np.random.default_rng(seed)
    cand, scored, scores, enqueued, row = make_case(rng)
    to_score = candidate_filter_pallas(cand, scored, interpret=True)
    new_scores = jnp.asarray(
        rng.random(to_score.shape[0]).astype(np.float32))
    got = integrate_candidates_pallas(to_score, new_scores, cand, row,
                                      scored, scores, enqueued,
                                      interpret=True)
    want = xla_integrate(to_score, new_scores, cand, row, scored, scores,
                         enqueued)
    names = ["scored", "scores", "enqueued", "fresh", "push", "cand_score"]
    for g, w, name in zip(got, want, names):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                      err_msg=name)


def test_integrate_pipelined_duplicate_noop():
    """A to_score id that is ALREADY scored (pipelined double delivery)
    must be a no-op: not fresh, score unchanged."""
    n, k = 64, 8
    scored = jnp.zeros((n,), jnp.bool_).at[5].set(True)
    scores = jnp.full((n,), jnp.inf, jnp.float32).at[5].set(0.25)
    enq = jnp.zeros((96,), jnp.bool_)
    ts = jnp.array([5, 7, -1, -1, -1, -1, -1, -1], jnp.int32)
    ns = jnp.full((k,), 0.9, jnp.float32)
    cand = jnp.full((k,), -1, jnp.int32)
    row = jnp.zeros((k,), jnp.int32)
    scored_o, scores_o, _, fresh, _, _ = integrate_candidates_pallas(
        ts, ns, cand, row, scored, scores, enq, interpret=True)
    assert not bool(fresh[0]) and bool(fresh[1])
    assert float(scores_o[5]) == pytest.approx(0.25)
    assert float(scores_o[7]) == pytest.approx(0.9)
    assert bool(scored_o[5]) and bool(scored_o[7])


def test_fused_run_engine_parity():
    """fused_run with fused_candidates=True must produce the exact same
    traversal state as the XLA chain (auto-interpreted on CPU)."""
    import jax
    from rad_tpu.build.exact import build_hnsw_exact
    from rad_tpu.fp.pack import random_fingerprints
    from rad_tpu.traverse import device as dev

    fps = random_fingerprints(300, n_bits=128, density=0.3, seed=9)
    g = build_hnsw_exact(fps, connectivity=4, seed=1)
    dg = dev.prepare_device_graph(g)
    target = g.packed[17]
    tpop = g.popcounts[17]

    def run(fused):
        state = dev.init_state(dg)
        n_top = g.layer_sizes[g.max_level]
        from rad_tpu.fp.tanimoto import tanimoto_rows_to_target
        seeds = jnp.arange(n_top, dtype=jnp.int32)
        s0 = tanimoto_rows_to_target(g.packed[seeds], g.popcounts[seeds],
                                     target, tpop)
        state = dev.prime(state, dg, seeds, s0)
        return dev.fused_run(state, dg, g.packed, g.popcounts, target,
                             tpop, jnp.int32(250), batch=8,
                             fused_candidates=fused)

    a, b = run(False), run(True)
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_fused_run_engine_parity_narrow_width():
    import jax
    from rad_tpu.build.exact import build_hnsw_exact
    from rad_tpu.fp.pack import random_fingerprints
    from rad_tpu.traverse import device as dev
    from rad_tpu.fp.tanimoto import tanimoto_rows_to_target

    fps = random_fingerprints(300, n_bits=128, density=0.3, seed=9)
    g = build_hnsw_exact(fps, connectivity=4, seed=1)
    dg = dev.prepare_device_graph(g)
    target = g.packed[23]
    tpop = g.popcounts[23]

    def run(fused):
        state = dev.init_state(dg)
        n_top = g.layer_sizes[g.max_level]
        seeds = jnp.arange(n_top, dtype=jnp.int32)
        s0 = tanimoto_rows_to_target(g.packed[seeds], g.popcounts[seeds],
                                     target, tpop)
        state = dev.prime(state, dg, seeds, s0)
        return dev.fused_run(state, dg, g.packed, g.popcounts, target,
                             tpop, jnp.int32(250), batch=8,
                             narrow_width=16, fused_candidates=fused)

    a, b = run(False), run(True)
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
