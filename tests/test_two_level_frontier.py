"""Two-level frontier (sorted head + watermarked cold store).

With distinct scores the two-level layout must reproduce the classic
single-array frontier EXACTLY — same pops, same order, same scored set —
while exercising spills (head overflow), direct-to-cold routing, and
refills (head drains). Equal-score order is the only permitted deviation
(not exercised here: scores are tie-free by construction).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rad_tpu.build.reference import build_hnsw
from rad_tpu.fp import random_fingerprints
from rad_tpu.traverse import device as dev


@pytest.fixture(scope="module")
def built():
    fps = random_fingerprints(1200, n_bits=64, density=0.3, seed=31)
    return build_hnsw(fps, connectivity=5, expansion_add=24, seed=2)


def _score_ids(ids: np.ndarray) -> np.ndarray:
    # tie-free deterministic scores: a bijective-ish hash of the id
    out = np.full(ids.shape, np.inf, np.float32)
    ok = ids >= 0
    h = (ids[ok].astype(np.uint64) * 2654435761) % (1 << 31)
    out[ok] = h.astype(np.float32) / (1 << 31)
    return out


def _run(graph, state, dg, n_steps=10_000, batch=8):
    order = []
    while int(state.f_live) > 0 and n_steps > 0:
        n_steps -= 1
        state, out = dev.expand(state, dg, batch)
        ts = np.asarray(out["to_score"])
        scores = jnp.asarray(_score_ids(ts))
        order.extend(int(r) for r, v in
                     zip(np.asarray(out["exp_node"]),
                         np.asarray(out["exp_valid"])) if v)
        state = dev.integrate(state, dg, out["exp_node"],
                              out["exp_level"], out["exp_score"],
                              out["exp_valid"], out["cand"],
                              out["to_score"], scores)
        assert int(state.f_live) == int(dev.frontier_live_scan(state)), \
            "f_live counter diverged from recount"
    return state, order


def _primed(graph, dg, **kw):
    state = dev.init_state(dg, **kw)
    n_top = graph.layer_sizes[graph.max_level]
    seeds = jnp.arange(n_top, dtype=jnp.int32)
    seed_scores = jnp.asarray(_score_ids(np.arange(n_top)))
    return dev.prime(state, dg, seeds, seed_scores)


@pytest.mark.slow
def test_two_level_matches_classic_exactly(built):
    dg = dev.prepare_device_graph(built)

    classic = _primed(built, dg, frontier_capacity=1 << 12,
                      buffer_capacity=64)
    classic, pops_c = _run(built, classic, dg)

    # tiny head (64) forces constant spills + many refills
    two = _primed(built, dg, frontier_capacity=1 << 12,
                  buffer_capacity=64, head_capacity=64)
    assert two.cold_score.shape[0] == 1 << 12
    assert two.f_score.shape[0] == 64
    two, pops_t = _run(built, two, dg)

    assert pops_t == pops_c, "pop order diverged"
    np.testing.assert_array_equal(dev.read_order_log(two),
                                  dev.read_order_log(classic))
    np.testing.assert_array_equal(np.asarray(two.scores),
                                  np.asarray(classic.scores))
    assert int(two.n_scored) == int(classic.n_scored)
    assert int(two.f_live) == 0 and int(classic.f_live) == 0


@pytest.mark.slow
def test_two_level_fused_run_agrees_on_scored_set(built):
    """fused_run (on-device Tanimoto scorer, ties possible): the two-level
    sweep must score the same SET of nodes to exhaustion even when
    equal-score pop order differs."""
    from rad_tpu.fp.pack import popcount_rows
    from rad_tpu.fp.tanimoto import tanimoto_matrix

    dg = dev.prepare_device_graph(built)
    packed = jnp.asarray(np.asarray(built.packed))
    pops = jnp.asarray(np.asarray(built.popcounts))
    target = jnp.asarray(np.asarray(built.packed)[77])
    t_pop = popcount_rows(target[None, :])[0]
    n_top = built.layer_sizes[built.max_level]
    seeds = jnp.arange(n_top, dtype=jnp.int32)
    seed_scores = tanimoto_matrix(target[None, :], packed[:n_top])[0]

    outs = []
    for head in (None, 128):
        st = dev.init_state(dg, frontier_capacity=1 << 12,
                            buffer_capacity=256, head_capacity=head)
        st = dev.prime(st, dg, seeds, seed_scores)
        st = dev.fused_run(st, dg, packed, pops, target, t_pop,
                           jnp.int32(len(built)), batch=16)
        outs.append(st)
    classic, two = outs
    assert int(two.n_scored) == int(classic.n_scored)
    assert set(dev.read_order_log(two).tolist()) == \
        set(dev.read_order_log(classic).tolist())
    assert int(two.n_dropped) == int(classic.n_dropped) == 0


def test_two_level_checkpoint_roundtrip(built, tmp_path):
    dg = dev.prepare_device_graph(built)
    st = _primed(built, dg, frontier_capacity=1 << 12,
                 buffer_capacity=64, head_capacity=64)
    st, _ = _run(built, st, dg, n_steps=20)
    p = str(tmp_path / "two_level.npz")
    dev.save_state(st, p)
    st2 = dev.load_state(p)
    assert st2.cold_score.shape == st.cold_score.shape
    assert int(st2.cold_n) == int(st.cold_n)
    assert float(st2.watermark) == float(st.watermark)
    a, _ = _run(built, st, dg)
    b, _ = _run(built, st2, dg)
    np.testing.assert_array_equal(dev.read_order_log(a),
                                  dev.read_order_log(b))


def test_head_capacity_auto_rule():
    """Default 'auto' enables the two-level layout only at merge-dominated
    frontier sizes (>= 2^18); explicit None forces single-level."""
    import jax.numpy as jnp
    import numpy as np

    from rad_tpu.traverse import device as dev

    class _DG:  # minimal stand-in (init_state touches only these fields)
        n_nodes = 100
        n_rows = 110
        max_level = 1
        offsets = jnp.asarray(np.array([0, 100, 110, 110], np.int32))
        adj = jnp.zeros((110, 4), jnp.int32)

    big = dev.init_state(_DG(), frontier_capacity=1 << 18)
    assert big.cold_score.shape[0] == 1 << 18
    assert big.f_score.shape[0] == 1 << 16

    small = dev.init_state(_DG(), frontier_capacity=1 << 14)
    assert small.cold_score.shape[0] == 0

    forced = dev.init_state(_DG(), frontier_capacity=1 << 18,
                            head_capacity=None)
    assert forced.cold_score.shape[0] == 0
    assert forced.f_score.shape[0] == 1 << 18


@pytest.mark.slow
def test_auto_two_level_end_to_end_scored_set_parity(built, monkeypatch):
    """ADVICE r2: exercise the AUTO-enabled two-level path end to end (not
    just explicit small heads) and pin scored-set equality against the
    single-level layout. The auto constants are shrunk so the default
    'auto' rule engages (and spills/refills actually occur) at test
    scale — the code path is identical to production's 2^16/2^18."""
    from rad_tpu.fp.pack import popcount_rows
    from rad_tpu.fp.tanimoto import tanimoto_matrix

    monkeypatch.setattr(dev, "AUTO_HEAD_CAPACITY", 128)
    monkeypatch.setattr(dev, "AUTO_HEAD_THRESHOLD", 1 << 11)

    dg = dev.prepare_device_graph(built)
    packed = jnp.asarray(np.asarray(built.packed))
    pops = jnp.asarray(np.asarray(built.popcounts))
    target = jnp.asarray(np.asarray(built.packed)[5])
    t_pop = popcount_rows(target[None, :])[0]
    n_top = built.layer_sizes[built.max_level]
    seeds = jnp.arange(n_top, dtype=jnp.int32)
    seed_scores = tanimoto_matrix(target[None, :], packed[:n_top])[0]

    outs = []
    for head in (None, "auto"):
        st = dev.init_state(dg, frontier_capacity=1 << 12,
                            buffer_capacity=128, head_capacity=head)
        st = dev.prime(st, dg, seeds, seed_scores)
        st = dev.fused_run(st, dg, packed, pops, target, t_pop,
                           jnp.int32(len(built)), batch=16)
        outs.append(st)
    classic, auto = outs
    assert auto.f_score.shape[0] == 128, "auto rule did not engage"
    assert auto.cold_score.shape[0] == 1 << 12
    assert int(auto.n_scored) == int(classic.n_scored)
    assert set(dev.read_order_log(auto).tolist()) == \
        set(dev.read_order_log(classic).tolist())
