"""ML-surrogate traversal: MLP scorer compiled into the traversal loop.

Covers make_device_run (arbitrary jittable scorer) and the Chemprop-style
capability of the reference (ML scoring at scale, reference README.md:206).
"""

import sys
from pathlib import Path
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


@pytest.mark.slow
def test_mlp_surrogate_traversal_enriches():
    from ml_scorer_example import main

    rc = main(["--n", "4000", "--n-bits", "256", "--train-frac", "0.08",
               "--score-frac", "0.12"])
    assert rc == 0  # >=50 of true top-100 found


@pytest.mark.slow
def test_make_device_run_respects_budget():
    import jax.numpy as jnp
    import numpy as np

    from rad_tpu.build.reference import build_hnsw
    from rad_tpu.fp import random_fingerprints
    from rad_tpu.traverse import device as dev

    fps = random_fingerprints(300, n_bits=64, density=0.3, seed=3)
    g = build_hnsw(fps, connectivity=4, expansion_add=16, seed=1)
    dg = dev.prepare_device_graph(g)
    packed = jnp.asarray(np.asarray(g.packed))
    pops = jnp.asarray(np.asarray(g.popcounts))

    def scorer(fp_rows, pop_rows):
        return pop_rows.astype(jnp.float32)

    run = dev.make_device_run(dg, packed, pops, scorer, batch=8)
    st = dev.init_state(dg, frontier_capacity=1 << 10)
    n_top = g.layer_sizes[g.max_level]
    ids = jnp.arange(n_top, dtype=jnp.int32)
    st = dev.prime(st, dg, ids, scorer(packed[:n_top], pops[:n_top]))
    st = run(st, jnp.int32(100))
    n = int(st.n_scored)
    assert 100 <= n <= 100 + 8 * dg.m0
    log = np.asarray(st.order_log)[:n]
    assert len(set(log.tolist())) == n


@pytest.mark.slow
def test_make_device_run_narrow_width_agrees():
    """narrow_width on the generalized scorer loop: identical scored set,
    order log, and frontier to the full-width run (exhaustive sweep,
    widths forcing both branches)."""
    import jax.numpy as jnp
    import numpy as np

    from rad_tpu.build.reference import build_hnsw
    from rad_tpu.fp import random_fingerprints
    from rad_tpu.traverse import device as dev

    fps = random_fingerprints(300, n_bits=64, density=0.3, seed=3)
    g = build_hnsw(fps, connectivity=4, expansion_add=16, seed=1)
    dg = dev.prepare_device_graph(g)
    packed = jnp.asarray(np.asarray(g.packed))
    pops = jnp.asarray(np.asarray(g.popcounts))

    def scorer(fp_rows, pop_rows):
        # depends on the row CONTENT so a mis-trimmed gather would show
        return (fp_rows.sum(axis=1) % 97).astype(jnp.float32)

    def sweep(narrow):
        run = dev.make_device_run(dg, packed, pops, scorer, batch=4,
                                  narrow_width=narrow)
        st = dev.init_state(dg, frontier_capacity=1 << 10)
        n_top = g.layer_sizes[g.max_level]
        ids = jnp.arange(n_top, dtype=jnp.int32)
        st = dev.prime(st, dg, ids, scorer(packed[:n_top], pops[:n_top]))
        return run(st, jnp.int32(10**9))

    full = sweep(None)
    for w in (8, 16):
        nar = sweep(w)
        # (299 of 300 — one node is unreachable in this random graph;
        # what matters is exact agreement with the full-width run)
        assert int(nar.n_scored) == int(full.n_scored) > 290
        np.testing.assert_array_equal(np.asarray(nar.order_log),
                                      np.asarray(full.order_log))
        np.testing.assert_array_equal(np.asarray(nar.scores),
                                      np.asarray(full.scores))
