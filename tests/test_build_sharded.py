"""Mesh-sharded exact build (rad_tpu.build.exact_sharded).

The invariant: ``build_hnsw_exact(mesh=...)`` is EDGE-FOR-EDGE identical
to the single-device build — q-blocks and selection rows are
independent, and the sharded symmetrization's fold/all_to_all/merge tree
is a lossless truncation at every step (see the module docstring), so
distribution must not change a single neighbor. These tests pin that on
the 8-virtual-device CPU mesh, including the probed candidate stage and
the direct symmetrize driver against the global-sort oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rad_tpu.build.exact import _symmetrize, build_hnsw_exact
from rad_tpu.build.exact_sharded import symmetrize_sharded
from rad_tpu.fp.pack import random_fingerprints
from rad_tpu.parallel import make_mesh

BUILD_KW = dict(connectivity=8, seed=11, q_block=128, col_block=128,
                sel_block=128)


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(8, axis_names=("graph",))


@pytest.fixture(scope="module")
def fps():
    # big enough that layer 0 (and with m=8, layer 1) exceeds the mesh
    # padding unit 8*128=1024, so the sharded path actually engages
    return random_fingerprints(3000, n_bits=128, density=0.2, seed=7)


def _assert_graphs_equal(ga, gb):
    assert ga.levels.shape == gb.levels.shape
    np.testing.assert_array_equal(np.asarray(ga.levels),
                                  np.asarray(gb.levels))
    np.testing.assert_array_equal(np.asarray(ga.keys), np.asarray(gb.keys))
    assert len(ga.neighbors) == len(gb.neighbors)
    for l, (na, nb) in enumerate(zip(ga.neighbors, gb.neighbors)):
        np.testing.assert_array_equal(
            np.asarray(na), np.asarray(nb),
            err_msg=f"layer {l} adjacency differs")


@pytest.mark.slow
def test_sharded_build_bit_identical(fps, mesh8):
    g_single = build_hnsw_exact(fps, **BUILD_KW)
    g_mesh = build_hnsw_exact(fps, mesh=mesh8, **BUILD_KW)
    _assert_graphs_equal(g_single, g_mesh)


@pytest.mark.slow
def test_sharded_probed_build_bit_identical(fps, mesh8):
    kw = dict(BUILD_KW, probes=3, probe_csize=256)
    g_single = build_hnsw_exact(fps, **kw)
    g_mesh = build_hnsw_exact(fps, mesh=mesh8, **kw)
    _assert_graphs_equal(g_single, g_mesh)


@pytest.mark.slow
def test_sharded_build_small_library_falls_back(mesh8):
    # n < the mesh padding unit: every layer keeps the single-device
    # path; mesh= must still produce the identical graph
    fps = random_fingerprints(500, n_bits=128, density=0.2, seed=3)
    g_single = build_hnsw_exact(fps, **BUILD_KW)
    g_mesh = build_hnsw_exact(fps, mesh=mesh8, **BUILD_KW)
    _assert_graphs_equal(g_single, g_mesh)


@pytest.mark.slow
def test_symmetrize_sharded_matches_global_sort(mesh8):
    # direct driver check against the single-sort oracle, with mutual
    # selections (the cross-device (dst, src) duplicate case) guaranteed
    # by m ~ n/4
    rng = np.random.default_rng(5)
    n_pad, m, cap, n_real = 2048, 12, 8, 2000
    # real selection invariants: per-row dsts are distinct and never
    # self, and a directed edge carries the true pair distance, so the
    # two copies of a mutual pair agree bit-for-bit
    dist = rng.random((n_real, n_real), dtype=np.float32)
    dist = np.minimum(dist, dist.T)
    sel = np.full((n_pad, m), -1, np.int32)
    d = np.full((n_pad, m), np.inf, np.float32)
    for i in range(n_real):
        others = rng.choice(n_real - 1, size=m, replace=False)
        others = np.where(others >= i, others + 1, others)
        sel[i] = others
        d[i] = dist[i, others]
    # guarantee mutual selections (the cross-device duplicate case)
    for i in range(0, 512, 2):
        sel[i, 0], sel[i + 1, 0] = i + 1, i
        d[i, 0] = d[i + 1, 0] = dist[i, i + 1]
    oracle = np.asarray(_symmetrize(jnp.asarray(sel), jnp.asarray(d),
                                    n_real, cap))
    sharded = np.asarray(symmetrize_sharded(
        jnp.asarray(sel), jnp.asarray(d), n_real, cap, mesh8, "graph"))
    np.testing.assert_array_equal(oracle, sharded)


def test_sharded_rejects_unsplittable_shapes(mesh8):
    from rad_tpu.build.exact_sharded import allpairs_topk_sharded
    packed = jnp.zeros((1024 + 128, 4), jnp.uint32)  # 9 q-blocks / 8 devs
    with pytest.raises(ValueError, match="divide"):
        allpairs_topk_sharded(packed, 1000, 16, 128, 128, False, None,
                              None, False, mesh8, "graph")
