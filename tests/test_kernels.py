"""Pallas Tanimoto kernel correctness (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rad_tpu.fp import random_fingerprints, tanimoto_matrix
from rad_tpu.fp.kernels import tanimoto_matrix_pallas, tanimoto_nn_pallas


@pytest.fixture(scope="module")
def data():
    db = random_fingerprints(1024, n_bits=256, density=0.15, seed=41)
    q = random_fingerprints(256, n_bits=256, density=0.15, seed=42)
    return jnp.asarray(q), jnp.asarray(db)


def test_matrix_kernel_matches_swar(data):
    q, db = data
    ref = np.asarray(tanimoto_matrix(q, db))
    out = np.asarray(tanimoto_matrix_pallas(q, db, q_tile=128, n_tile=256,
                                            interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_nn_kernel_matches_bruteforce(data):
    q, db = data
    ref = np.asarray(tanimoto_matrix(q, db))
    ref_min = ref.min(axis=1)
    ref_arg = ref.argmin(axis=1)
    d, ids = tanimoto_nn_pallas(q, db, q_tile=128, n_tile=256,
                                interpret=True)
    d, ids = np.asarray(d), np.asarray(ids)
    np.testing.assert_allclose(d, ref_min, atol=1e-5)
    # argmin may differ only on exact ties
    tie_free = ref_min != np.partition(ref, 1, axis=1)[:, 1]
    np.testing.assert_array_equal(ids[tie_free], ref_arg[tie_free])


def test_nn_kernel_self_query(data):
    q, db = data
    d, ids = tanimoto_nn_pallas(db[:128], db, q_tile=128, n_tile=256,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ids), np.arange(128))


def test_nn_kernel_approx_epilogue(data):
    """Fast epilogue (approx reciprocal + packed-key argmax): distances
    within ~1e-3 of exact, neighbor identity exact outside ties."""
    q, db = data
    ref = np.asarray(tanimoto_matrix(q, db))
    ref_min = ref.min(axis=1)
    d, ids = tanimoto_nn_pallas(q, db, q_tile=128, n_tile=256,
                                interpret=True, approx=True)
    d, ids = np.asarray(d), np.asarray(ids)
    np.testing.assert_allclose(d, ref_min, atol=2e-3)
    # the chosen neighbor's true distance equals the true min (modulo ties)
    chosen = ref[np.arange(ref.shape[0]), ids]
    np.testing.assert_allclose(chosen, ref_min, atol=2e-3)
