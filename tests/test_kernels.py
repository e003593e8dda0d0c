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


@pytest.mark.slow
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


def _ref_bucket_keys(q, db, bucket):
    """Numpy model of the packed-key bucket reduction.

    Similarity is computed DIRECTLY (inter/union in f32) as the kernel
    does — deriving it as 1-(1-s) from the distance matrix double-rounds
    and differs by 1 ULP on some entries."""
    qb = np.unpackbits(np.asarray(q).view(np.uint8), axis=1)
    dbb = np.unpackbits(np.asarray(db).view(np.uint8), axis=1)
    inter = (qb @ dbb.T).astype(np.float32)
    union = qb.sum(1, dtype=np.float32)[:, None] + \
        dbb.sum(1, dtype=np.float32)[None, :] - inter
    sim = np.where(union > 0, inter / np.maximum(union, 1.0),
                   np.float32(1.0)).astype(np.float32)
    bits = sim.view(np.int32)
    local = np.arange(sim.shape[1], dtype=np.int32) % bucket
    keys = (bits & ~np.int32(bucket - 1)) | local
    return keys.reshape(sim.shape[0], -1, bucket).max(axis=2)


def test_bucketmin_kernel_matches_model(data):
    from rad_tpu.fp.kernels import (decode_bucket_keys,
                                    tanimoto_bucketmin_pallas)
    q, db = data
    ref = np.asarray(tanimoto_matrix(q, db))
    for bucket in (32, 64):
        keys = np.asarray(tanimoto_bucketmin_pallas(
            q, db, bucket=bucket, q_tile=128, n_tile=256, interpret=True))
        np.testing.assert_array_equal(keys, _ref_bucket_keys(q, db, bucket))
        d, gid = decode_bucket_keys(jnp.asarray(keys), bucket)
        d, gid = np.asarray(d), np.asarray(gid)
        # ids exact; decoded distance = truncated-sim (<= 2^-log2(bucket)
        # mantissa loss), never below the true winner distance
        col = np.arange(keys.shape[1]) * bucket
        win = ref.reshape(ref.shape[0], -1, bucket).argmin(axis=2)
        # ties: the kernel takes the LARGER index of equal-sim entries
        bucket_d = ref.reshape(ref.shape[0], -1, bucket).min(axis=2)
        chosen_d = ref[np.arange(ref.shape[0])[:, None], gid]
        np.testing.assert_allclose(chosen_d, bucket_d, atol=1e-6)
        assert (d >= chosen_d - 1e-6).all()
        assert (d <= chosen_d + 2.0 ** -14).all()
        del win, col


def test_bucketmin_approx_epilogue(data):
    """approx=True (VPU reciprocal epilogue): winner ids land on a
    near-minimal bucket entry (within ~2^-13 relative sim), decoded
    distances track the true bucket minimum."""
    from rad_tpu.fp.kernels import (decode_bucket_keys,
                                    tanimoto_bucketmin_pallas)
    q, db = data
    ref = np.asarray(tanimoto_matrix(q, db))
    bucket = 64
    keys = tanimoto_bucketmin_pallas(q, db, bucket=bucket, q_tile=128,
                                     n_tile=256, interpret=True,
                                     approx=True)
    d, gid = decode_bucket_keys(keys, bucket)
    d, gid = np.asarray(d), np.asarray(gid)
    bucket_d = ref.reshape(ref.shape[0], -1, bucket).min(axis=2)
    chosen_d = ref[np.arange(ref.shape[0])[:, None], gid]
    # the chosen entry's TRUE distance is within approx-reciprocal noise
    # of the bucket minimum, and the decoded key distance tracks it
    np.testing.assert_allclose(chosen_d, bucket_d, atol=2e-3)
    np.testing.assert_allclose(d, chosen_d, atol=2e-3)
    # ids stay in-bucket
    col = np.arange(keys.shape[1]) * bucket
    assert ((gid >= col) & (gid < col + bucket)).all()


def test_bucketmin_self_query(data):
    """Self rows win their own bucket at distance ~0 with exact identity."""
    from rad_tpu.fp.kernels import (decode_bucket_keys,
                                    tanimoto_bucketmin_pallas)
    _, db = data
    keys = tanimoto_bucketmin_pallas(db[:128], db, bucket=64, q_tile=128,
                                     n_tile=256, interpret=True)
    d, gid = decode_bucket_keys(keys, 64)
    d, gid = np.asarray(d), np.asarray(gid)
    rows = np.arange(128)
    own = rows // 64  # bucket containing the self column
    assert (gid[rows, own] == rows).all()
    np.testing.assert_allclose(d[rows, own], 0.0, atol=1e-6)
