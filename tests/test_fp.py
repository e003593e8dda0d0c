"""Tests for the fingerprint packing + Tanimoto metric layer."""

import jax.numpy as jnp
import numpy as np
import pytest

from rad_tpu.fp import (
    bruteforce_topk,
    pack_fingerprints,
    popcount,
    popcount_rows,
    random_fingerprints,
    smiles_fingerprint,
    smiles_fingerprints,
    tanimoto_distance,
    tanimoto_matrix,
    unpack_fingerprints,
)
from rad_tpu.fp.pack import popcount_rows_np
from rad_tpu.fp.tanimoto import (
    bruteforce_topk_blocked,
    tanimoto_matrix_mxu,
    unpack_to_dtype,
)


def _numpy_tanimoto(a_bits, b_bits):
    inter = np.sum((a_bits & b_bits) != 0)
    union = np.sum((a_bits | b_bits) != 0)
    return 1.0 - (inter / union if union else 1.0)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    bits = (rng.random((17, 100)) < 0.3).astype(np.uint8)
    packed = pack_fingerprints(bits)
    assert packed.shape == (17, 4)
    assert packed.dtype == np.uint32
    back = unpack_fingerprints(packed, n_bits=100)
    np.testing.assert_array_equal(bits, back)


def test_popcount_matches_python():
    vals = np.array([0, 1, 0xFFFFFFFF, 0x0F0F0F0F, 0x80000000, 12345678],
                    dtype=np.uint32)
    expected = np.array([bin(v).count("1") for v in vals.tolist()])
    np.testing.assert_array_equal(np.asarray(popcount(jnp.asarray(vals))),
                                  expected)
    np.testing.assert_array_equal(popcount_rows_np(vals[None, :]),
                                  expected.sum())


def test_popcount_rows():
    fps = random_fingerprints(50, n_bits=256, seed=1)
    dev = np.asarray(popcount_rows(jnp.asarray(fps)))
    host = popcount_rows_np(fps)
    bits = unpack_fingerprints(fps)
    np.testing.assert_array_equal(dev, bits.sum(axis=1))
    np.testing.assert_array_equal(host, bits.sum(axis=1))


def test_tanimoto_matches_numpy_reference():
    fps = random_fingerprints(20, n_bits=128, density=0.25, seed=3)
    bits = unpack_fingerprints(fps)
    d = np.asarray(tanimoto_matrix(jnp.asarray(fps[:5]), jnp.asarray(fps)))
    for i in range(5):
        for j in range(20):
            assert d[i, j] == pytest.approx(
                _numpy_tanimoto(bits[i], bits[j]), abs=1e-6)


def test_tanimoto_identity_and_range():
    fps = jnp.asarray(random_fingerprints(30, n_bits=512, seed=4))
    d = np.asarray(tanimoto_matrix(fps, fps))
    np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-6)
    assert (d >= -1e-6).all() and (d <= 1.0 + 1e-6).all()
    np.testing.assert_allclose(d, d.T, atol=1e-6)


def test_tanimoto_empty_sets():
    a = jnp.zeros((1, 4), jnp.uint32)
    b = jnp.zeros((1, 4), jnp.uint32)
    assert float(tanimoto_distance(a, b)[0]) == 0.0


def test_mxu_path_matches_swar():
    fps = random_fingerprints(64, n_bits=256, seed=5)
    q, db = fps[:8], fps
    ref = np.asarray(tanimoto_matrix(jnp.asarray(q), jnp.asarray(db)))
    qu = unpack_to_dtype(jnp.asarray(q))
    dbu = unpack_to_dtype(jnp.asarray(db))
    qp = popcount_rows(jnp.asarray(q))
    dbp = popcount_rows(jnp.asarray(db))
    mxu = np.asarray(tanimoto_matrix_mxu(qu, dbu, qp, dbp))
    np.testing.assert_allclose(mxu, ref, atol=1e-5)


def test_bruteforce_topk_exact():
    fps = random_fingerprints(300, n_bits=128, seed=6)
    q = fps[:4]
    d, ids = bruteforce_topk(jnp.asarray(q), jnp.asarray(fps), 10)
    d, ids = np.asarray(d), np.asarray(ids)
    full = np.asarray(tanimoto_matrix(jnp.asarray(q), jnp.asarray(fps)))
    for i in range(4):
        ref_sorted = np.sort(full[i])[:10]
        np.testing.assert_allclose(np.sort(d[i]), ref_sorted, atol=1e-6)
    # self is nearest
    np.testing.assert_array_equal(ids[:, 0], np.arange(4))


def test_bruteforce_topk_blocked_matches_dense():
    fps = random_fingerprints(500, n_bits=128, seed=8)
    q = jnp.asarray(fps[:3])
    db = jnp.asarray(fps)
    d1, i1 = bruteforce_topk(q, db, 7)
    d2, i2 = bruteforce_topk_blocked(q, db, 7, block=128)
    np.testing.assert_allclose(np.sort(np.asarray(d1)), np.sort(np.asarray(d2)),
                               atol=1e-6)


def test_smiles_fingerprints_deterministic_and_similar():
    a = smiles_fingerprint("CCO", n_bits=512)
    b = smiles_fingerprint("CCO", n_bits=512)
    np.testing.assert_array_equal(a, b)
    batch = smiles_fingerprints(["CCO", "CCN", "c1ccccc1"], n_bits=512)
    assert batch.shape == (3, 16)
    # similar molecules are closer than dissimilar ones
    d = np.asarray(tanimoto_matrix(jnp.asarray(batch), jnp.asarray(batch)))
    assert d[0, 1] < d[0, 2]


def test_coerce_packed_three_layouts():
    """uint32-packed, 0/1 bits, and np.packbits uint8 rows all normalize
    to the identical packed array (the reference's ingestion layouts,
    reference README.md:58-63)."""
    from rad_tpu.fp.pack import coerce_packed

    rng = np.random.default_rng(0)
    bits = (rng.random((5, 256)) < 0.3).astype(np.uint8)
    packed = pack_fingerprints(bits)
    packbits_rows = np.packbits(bits, axis=1)  # bitorder='big' default

    np.testing.assert_array_equal(coerce_packed(packed, 256), packed)
    np.testing.assert_array_equal(coerce_packed(bits, 256), packed)
    np.testing.assert_array_equal(coerce_packed(packbits_rows, 256), packed)
    # 1-D single fingerprint
    np.testing.assert_array_equal(coerce_packed(packbits_rows[0], 256),
                                  packed[:1])
    # int64 packed words pass through (legacy accepted layout)
    np.testing.assert_array_equal(
        coerce_packed(packed.astype(np.int64), 256), packed)


def test_coerce_packed_rejects_garbage():
    from rad_tpu.fp.pack import coerce_packed

    with pytest.raises(ValueError):
        coerce_packed(np.zeros((3, 7), np.uint32), 256)  # wrong width
    with pytest.raises(ValueError):
        coerce_packed(np.zeros((3, 8), np.float32), 256)  # float "packed"
    with pytest.raises(ValueError):
        coerce_packed(np.zeros((2, 2, 8), np.uint32), 256)  # 3-D
