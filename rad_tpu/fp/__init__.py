"""Packed binary fingerprints and Tanimoto distance (the metric layer).

TPU-native replacement for usearch's b1-packed storage + Tanimoto popcount
metric (reference call sites: /root/reference/README.md:47-53,
examples/DUDEZ_example.ipynb:92-118).
"""

from rad_tpu.fp.pack import (
    pack_fingerprints,
    unpack_fingerprints,
    popcount,
    popcount_rows,
    random_fingerprints,
    smiles_fingerprint,
    smiles_fingerprints,
)
from rad_tpu.fp.tanimoto import (
    tanimoto_distance,
    tanimoto_matrix,
    bruteforce_topk,
)

__all__ = [
    "pack_fingerprints",
    "unpack_fingerprints",
    "popcount",
    "popcount_rows",
    "random_fingerprints",
    "smiles_fingerprint",
    "smiles_fingerprints",
    "tanimoto_distance",
    "tanimoto_matrix",
    "bruteforce_topk",
    "tanimoto_matrix_pallas",
    "tanimoto_nn_pallas",
    "tanimoto_bucketmin_pallas",
    "decode_bucket_keys",
]


def __getattr__(name):
    # pallas kernels import lazily (they pull in pallas machinery)
    if name in ("tanimoto_matrix_pallas", "tanimoto_nn_pallas",
                "tanimoto_bucketmin_pallas", "decode_bucket_keys"):
        from rad_tpu.fp import kernels

        return getattr(kernels, name)
    raise AttributeError(f"module 'rad_tpu.fp' has no attribute {name!r}")
