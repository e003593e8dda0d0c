"""Dependency-free chemistry: SMILES parsing + Morgan/ECFP fingerprints.

The reference's fingerprints are RDKit Morgan r=2/1024-bit
(/root/reference/examples/DUDEZ_example.ipynb cells ~92-118); this package
provides a self-contained equivalent (no RDKit in this environment):
a SMILES parser producing a molecular graph and the ECFP circular
fingerprint algorithm (Rogers & Hahn, J. Chem. Inf. Model. 2010) over it.
Bit positions differ from RDKit's (different hash), but the fingerprints
are real chemistry: canonical-form invariant, substructure-driven, and
Tanimoto-comparable.
"""

from rad_tpu.chem.morgan import (
    MolGraph,
    initial_invariant_tuples,
    parse_smiles,
    morgan_fingerprint,
    morgan_fingerprints_packed,
)

__all__ = [
    "MolGraph",
    "initial_invariant_tuples",
    "parse_smiles",
    "morgan_fingerprint",
    "morgan_fingerprints_packed",
]
