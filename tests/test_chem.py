"""Dependency-free chemistry: SMILES parser + Morgan/ECFP fingerprints.

The real-chemistry validation path (VERDICT r2 item #6): fingerprints
must be structural (SMILES-writing-order invariant), chemically sane
(similar structures -> high Tanimoto), and batch-packable into the
library build format.
"""

import numpy as np
import pytest

from rad_tpu.chem import (morgan_fingerprint, morgan_fingerprints_packed,
                          parse_smiles)
from rad_tpu.chem.library import make_smiles_library
from rad_tpu.chem.morgan import SmilesError


def test_parse_basic_molecules():
    m = parse_smiles("CCO")  # ethanol
    assert m.n_atoms == 3 and len(m.bonds) == 2
    assert [a.h_count for a in m.atoms] == [3, 2, 1]

    benzene = parse_smiles("c1ccccc1")
    assert benzene.n_atoms == 6 and len(benzene.bonds) == 6
    assert all(a.aromatic and a.in_ring and a.h_count == 1
               for a in benzene.atoms)

    aspirin = parse_smiles("CC(=O)Oc1ccccc1C(=O)O")
    assert aspirin.n_atoms == 13 and len(aspirin.bonds) == 13

    pyridine = parse_smiles("c1ccncc1")
    n_atom = next(a for a in pyridine.atoms if a.element == "N")
    assert n_atom.h_count == 0

    charged = parse_smiles("[N+](=O)[O-]")
    assert charged.atoms[0].charge == 1
    assert charged.atoms[2].charge == -1


def test_parse_errors():
    for bad in ("C(", "C)", "C1CC", "[Xx]", "C%1", ""):
        with pytest.raises(SmilesError):
            parse_smiles(bad)


def test_ring_perception():
    # all cyclohexane atoms in-ring, regardless of closure placement
    for smi in ("C1CCCCC1", "C2CCCCC2"):
        assert all(a.in_ring for a in parse_smiles(smi).atoms)
    # toluene: methyl carbon is NOT in a ring
    tol = parse_smiles("Cc1ccccc1")
    assert not tol.atoms[0].in_ring
    assert all(a.in_ring for a in tol.atoms[1:])
    # diphenylmethane: the CH2 bridge is NOT in a ring
    dpm = parse_smiles("c1ccccc1Cc1ccccc1")
    bridge = dpm.atoms[6]
    assert bridge.element == "C" and not bridge.in_ring


@pytest.mark.parametrize("a,b", [
    ("c1ccccc1C(=O)O", "OC(=O)c1ccccc1"),
    ("CC(=O)Oc1ccccc1C(=O)O", "OC(=O)c1ccccc1OC(C)=O"),
    ("C1CCCCC1", "C2CCCCC2"),
    ("CCO", "OCC"),
    ("c1ccc2ccccc2c1", "c1ccc2c(c1)cccc2"),
    ("CC(N)C(=O)O", "OC(=O)C(C)N"),
])
def test_fingerprint_writing_order_invariant(a, b):
    np.testing.assert_array_equal(morgan_fingerprint(a),
                                  morgan_fingerprint(b))


def test_similarity_is_chemical():
    def tan(x, y):
        fx, fy = morgan_fingerprint(x), morgan_fingerprint(y)
        return int((fx & fy).sum()) / int((fx | fy).sum())

    # homologous series closer than unrelated structures
    assert tan("CCO", "CCCO") > tan("CCO", "c1ccccc1")
    assert tan("CC(=O)Oc1ccccc1C(=O)O", "OC(=O)c1ccccc1O") > 0.3
    # identical molecule -> identical fingerprint
    assert tan("c1ccncc1", "c1ccncc1") == 1.0


def test_radius_and_bits():
    fp0 = morgan_fingerprint("CCO", radius=0)
    fp2 = morgan_fingerprint("CCO", radius=2)
    assert fp2.sum() > fp0.sum()
    fp_small = morgan_fingerprint("CC(=O)Oc1ccccc1C(=O)O", n_bits=256)
    assert fp_small.shape == (256,)
    assert fp_small.sum() > 0


def test_library_generates_unique_parseable_molecules():
    smiles, scores = make_smiles_library(3000, seed=4)
    assert len(smiles) == len(set(smiles)) == 3000
    assert np.isfinite(scores).all()
    for s in smiles[:300]:
        parse_smiles(s)


def test_library_scores_follow_structure():
    """Additive SAR: molecules sharing a scaffold correlate in score more
    than random pairs (the coupling the traversal exploits)."""
    smiles, scores = make_smiles_library(3000, seed=4)
    from rad_tpu.chem.library import SCAFFOLDS
    # group by scaffold prefix (first 8 chars is scaffold-determined)
    groups = {}
    for s, sc in zip(smiles, scores):
        groups.setdefault(s[:8], []).append(sc)
    within = np.mean([np.var(v) for v in groups.values() if len(v) > 10])
    total = np.var(scores)
    assert within < total, (within, total)


def test_packed_batch():
    smiles, _ = make_smiles_library(64, seed=1)
    packed = morgan_fingerprints_packed(smiles, n_bits=512)
    assert packed.shape == (64, 16)
    assert packed.dtype == np.uint32
    # non-degenerate: distinct molecules mostly distinct fingerprints
    uniq = len({p.tobytes() for p in packed})
    assert uniq > 55
