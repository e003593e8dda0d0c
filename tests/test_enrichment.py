"""End-to-end enrichment regression: the system's reason to exist.

The reference's headline claim is >50% of top scorers found while scoring
~1-10% of the library (reference index.html:628, examples notebook). This
test reproduces it on the synthetic DUDE-Z analogue."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from enrichment_example import make_library, run_enrichment  # noqa: E402
import pytest


@pytest.mark.slow
def test_enrichment_beats_random():
    res = run_enrichment(n=2000, n_bits=256, frac_score=0.1,
                         connectivity=8, expansion_add=48, n_top=50,
                         seed=3, backend="host", verbose=False)
    assert res["n_scored"] >= 200
    # traversal must concentrate on good scorers far beyond random sampling
    assert res["enrichment"] >= 0.5, res
    assert res["enrichment_factor"] >= 3.0, res


def test_library_scores_correlate_with_similarity():
    import numpy as np
    packed, scores, smiles = make_library(500, 256, seed=1)
    assert packed.shape == (500, 8)
    assert len(smiles) == 500
    # smooth score landscape: the best scorers are well-separated from the
    # bulk (a similarity gradient exists for the traversal to follow)
    top = np.argsort(scores)[:30]
    assert scores[top].max() < np.median(scores)
