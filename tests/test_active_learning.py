"""Active-learning screening loop (the lsd.docking.org protocol).

Covers examples/active_learning.py: seed docking traversal -> MLP
surrogate -> surrogate-guided nomination -> docking of top predictions,
with strict oracle-budget accounting (the reference's "modern ML models
(Chemprop)" validation claim, reference index.html:631-632).
"""

import sys
from pathlib import Path
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


@pytest.mark.slow
def test_active_learning_enriches(capsys):
    from active_learning import main

    rc = main(["--n", "4000", "--n-bits", "256", "--budget-frac", "0.09",
               "--rounds", "3"])
    out = capsys.readouterr().out
    assert "ACTIVE LEARNING:" in out and "ONE-SHOT baseline:" in out
    # exit contract: AL >= min(one-shot, 50) of the true top-100
    assert rc == 0, out
