"""The DUDE-Z workflow example reproduces the reference's headline claim
(>50% of top scorers found at ≤10% scored, reference index.html:628) on the
faithful-proxy library, and emits a sane enrichment curve."""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(ROOT, "examples", "dudez_workflow.py")


@pytest.mark.slow
def test_dudez_workflow_headline(tmp_path):
    out = tmp_path / "dudez.json"
    env = dict(os.environ, PYTHONPATH=ROOT, JAX_PLATFORMS="cpu",
               XLA_FLAGS="")
    r = subprocess.run(
        [sys.executable, SCRIPT, "--n", "12000", "--expansion-add", "48",
         "--json-out", str(out)],
        capture_output=True, text=True, env=env, timeout=560)
    assert r.returncode == 0, r.stdout + r.stderr
    rec = json.loads(out.read_text())
    curve = {float(k): v for k, v in rec["curve"].items()}
    # headline: >50% of the true top-100 at <=10% scored
    assert rec["at_10pct"] > 0.5, rec
    # the curve is a cumulative prefix statistic: monotone non-decreasing
    xs = sorted(curve)
    ys = [curve[x] for x in xs]
    assert all(b >= a for a, b in zip(ys, ys[1:]))
    # and meaningfully better than random at 5%
    assert curve[0.05] > 3 * 0.05, curve


@pytest.mark.slow
def test_dudez_workflow_morgan_chemistry(tmp_path):
    """Real-chemistry mode: combinatorial drug-like SMILES + in-tree
    Morgan/ECFP fingerprints reproduce the enrichment behavior (VERDICT r2
    item #6 — the non-proxy validation path)."""
    out = tmp_path / "dudez_morgan.json"
    env = dict(os.environ, PYTHONPATH=ROOT, JAX_PLATFORMS="cpu",
               XLA_FLAGS="")
    r = subprocess.run(
        [sys.executable, SCRIPT, "--chemistry", "morgan", "--n", "12000",
         "--expansion-add", "48", "--json-out", str(out)],
        capture_output=True, text=True, env=env, timeout=560)
    assert r.returncode == 0, r.stdout + r.stderr
    rec = json.loads(out.read_text())
    assert rec["at_10pct"] > 0.5, rec
    curve = {float(k): v for k, v in rec["curve"].items()}
    # small-scale libraries reach the active scaffold later than the 40k
    # flagship run (64% at 1% there); gate on clearly-better-than-random
    # at the 10% budget
    assert curve[0.10] > 3 * 0.10, curve
