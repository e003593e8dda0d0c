"""The README quick-start, executed verbatim in spirit — docs must work."""

import os

import numpy as np
import pytest


@pytest.mark.slow
def test_readme_quickstart(tmp_path):
    from rad_tpu import HNSWIndex, create_local_traverser
    from rad_tpu.store import SQLiteSmilesStore, create_smiles_db
    from rad_tpu.fp import random_fingerprints

    n = 300
    keys = np.arange(n)
    packed_fps = random_fingerprints(n, n_bits=1024, seed=0)

    # 1. build
    index = HNSWIndex(ndim=1024, dtype="b1", metric="tanimoto",
                      connectivity=16, expansion_add=400)
    index.add(keys, packed_fps)
    index.build()
    index.save(str(tmp_path / "library.rad.npz"))

    # 2. k-NN
    dists, out_keys = index.search(packed_fps[:3], k=10,
                                   expansion_search=128)
    assert dists.shape == (3, 10)
    assert out_keys[0, 0] == 0 and dists[0, 0] == 0

    # 3. traversal
    db = str(tmp_path / "smiles.db")
    create_smiles_db(db, ((int(k), f"SMILES_{int(k)}") for k in keys))
    store = SQLiteSmilesStore(db)
    rng = np.random.default_rng(0)
    table = {f"SMILES_{i}": float(s)
             for i, s in enumerate(rng.permutation(n))}

    def scoring_fn(smiles: str) -> float:
        return table[smiles]

    traverser = create_local_traverser(index, scoring_fn,
                                       smiles_store=store,
                                       n_score_threads=1)
    traverser.prime()
    traverser.traverse(n_to_score=100)
    best = traverser.get_best_molecules(10)
    assert len(best) == 10
    assert best[0][1] == min(m[1] for m in traverser.get_molecules())
    assert best[0][2].startswith("SMILES_")
    traverser.shutdown()


def test_dudez_notebook_cells_execute(tmp_path, monkeypatch):
    """The DUDE-Z walkthrough notebook's code cells run end-to-end (scaled
    down) — the artifact users start from must not rot."""
    import json
    import sys

    import matplotlib
    matplotlib.use("Agg")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    nb = json.load(open(os.path.join(root, "examples",
                                     "DUDEZ_example.ipynb")))
    src = "\n".join("".join(c["source"]) for c in nb["cells"]
                    if c["cell_type"] == "code")
    # scale down for CI: 4k molecules, fast build, 1k budget
    src = (src.replace("n=40_000", "n=4_000")
              .replace("expansion_add=400", "expansion_add=32")
              .replace("n_to_score=10_000", "n_to_score=1_000")
              .replace("plt.show()", "plt.close()"))
    monkeypatch.syspath_prepend(os.path.join(root, "examples"))
    ns: dict = {}
    exec(compile(src, "DUDEZ_example.ipynb", "exec"), ns)
    assert ns["stats"]["n_scored"] >= 1_000
    assert ns["curve"][-1] > 0.5  # at 25% scored, most of top-100 found
