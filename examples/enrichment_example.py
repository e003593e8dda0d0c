#!/usr/bin/env python
"""End-to-end enrichment workflow (DUDE-Z analogue, self-contained).

Mirrors the reference's example notebook (examples/DUDEZ_example.ipynb):
pack fingerprints → build HNSW → prime + traverse a fraction of the library
with a lookup-table scoring function → measure enrichment (fraction of the
library's true top scorers found vs. fraction of the library scored).

The reference uses DUDE-Z DOCK scores for receptor AA2AR; offline we
synthesize the same structure: a target fingerprint defines "binding", a
planted cluster of actives is similar to the target, and the scoring
function returns a DOCK-like score that correlates with target similarity.
RAD's claim (reference index.html:628) is finding >50% of top scorers while
scoring ~1-10%; this example reproduces that behavior and prints the curve.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def make_library(n: int = 4000, n_bits: int = 512, mutation: float = 0.06,
                 seed: int = 0):
    """Synthetic screening library shaped like a real chemical library.

    Real ultra-large libraries are manifolds of analog series — similar
    molecules exist at every similarity radius, which is exactly the
    structure RAD's score-guided traversal exploits. We reproduce it with a
    mutation tree: each molecule is a mutated copy of a random earlier
    molecule, so fingerprint similarity decays smoothly with tree distance.
    DOCK-like scores are a smooth function of similarity to a target
    pharmacophore plus noise (lower = better).

    Returns (packed_fps [n, n_bits/32], true_scores [n], smiles list).
    """
    from rad_tpu.fp import pack_fingerprints

    rng = np.random.default_rng(seed)
    density = 0.12
    bits = np.zeros((n, n_bits), dtype=np.uint8)
    bits[0] = rng.random(n_bits) < density
    for i in range(1, n):
        parent = rng.integers(0, i)
        child = bits[parent].copy()
        flip = rng.random(n_bits) < mutation
        child[flip] = rng.random(int(flip.sum())) < density
        if not child.any():
            child[rng.integers(0, n_bits)] = 1
        bits[i] = child
    packed = pack_fingerprints(bits)

    # target pharmacophore: a molecule deep in the tree, so a similarity
    # gradient toward it exists across the manifold
    target = bits[rng.integers(n // 2, n)]
    inter = (bits & target).sum(1)
    union = (bits | target).sum(1)
    tani_dist = 1.0 - inter / np.maximum(union, 1)
    scores = 50.0 * tani_dist - 40.0 + rng.normal(0, 0.25, n)
    smiles = [f"MOL_{i}" for i in range(n)]
    return packed, scores.astype(np.float64), smiles


def make_library_batched(n: int, n_bits: int = 1024, mutation: float = 0.06,
                         seed: int = 0, batch: int = 1 << 20):
    """Vectorized :func:`make_library` for multi-million-row benchmarks.

    Same statistical shape — every molecule is a mutated copy of an
    earlier one, so similarity decays smoothly with tree distance — but
    children are generated a ``batch`` at a time with parents drawn from
    a capped reservoir of earlier rows instead of one sequential Python
    loop per row (the loop form costs ~1 min per 100k rows on this host;
    10M would be hours). Scores are the same smooth
    distance-to-pharmacophore function, computed on packed rows.

    Returns (packed_fps [n, n_bits/32], true_scores [n]) — no SMILES list
    (10M strings is ~1 GB of host RAM; build/traversal benchmarks never
    read it).
    """
    from rad_tpu.fp import pack_fingerprints
    from rad_tpu.fp.pack import popcount_rows_np

    rng = np.random.default_rng(seed)
    density = 0.12
    seed_n = min(n, 4096)
    bits = np.zeros((seed_n, n_bits), dtype=np.uint8)
    bits[0] = rng.random(n_bits) < density
    for i in range(1, seed_n):
        parent = rng.integers(0, i)
        child = bits[parent].copy()
        flip = rng.random(n_bits) < mutation
        child[flip] = rng.random(int(flip.sum())) < density
        if not child.any():
            child[rng.integers(0, n_bits)] = 1
        bits[i] = child
    parts = [pack_fingerprints(bits)]
    pool = bits  # parent reservoir (refreshed per batch, capped)
    done = seed_n
    while done < n:
        b = min(batch, n - done)
        parents = rng.integers(0, pool.shape[0], size=b)
        child = pool[parents]
        flip = rng.random((b, n_bits)) < mutation
        child = np.where(flip, rng.random((b, n_bits)) < density,
                         child).astype(np.uint8)
        empty = np.flatnonzero(~child.any(axis=1))
        if empty.size:
            child[empty, rng.integers(0, n_bits, size=empty.size)] = 1
        parts.append(pack_fingerprints(child))
        keep = rng.choice(b, size=min(b, 8192), replace=False)
        pool = np.concatenate([pool, child[keep]])[-65536:]
        done += b
    packed = np.concatenate(parts)
    target = packed[rng.integers(n // 2, n)]
    pops = popcount_rows_np(packed).astype(np.float64)
    t_pop = float(popcount_rows_np(target[None])[0])
    inter = popcount_rows_np(packed & target[None]).astype(np.float64)
    tani_dist = 1.0 - inter / np.maximum(pops + t_pop - inter, 1)
    scores = 50.0 * tani_dist - 40.0 + rng.normal(0, 0.25, n)
    return packed, scores.astype(np.float64)


def run_enrichment(n: int = 4000, n_bits: int = 512, frac_score: float = 0.1,
                   connectivity: int = 12, expansion_add: int = 80,
                   n_top: int = 100, seed: int = 0, backend: str = "auto",
                   verbose: bool = True):
    """Build, traverse, and report enrichment. Returns a result dict."""
    from rad_tpu import HNSWIndex, create_local_traverser
    from rad_tpu.store.smiles_store import InMemorySmilesStore

    packed, true_scores, smiles = make_library(n, n_bits, seed=seed)
    score_table = {s: float(sc) for s, sc in zip(smiles, true_scores)}
    store = InMemorySmilesStore({i: s for i, s in enumerate(smiles)})

    t0 = time.perf_counter()
    index = HNSWIndex(ndim=n_bits, connectivity=connectivity,
                      expansion_add=expansion_add, backend=backend,
                      seed=seed)
    index.add(np.arange(n), packed)
    index.build()
    t_build = time.perf_counter() - t0

    def scoring_fn(smi: str) -> float:
        return score_table[smi]

    traverser = create_local_traverser(index, scoring_fn, smiles_store=store,
                                       batch_size=16, n_score_threads=1)
    t0 = time.perf_counter()
    traverser.prime()
    n_to_score = int(frac_score * n)
    stats = traverser.traverse(n_to_score=n_to_score)
    t_traverse = time.perf_counter() - t0

    mols = traverser.get_molecules()
    scored_keys = {int(np.asarray(index.graph.keys)[m[0]]) for m in mols}
    true_top = set(np.argsort(true_scores, kind="stable")[:n_top].tolist())
    found = len(true_top & scored_keys)
    enrichment = found / n_top
    random_expectation = len(mols) / n
    result = {
        "n": n,
        "n_scored": len(mols),
        "frac_scored": len(mols) / n,
        "top_n": n_top,
        "top_found": found,
        "enrichment": enrichment,
        "enrichment_factor": enrichment / max(random_expectation, 1e-9),
        "build_seconds": t_build,
        "traverse_seconds": t_traverse,
        "termination": stats.get("termination_reason"),
    }
    traverser.shutdown()
    if verbose:
        print(f"library {n} | scored {result['n_scored']} "
              f"({100*result['frac_scored']:.1f}%) | "
              f"top-{n_top} found: {found} ({100*enrichment:.0f}%) | "
              f"enrichment factor {result['enrichment_factor']:.1f}x | "
              f"build {t_build:.2f}s traverse {t_traverse:.2f}s")
    return result


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4000)
    ap.add_argument("--n-bits", type=int, default=512)
    ap.add_argument("--frac", type=float, default=0.1)
    ap.add_argument("--backend", default="auto",
                    choices=["auto", "native", "host", "device"])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    res = run_enrichment(n=args.n, n_bits=args.n_bits,
                         frac_score=args.frac, backend=args.backend,
                         seed=args.seed)
    return 0 if res["enrichment"] > 0.5 else 1


if __name__ == "__main__":
    sys.exit(main())
