#!/usr/bin/env python
"""Iterative ML-surrogate screening (the lsd.docking.org protocol).

The reference validates "billion-scale libraries ... with traditional
molecular docking and modern ML models (Chemprop)" (reference
index.html:631-632, README.md:206,213). The methodology behind that claim
is *active learning*: dock a seed batch, train a fast surrogate on the
docked scores, let the surrogate nominate the next batch, dock it,
retrain — every docking call is spent where the current model says the
library is most promising.

This example runs that loop with rad_tpu's device engine in both roles:

  * the **docking oracle** is the expensive scorer (a lookup table here,
    standing in for DOCK — the reference notebook's own device,
    reference examples/DUDEZ_example.ipynb scoring cell), applied via the
    id-indexed table-scorer pattern of examples/dudez_workflow.py;
  * the **surrogate** is the MLP of examples/ml_scorer_example.py,
    retrained each round on everything docked so far;
  * each round's nomination is a fully on-device traversal under the
    *surrogate* (``make_device_run`` — MLP inference compiled into the
    sweep, zero host round trips), from which the top-predicted undocked
    molecules are taken for docking.

Budget accounting is strict: only oracle calls count. The printed baseline
is the one-shot protocol at the same budget (all docking spent on a single
oracle-guided traversal — examples/dudez_workflow.py's shape).

    python examples/active_learning.py --n 20000 --budget-frac 0.06
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def run_traversal(graph, dg, fps_arg, pops_arg, scorer, prime_scores,
                  budget, batch):
    """One device traversal under ``scorer``; node ids in discovery order."""
    import jax.numpy as jnp

    from rad_tpu.traverse import device as dev

    run = dev.make_device_run(dg, fps_arg, pops_arg, scorer, batch=batch)
    state = dev.init_state(dg, frontier_capacity=1 << 16)
    n_top = graph.layer_sizes[graph.max_level]
    state = dev.prime(state, dg, jnp.arange(n_top, dtype=jnp.int32),
                      prime_scores)
    state = run(state, jnp.int32(budget))
    n = int(state.n_scored)
    return np.asarray(state.order_log)[:n]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--n-bits", type=int, default=512)
    ap.add_argument("--budget-frac", type=float, default=0.06,
                    help="total docking-oracle budget as a library "
                         "fraction, split evenly across rounds")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--explore-mult", type=int, default=4,
                    help="surrogate-traversal budget per round = "
                         "explore_mult x the round's docking budget "
                         "(surrogate calls are free: over-traverse, then "
                         "let predicted rank pick the docking batch)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from enrichment_example import make_library
    from ml_scorer_example import train_mlp_scorer

    from rad_tpu.native import build_hnsw_native, native_available
    from rad_tpu.traverse import device as dev

    packed, true_scores, _ = make_library(args.n, args.n_bits,
                                          seed=args.seed)
    if native_available():
        graph = build_hnsw_native(packed, connectivity=12,
                                  expansion_add=64, seed=args.seed)
    else:
        from rad_tpu.build.reference import build_hnsw
        graph = build_hnsw(packed, connectivity=12, expansion_add=64,
                           seed=args.seed)
    keys = np.asarray(graph.keys)
    scores_by_id = true_scores[keys]    # docking oracle (lower = better)
    true_top = set(np.argsort(scores_by_id, kind="stable")[:100].tolist())

    dg = dev.prepare_device_graph(graph)
    gp = np.asarray(graph.packed)
    packed_d = jnp.asarray(gp)
    pops_d = jnp.asarray(np.asarray(graph.popcounts))
    # oracle as an id-indexed device table riding the pops argument
    # (the dudez_workflow --device-scored pattern)
    table_j = jnp.asarray(scores_by_id.astype(np.float32))
    dummy_fps = jnp.zeros((len(keys), 1), jnp.uint8)
    n_top = graph.layer_sizes[graph.max_level]

    total_budget = int(args.budget_frac * args.n)
    per_round = total_budget // args.rounds

    # ---- round 0: seed by an oracle-guided traversal ----------------------
    t0 = time.perf_counter()
    # oracle traversals use a small batch (depth > width with an exact
    # scorer), surrogate traversals a wide one (hedge against model noise)
    # — the batch-depth analysis of docs/ARCHITECTURE.md
    seed_order = run_traversal(graph, dg, dummy_fps, table_j,
                               lambda _rows, t: t, table_j[:n_top],
                               per_round, batch=8)
    docked = {int(i): float(scores_by_id[i]) for i in seed_order.tolist()}
    print(f"seed round: docked {len(docked)} "
          f"(top-100 so far {len(true_top & set(docked))}/100)")

    # ---- active-learning rounds -------------------------------------------
    for r in range(1, args.rounds):
        ids = np.fromiter(docked.keys(), np.int64, len(docked))
        ys = np.fromiter(docked.values(), np.float32, len(docked))
        _, surrogate, loss = train_mlp_scorer(gp[ids], ys, args.n_bits,
                                              seed=args.seed + r)
        explore = min(args.explore_mult * per_round, args.n)
        order = run_traversal(graph, dg, packed_d, pops_d, surrogate,
                              surrogate(packed_d[:n_top], pops_d[:n_top]),
                              explore, batch=32)
        # dock the top-PREDICTED undocked nominees
        cand = np.asarray([i for i in order.tolist() if i not in docked],
                          dtype=np.int64)
        if cand.size == 0:
            break
        pred = np.asarray(surrogate(packed_d[cand], pops_d[cand]))
        take = cand[np.argsort(pred, kind="stable")[:per_round]]
        for i in take.tolist():
            docked[int(i)] = float(scores_by_id[i])
        print(f"round {r}: surrogate MSE {loss:.3f}, nominated "
              f"{cand.size}, docked +{take.size} (total {len(docked)}), "
              f"top-100 so far {len(true_top & set(docked))}/100")

    dt = time.perf_counter() - t0
    hit = len(true_top & set(docked))
    frac = 100 * len(docked) / args.n
    print(f"ACTIVE LEARNING: {hit}/100 of the true top-100 docked with "
          f"{len(docked)} oracle calls ({frac:.1f}% of the library) "
          f"in {dt:.1f}s")

    # ---- one-shot baseline at the SAME oracle budget ----------------------
    one_shot = run_traversal(graph, dg, dummy_fps, table_j,
                             lambda _rows, t: t, table_j[:n_top],
                             len(docked), batch=8)
    hit_os = len(true_top & set(one_shot.tolist()))
    print(f"ONE-SHOT baseline: {hit_os}/100 at the same "
          f"{len(one_shot)} oracle calls")
    return 0 if hit >= min(hit_os, 50) else 1


if __name__ == "__main__":
    sys.exit(main())
