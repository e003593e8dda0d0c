"""Decompose the traversal step's latency (exhaustive 1M sweep probes).

Exhaustive sweeps are step-latency bound (total pops ≈ n_rows regardless
of traversal path), so timing the full sweep with individual step
components stubbed out isolates their cost without changing total work:

  baseline   — production fused step
  no-dedup   — first_occurrence stubbed to a pass-through mask (semantics
               deliberately broken: duplicate log entries possible; the
               sweep still terminates because enqueued/scored stay exact)
  cheap-score— scorer reads only the popcount (no [K, W] fingerprint
               gather + popcount reduction)

Each probe is one compile. Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--buffer", type=int, default=1 << 14)
    ap.add_argument("--frontier", type=int, default=1 << 20)
    ap.add_argument("--graph-cache", default=None)
    ap.add_argument("--probes", nargs="+",
                    default=["baseline", "no-dedup", "cheap-score"],
                    help="also: narrow-<W> (fused_run narrow_width=W, "
                         "e.g. narrow-1024) — the exhaustive-tail "
                         "padded-slot trim, bit-identical semantics")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from rad_tpu.fp import random_fingerprints
    from rad_tpu.fp.pack import popcount_rows
    from rad_tpu.fp.tanimoto import tanimoto_matrix
    from rad_tpu.traverse import device as dev

    log(f"device: {jax.devices()[0]}")
    if args.graph_cache and os.path.exists(args.graph_cache):
        from rad_tpu.graph.storage import HNSWGraph
        graph = HNSWGraph.load(args.graph_cache, mmap=False)
    else:
        from rad_tpu.native import build_hnsw_native
        fps = random_fingerprints(args.n, n_bits=1024, density=0.1, seed=0)
        graph = build_hnsw_native(fps, connectivity=16, expansion_add=128,
                                  seed=0)
        if args.graph_cache:
            graph.save(args.graph_cache)

    dg = dev.prepare_device_graph(graph)
    packed = jnp.asarray(np.asarray(graph.packed))
    pops = jnp.asarray(np.asarray(graph.popcounts))
    target = jnp.asarray(random_fingerprints(1, n_bits=graph.ndim,
                                             density=0.1, seed=7)[0])
    t_pop = popcount_rows(target[None, :])[0]
    n_top = graph.layer_sizes[graph.max_level]
    seed_ids = jnp.arange(n_top, dtype=jnp.int32)
    seed_scores = tanimoto_matrix(target[None, :], packed[:n_top])[0]

    # grab the descriptor itself, not the resolved function
    orig_fo = dev.DenseStateOps.__dict__["first_occurrence"]
    results = {}
    for probe in args.probes:
        if probe == "no-dedup":
            dev.DenseStateOps.first_occurrence = staticmethod(
                lambda v, s: v != s)
        else:
            dev.DenseStateOps.first_occurrence = orig_fo  # staticmethod obj
        if probe == "cheap-score":
            run = dev.make_device_run(
                dg, packed, pops,
                lambda fp_rows, pop_rows: pop_rows.astype(jnp.float32),
                batch=args.batch)

            def sweep(state):
                return run(state, jnp.int32(len(graph)))
        elif probe.startswith("narrow-"):
            width = int(probe.split("-", 1)[1])

            def sweep(state, w=width):
                return dev.fused_run(state, dg, packed, pops, target,
                                     t_pop, jnp.int32(len(graph)),
                                     batch=args.batch, narrow_width=w)
        else:
            def sweep(state):
                return dev.fused_run(state, dg, packed, pops, target,
                                     t_pop, jnp.int32(len(graph)),
                                     batch=args.batch)

        best = np.inf
        n_scored = steps = 0
        for i in range(3):
            state = dev.init_state(dg, args.frontier,
                                   buffer_capacity=args.buffer)
            state = dev.prime(state, dg, seed_ids, seed_scores)
            jax.block_until_ready(state)
            t0 = time.perf_counter()
            state = sweep(state)
            n_scored = int(state.n_scored)  # host readback = barrier
            dt = time.perf_counter() - t0
            steps = int(state.n_steps)
            if i > 0:  # skip compile run
                best = min(best, dt)
        results[probe] = {"seconds": best, "steps": steps,
                          "ms_per_step": 1e3 * best / max(steps, 1),
                          "n_scored": n_scored}
        log(f"{probe}: {best:.2f}s, {steps} steps, "
            f"{results[probe]['ms_per_step']:.3f} ms/step, "
            f"{n_scored} scored")
    dev.DenseStateOps.first_occurrence = orig_fo

    print(json.dumps({"metric": "step_probe", "n": len(graph),
                      "batch": args.batch, "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
