"""One-process (batch × buffer × budget) grid over the fused traversal run.

Batch size and buffer capacity are pure performance knobs — results are
pinned invariant by tests (buffer-size invariance, host-order parity) — so
sweeping them on real hardware directly locates the engine's per-step cost
terms (buffer top_k vs merge frequency vs per-step overhead) without
semantic-breaking stubs. One process so every config shares the runtime
and the graph build/load cost is paid once.

Prints one JSON line per config plus a final summary line.
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
    ap.add_argument("--graph-cache", default="/tmp/g1m_exact.npz")
    ap.add_argument("--frontier", type=int, default=1 << 20)
    ap.add_argument("--configs", nargs="+", default=[
        # batch:buffer:budget_frac[:head]
        "256:16384:1.0",
        "256:4096:1.0",
        "256:1024:1.0",
        "1024:16384:1.0",
        "1024:131072:1.0",
        "256:16384:0.4",
        "256:16384:0.4:65536",
        "1024:131072:0.4",
    ])
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from rad_tpu.fp import popcount_rows, random_fingerprints
    from rad_tpu.fp.tanimoto import tanimoto_matrix
    from rad_tpu.traverse import device as dev

    log(f"device: {jax.devices()[0]}")
    if os.path.exists(args.graph_cache):
        from rad_tpu.graph.storage import HNSWGraph
        log(f"loading cached graph {args.graph_cache} ...")
        graph = HNSWGraph.load(args.graph_cache, mmap=False)
    else:
        from rad_tpu.native import build_hnsw_native
        log(f"building {args.n}-node graph (native) ...")
        fps = random_fingerprints(args.n, n_bits=1024, density=0.1, seed=0)
        t0 = time.perf_counter()
        graph = build_hnsw_native(fps, connectivity=16, expansion_add=128,
                                  seed=0)
        log(f"build: {time.perf_counter() - t0:.0f}s")
        graph.save(args.graph_cache)

    dg = dev.prepare_device_graph(graph)
    packed = jnp.asarray(np.asarray(graph.packed))
    pops = jnp.asarray(np.asarray(graph.popcounts))
    target = jnp.asarray(random_fingerprints(1, graph.ndim, 0.1, 7)[0])
    t_pop = popcount_rows(target[None, :])[0]
    n_top = graph.layer_sizes[graph.max_level]
    seed_ids = jnp.arange(n_top, dtype=jnp.int32)
    seed_scores = tanimoto_matrix(target[None, :], packed[:n_top])[0]
    n = len(graph)

    results = []
    for cfg in args.configs:
        parts = cfg.split(":")
        batch, buf = int(parts[0]), int(parts[1])
        frac = float(parts[2]) if len(parts) > 2 else 1.0
        head = int(parts[3]) if len(parts) > 3 else None
        n_to_score = int(frac * n)

        def fresh():
            s = dev.init_state(dg, frontier_capacity=args.frontier,
                               buffer_capacity=buf, head_capacity=head)
            return dev.prime(s, dg, seed_ids, seed_scores)

        log(f"--- {cfg}: compiling ...")
        state = fresh()
        t0 = time.perf_counter()
        state = dev.fused_run(state, dg, packed, pops, target, t_pop,
                              jnp.int32(n_to_score), batch=batch)
        scored = int(state.n_scored)
        log(f"    compile+run: {time.perf_counter() - t0:.0f}s")
        best = np.inf
        steps = 0
        for i in range(2):
            state = fresh()
            t0 = time.perf_counter()
            state = dev.fused_run(state, dg, packed, pops, target, t_pop,
                                  jnp.int32(n_to_score), batch=batch)
            scored = int(state.n_scored)  # host readback barrier
            dt = time.perf_counter() - t0
            best = min(best, dt)
            steps = int(state.n_steps)
        row = {"batch": batch, "buffer": buf, "budget_frac": frac,
               "head": head, "seconds": best, "steps": steps,
               "ms_per_step": 1e3 * best / max(steps, 1),
               "scored": scored, "nodes_per_sec": scored / best,
               "dropped": int(state.n_dropped)}
        results.append(row)
        log(f"    {cfg}: {scored / best:,.0f} nodes/s "
            f"({row['ms_per_step']:.3f} ms/step, {steps} steps)")
        print(json.dumps({"metric": "engine_grid_point", **row}),
              flush=True)

    print(json.dumps({"metric": "engine_grid", "n": n,
                      "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
