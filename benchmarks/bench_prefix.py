#!/usr/bin/env python
"""Two-stage prefix-filtered beam search: recall + throughput sweep.

The pHNSW/AQR-style screen (PAPERS.md): rank each candidate wave by
Tanimoto over a compact [N, prefix_words] array, give only the best
``keep`` full-width distances. Cuts the dominant per-iteration cost of
the batched beam (the [E*M0, W] fingerprint gather) by ~W/pw while the
merge sort shrinks from ef+E*M0 to ef+keep keys.

    python benchmarks/bench_prefix.py --n 100000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--q", type=int, default=512)
    ap.add_argument("--n-bits", type=int, default=1024)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--connectivity", type=int, default=16)
    ap.add_argument("--expansion-add", type=int, default=128)
    ap.add_argument("--ef", type=int, default=64)
    ap.add_argument("--expand-width", type=int, default=4)
    ap.add_argument("--configs", default="0:0,128:32,128:64,256:32,256:64",
                    help="comma list of prefixbits:keep (0:0 = baseline)")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from enrichment_example import make_library
    from rad_tpu.fp.tanimoto import bruteforce_topk_blocked
    from rad_tpu.search.knn import search_device

    fps, _, _ = make_library(args.n, args.n_bits, seed=0)
    rng = np.random.default_rng(99)
    queries = fps[rng.choice(args.n, args.q, replace=False)]
    log(f"building {args.n}-node graph (native) ...")
    t0 = time.perf_counter()
    from rad_tpu.native import build_hnsw_native
    graph = build_hnsw_native(fps, connectivity=args.connectivity,
                              expansion_add=args.expansion_add, seed=0)
    log(f"build: {time.perf_counter() - t0:.1f}s")
    keys = np.asarray(graph.keys)

    log("exact ground truth ...")
    _, true_ids = bruteforce_topk_blocked(
        jnp.asarray(queries), jnp.asarray(fps), args.k, block=1 << 14)
    true_sets = [set(np.asarray(true_ids)[i].tolist())
                 for i in range(args.q)]

    results = []
    for spec in args.configs.split(","):
        pf, keep = (int(x) for x in spec.split(":"))
        kw = dict(k=args.k, expansion_search=args.ef,
                  expand_width=args.expand_width)
        if pf:
            kw.update(prefix_filter=pf, prefix_keep=keep)
        _, ids = search_device(graph, queries, **kw)  # compile + warm
        t0 = time.perf_counter()
        _, ids = search_device(graph, queries, **kw)
        ids = np.asarray(ids)
        dt = time.perf_counter() - t0
        mapped = keys[np.maximum(ids, 0)]
        recall = float(np.mean([
            len(set(mapped[i].tolist()) & true_sets[i]) / args.k
            for i in range(args.q)
        ]))
        qps = args.q / dt
        log(f"prefix={pf:4d} keep={keep:3d}  recall@{args.k}={recall:.3f}"
            f"  {qps:.0f} q/s")
        results.append({"prefix_bits": pf, "keep": keep,
                        "recall": recall, "qps": qps})

    print(json.dumps({
        "metric": "prefix_filter_sweep",
        "n": args.n,
        "ef": args.ef,
        "results": results,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
