#!/usr/bin/env python
"""Graph-construction throughput: native C++ vs batched on-device builder.

The reference's build path is usearch's multithreaded C++ insert loop
(SURVEY.md §2 row 1). Here:
  * native — rad_tpu/native (per-node-locked threads, POPCNT distance);
  * device — rad_tpu/build/device (batched insertion on the accelerator).

    python benchmarks/bench_build.py --n 50000
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
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--n-bits", type=int, default=1024)
    ap.add_argument("--connectivity", type=int, default=16)
    ap.add_argument("--expansion-add", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--skip-device", action="store_true")
    ap.add_argument("--skip-native", action="store_true")
    ap.add_argument("--fused-loop", action="store_true",
                    help="compile the whole insertion sweep into ONE "
                         "program (scan over batches) — amortizes the "
                         "per-batch dispatch RTT on remote/high-latency "
                         "device links")
    args = ap.parse_args(argv)

    from rad_tpu.fp import random_fingerprints

    fps = random_fingerprints(args.n, n_bits=args.n_bits, density=0.1,
                              seed=0)
    results = {}

    if not args.skip_native:
        from rad_tpu.native import build_hnsw_native
        t0 = time.perf_counter()
        g = build_hnsw_native(fps, connectivity=args.connectivity,
                              expansion_add=args.expansion_add, seed=0)
        dt = time.perf_counter() - t0
        results["native_nodes_per_sec"] = args.n / dt
        log(f"native: {dt:.1f}s = {args.n/dt:.0f} nodes/s "
            f"(threads={os.cpu_count()})")

    if not args.skip_device:
        from rad_tpu.build.device import build_hnsw_device
        # warm-up on a slice to pay the per-shape compile once
        build_hnsw_device(fps[: 2 * args.batch_size + 1],
                          connectivity=args.connectivity,
                          expansion_add=args.expansion_add, seed=0,
                          batch_size=args.batch_size,
                          fused_loop=args.fused_loop)
        t0 = time.perf_counter()
        g = build_hnsw_device(fps, connectivity=args.connectivity,
                              expansion_add=args.expansion_add, seed=0,
                              batch_size=args.batch_size,
                              fused_loop=args.fused_loop)
        dt = time.perf_counter() - t0
        results["device_nodes_per_sec"] = args.n / dt
        log(f"device (incl. full-shape compile): {dt:.1f}s = "
            f"{args.n/dt:.0f} nodes/s (batch={args.batch_size}, "
            f"fused_loop={args.fused_loop})")

    print(json.dumps({
        "metric": "hnsw_build_nodes_per_sec",
        "n": args.n,
        "connectivity": args.connectivity,
        "expansion_add": args.expansion_add,
        **results,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
