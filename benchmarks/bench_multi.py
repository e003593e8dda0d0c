#!/usr/bin/env python
"""Multi-campaign traversal throughput: aggregate nodes/s vs campaign count.

T independent Tanimoto-to-target screenings (T receptors) share one graph
in one compiled sweep (rad_tpu.traverse.multi). The engine step is a
latency-pipelined chain of [B*M0]-wide state ops, so batching campaigns
amortizes the chain: the aggregate rate should grow toward T x while the
per-step wall-clock grows much slower than T.

    python benchmarks/bench_multi.py --n 1000000 --t 1 2 4 8
"""

from __future__ import annotations

import argparse
import json
import math
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
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--n-bits", type=int, default=1024)
    ap.add_argument("--budget", type=int, default=200_000,
                    help="per-campaign n_to_score")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--frontier", type=int, default=1 << 20)
    ap.add_argument("--buffer", type=int, default=1 << 14)
    ap.add_argument("--t", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--head", type=int, default=None,
                    help="two-level frontier head capacity per campaign")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args(argv)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    import jax.numpy as jnp
    from bench_scale import make_device_graph
    from rad_tpu.fp.pack import popcount_rows
    from rad_tpu.fp.tanimoto import tanimoto_matrix
    from rad_tpu.traverse.multi import (fused_run_multi, init_multi,
                                        prime_multi)

    log(f"device: {jax.devices()[0]}")
    dg, sizes = make_device_graph(args.n, args.m, seed=0)
    w = args.n_bits // 32
    packed = jax.random.bits(jax.random.PRNGKey(1), (args.n, w), jnp.uint32)
    pops = popcount_rows(packed).astype(jnp.int32)
    jax.block_until_ready(pops)
    log(f"graph + fingerprints on device "
        f"({(dg.adj.nbytes + packed.nbytes) / 1e9:.2f} GB)")

    n_top = sizes[-1] if sizes[-1] > 1 else (sizes[-2] if len(sizes) > 1
                                             else 1)
    ids = jnp.arange(max(n_top, 1), dtype=jnp.int32)

    results = []
    for t in args.t:
        targets = jax.random.bits(jax.random.PRNGKey(7 + t), (t, w),
                                  jnp.uint32)
        t_pops = popcount_rows(targets)
        seeds = tanimoto_matrix(targets, packed[: ids.shape[0]])

        def fresh():
            s = init_multi(dg, t, frontier_capacity=args.frontier,
                           buffer_capacity=args.buffer,
                           head_capacity=args.head)
            return prime_multi(s, dg, ids, seeds)

        log(f"T={t}: compiling ...")
        states = fused_run_multi(fresh(), dg, packed, pops, targets,
                                 t_pops, jnp.int32(args.budget),
                                 batch=args.batch)
        total = int(np.asarray(states.n_scored).sum())
        best = math.inf
        for _ in range(args.runs):
            states = fresh()
            jax.block_until_ready(states.f_score)
            t0 = time.perf_counter()
            states = fused_run_multi(states, dg, packed, pops, targets,
                                     t_pops, jnp.int32(args.budget),
                                     batch=args.batch)
            total = int(np.asarray(states.n_scored).sum())
            best = min(best, time.perf_counter() - t0)
        rate = total / best
        log(f"T={t}: {total} scored in {best:.2f}s -> "
            f"{rate:.0f} nodes/s aggregate "
            f"({rate / t:.0f}/campaign)")
        results.append({"t": t, "aggregate_nodes_per_sec": rate,
                        "total_scored": total, "seconds": best})

    print(json.dumps({
        "metric": "multi_campaign_sweep",
        "n": args.n,
        "budget": args.budget,
        "batch": args.batch,
        "results": results,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
