"""Per-op cost table at the traversal step's shapes (TPU microbenchmark).

The exhaustive-regime step spends ~1.05 ms/step outside the scorer
(BENCHMARKS.md step decomposition). Known-free so far: batch dedup, the
push-compaction sort, the buffer top_k. This benchmark times each remaining
op *class* at the exact shapes the step uses (batch 256, M0 32, N 1M,
R 1.07M, C 2^20, P 2^14), each as a K-iteration dependent chain inside one
compiled program so per-dispatch overhead amortizes out and XLA cannot CSE
the loop body.

Prints one JSON line: {op: microseconds}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--k-ops", type=int, default=200)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--m0", type=int, default=32)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    log(f"device: {jax.devices()[0]}")
    n = args.n
    r = int(n * 1.07)
    kk = args.batch * args.m0  # candidate-slot count per step
    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(rng.integers(0, n - args.k_ops - 1, kk,
                                    dtype=np.int32))
    valsf = jnp.asarray(rng.random(kk, dtype=np.float32))
    valsb = jnp.ones((kk,), jnp.bool_)
    big_f = jnp.zeros((n,), jnp.float32)
    big_b = jnp.zeros((r,), jnp.bool_)
    fps = jnp.asarray(rng.integers(0, 2**32, (n, args.m0),
                                   dtype=np.uint32))
    buf = jnp.asarray(rng.random(1 << 14, dtype=np.float32))
    main_c = jnp.asarray(np.sort(rng.random(1 << 20, dtype=np.float32)))
    rows_c = jnp.asarray(rng.integers(0, r, 1 << 20, dtype=np.int32))

    k_ops = args.k_ops
    cases = {}

    def case(name):
        def deco(fn):
            cases[name] = jax.jit(fn)
            return fn
        return deco

    @case("scatter_f32_8k_into_1M")
    def _(arr=big_f):
        def body(i, a):
            return a.at[idx0 + i].set(valsf, mode="drop")
        return jax.lax.fori_loop(0, k_ops, body, arr)

    @case("scatter_bool_8k_into_R")
    def _(arr=big_b):
        def body(i, a):
            return a.at[idx0 + i].set(valsb, mode="drop")
        return jax.lax.fori_loop(0, k_ops, body, arr)

    @case("scatter_min_dedup_8k")  # first_occurrence_scatter
    def _(arr=big_f):
        def body(i, acc):
            scratch = jnp.full((n + 1,), kk, jnp.int32)
            pos = jnp.arange(kk, dtype=jnp.int32)
            scratch = scratch.at[idx0 + i].min(pos, mode="drop")
            first = scratch[idx0 + i] == pos
            return acc.at[0].add(jnp.sum(first).astype(jnp.float32))
        return jax.lax.fori_loop(0, k_ops, body, arr)

    @case("gather_f32_8k_from_1M")
    def _(arr=big_f):
        def body(i, acc):
            return acc.at[1].add(jnp.sum(arr[idx0 + i]))
        return jax.lax.fori_loop(0, k_ops, body, arr)

    @case("gather_rows_8k_x32w")  # the scorer fingerprint gather
    def _(arr=big_f):
        def body(i, acc):
            rows = fps[idx0 + i]  # [kk, 32] uint32
            return acc.at[2].add(jnp.sum(rows.astype(jnp.uint32))
                                 .astype(jnp.float32))
        return jax.lax.fori_loop(0, k_ops, body, arr)

    @case("gather_rows_256_x32")  # the adjacency row gather
    def _(arr=big_f):
        def body(i, acc):
            rows = fps[idx0[:args.batch] + i]
            return acc.at[3].add(jnp.sum(rows.astype(jnp.uint32))
                                 .astype(jnp.float32))
        return jax.lax.fori_loop(0, k_ops, body, arr)

    @case("topk256_of_16k")
    def _(arr=big_f):
        def body(i, acc):
            neg, _ = jax.lax.top_k(-(buf + i), args.batch)
            return acc.at[4].add(jnp.sum(neg))
        return jax.lax.fori_loop(0, k_ops, body, arr)

    @case("sort2_8k")
    def _(arr=big_f):
        def body(i, acc):
            s, rr = jax.lax.sort((valsf + i, idx0), num_keys=1)
            return acc.at[5].add(s[0] + rr[0])
        return jax.lax.fori_loop(0, k_ops, body, arr)

    @case("sort2_1M_merge")
    def _(arr=big_f):
        def body(i, acc):
            s, rr = jax.lax.sort((main_c + i, rows_c), num_keys=1)
            return acc.at[6].add(s[0] + rr[0])
        return jax.lax.fori_loop(0, 10, body, arr)

    @case("cumsum_8k")
    def _(arr=big_f):
        def body(i, acc):
            c = jnp.cumsum((valsf + i) > 0.5)
            return acc.at[7].add(c[-1].astype(jnp.float32))
        return jax.lax.fori_loop(0, k_ops, body, arr)

    results = {}
    for name, fn in cases.items():
        iters = 10 if name == "sort2_1M_merge" else k_ops
        out = jax.block_until_ready(fn())  # compile
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out)  # host readback barrier
        dt = time.perf_counter() - t0
        us = 1e6 * dt / iters
        results[name] = round(us, 1)
        log(f"{name}: {us:.1f} us/op")

    print(json.dumps({"metric": "op_costs_us", "n": n,
                      "batch": args.batch, "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
