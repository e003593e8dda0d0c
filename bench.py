"""Benchmark: Tanimoto distance-evaluations/sec/chip (BASELINE headline).

Computes the full Q x N Tanimoto distance reduction over a packed 1024-bit
fingerprint library using the MXU mapping (|a∧b| = a·b for 0/1 vectors in
bf16 with f32 accumulation; |a∨b| from precomputed popcounts), scanned over
database blocks so nothing Q x N ever materializes. Baseline is the same
computation on host CPU via numpy's vectorized popcount — the reference's
compute substrate (usearch SIMD popcount, SURVEY.md §2 row 1).

Prints exactly one JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def cpu_tanimoto_rate(db: np.ndarray, n_q: int = 64, reps: int = 3) -> float:
    """Distance-evals/sec for a numpy popcount Tanimoto on host CPU."""
    q = db[:n_q]
    if hasattr(np, "bitwise_count"):
        popc = np.bitwise_count
    else:
        lut = np.array([bin(i).count("1") for i in range(256)], np.uint8)
        popc = lambda x: lut[x.view(np.uint8)].reshape(*x.shape[:-1], -1)
    pops = popc(db).sum(-1, dtype=np.int32)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        inter = popc(q[:, None, :] & db[None, :, :]).sum(-1, dtype=np.int32)
        union = pops[:n_q, None] + pops[None, :] - inter
        d = 1.0 - inter / np.maximum(union, 1)
        d.min(axis=1)
        best = min(best, time.perf_counter() - t0)
    return n_q * db.shape[0] / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20,
                    help="library size (packed 1024-bit fingerprints)")
    ap.add_argument("--q", type=int, default=2048, help="query batch")
    ap.add_argument("--block", type=int, default=1 << 14)
    ap.add_argument("--cpu-n", type=int, default=1 << 15,
                    help="library size for the CPU baseline measurement")
    ap.add_argument("--chain", type=int, default=8,
                    help="sweeps chained inside one jitted scan per timing "
                         "rep (amortizes the tunnel dispatch+readback that "
                         "otherwise sits inside every ~48 ms measurement)")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from rad_tpu.fp.pack import random_fingerprints
    from rad_tpu.fp.kernels import tanimoto_nn_pallas

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    n, q = args.n, args.q
    n = (n // 1024) * 1024
    log(f"generating {n} x 1024-bit fingerprints ...")
    db = random_fingerprints(n, n_bits=1024, density=0.1, seed=0)
    queries = db[:q].copy()

    db_j = jnp.asarray(db)
    q_j = jnp.asarray(queries)

    if dev.platform == "tpu":
        # Pallas fused unpack + int8-MXU 1-NN kernel with the throughput
        # epilogue (approximate reciprocal + packed-key reduction). Probe
        # data (benchmarks/bench_kernel_variants.py, BENCHMARKS.md): this
        # sits within ~6% of the kernel's MXU-bound floor on v5e.
        def min_dist(dbp, qp):
            return tanimoto_nn_pallas(qp, dbp, approx=True)[0]
    else:
        # non-TPU smoke path: XLA scan over blocks with the MXU mapping
        from rad_tpu.fp.pack import popcount_rows
        from rad_tpu.fp.tanimoto import unpack_to_dtype
        blk = args.block

        @jax.jit
        def min_dist(dbp, qp):
            q_bits = unpack_to_dtype(qp, jnp.bfloat16)
            q_pops = popcount_rows(qp).astype(jnp.float32)
            blocks = dbp.reshape(dbp.shape[0] // blk, blk, dbp.shape[1])

            def body(carry, db_blk):
                d_pops = popcount_rows(db_blk).astype(jnp.float32)
                d_bits = unpack_to_dtype(db_blk, jnp.bfloat16)
                inter = jnp.dot(q_bits, d_bits.T,
                                preferred_element_type=jnp.float32)
                union = q_pops[:, None] + d_pops[None, :] - inter
                dist = 1.0 - inter / jnp.maximum(union, 1.0)
                return jnp.minimum(carry, dist.min(axis=1)), None

            init = jnp.full((qp.shape[0],), jnp.inf, jnp.float32)
            return jax.lax.scan(body, init, blocks)[0]

    log("compiling ...")
    t0 = time.perf_counter()
    # np.asarray forces a device->host readback of the [Q] result — the only
    # reliable completion barrier through remote-execution backends where
    # block_until_ready can return early.
    try:
        r = np.asarray(min_dist(db_j, q_j))
    except Exception as e:
        log(f"pallas path failed ({e}); falling back to the XLA path")
        from rad_tpu.fp.pack import popcount_rows
        from rad_tpu.fp.tanimoto import unpack_to_dtype
        blk = args.block

        @jax.jit
        def min_dist(dbp, qp):  # noqa: F811 - deliberate fallback rebind
            q_bits = unpack_to_dtype(qp, jnp.bfloat16)
            q_pops = popcount_rows(qp).astype(jnp.float32)
            blocks = dbp.reshape(dbp.shape[0] // blk, blk, dbp.shape[1])

            def body(carry, db_blk):
                d_pops = popcount_rows(db_blk).astype(jnp.float32)
                d_bits = unpack_to_dtype(db_blk, jnp.bfloat16)
                inter = jnp.dot(q_bits, d_bits.T,
                                preferred_element_type=jnp.float32)
                union = q_pops[:, None] + d_pops[None, :] - inter
                dist = 1.0 - inter / jnp.maximum(union, 1.0)
                return jnp.minimum(carry, dist.min(axis=1)), None

            init = jnp.full((qp.shape[0],), jnp.inf, jnp.float32)
            return jax.lax.scan(body, init, blocks)[0]

        r = np.asarray(min_dist(db_j, q_j))
    log(f"first run (incl. compile): {time.perf_counter() - t0:.1f}s; "
        f"min dist overall = {r.min():.4f}")

    best = np.inf
    for i in range(4):
        t0 = time.perf_counter()
        np.asarray(min_dist(db_j, q_j))
        dt = time.perf_counter() - t0
        log(f"run {i}: {dt*1e3:.1f} ms")
        best = min(best, dt)
    tpu_rate = q * n / best
    log(f"single-sweep rate: {tpu_rate:.3e} dist-evals/s "
        f"(incl. one dispatch+readback per sweep)")

    # Chained timing: k sweeps (distinct query blocks, so nothing is
    # loop-invariant) inside ONE jitted scan -> one dispatch + one
    # readback per k sweeps. This amortizes the tunnel RTT that the
    # single-sweep loop pays inside every measurement and is the headline
    # number; the single-sweep rate above is logged for comparison.
    k_chain = max(1, min(args.chain, n // q))
    if k_chain > 1:
        try:
            qk_j = jnp.asarray(db[: k_chain * q].reshape(k_chain, q, -1))

            @jax.jit
            def chain(dbp, qk):
                def body(c, qp):
                    return c + min_dist(dbp, qp).sum(), None
                return jax.lax.scan(body, jnp.float32(0.0), qk)[0]

            t0 = time.perf_counter()
            np.asarray(chain(db_j, qk_j))
            log(f"chain first run (incl. compile): "
                f"{time.perf_counter() - t0:.1f}s")
            best_c = np.inf
            for i in range(args.reps):
                t0 = time.perf_counter()
                np.asarray(chain(db_j, qk_j))
                dt = time.perf_counter() - t0
                log(f"chain run {i}: {dt*1e3:.1f} ms "
                    f"({dt/k_chain*1e3:.1f} ms/sweep)")
                best_c = min(best_c, dt)
            tpu_rate = max(tpu_rate, k_chain * q * n / best_c)
        except Exception as e:
            log(f"chained timing failed ({e}); keeping single-sweep rate")
    log(f"device rate: {tpu_rate:.3e} dist-evals/s")

    log("measuring CPU baseline ...")
    cpu_rate = cpu_tanimoto_rate(db[: args.cpu_n])
    log(f"cpu rate: {cpu_rate:.3e} dist-evals/s")

    print(json.dumps({
        "metric": "tanimoto_dist_evals_per_sec_per_chip",
        "value": tpu_rate,
        "unit": "dist-evals/s",
        "vs_baseline": tpu_rate / cpu_rate,
    }))


if __name__ == "__main__":
    main()
