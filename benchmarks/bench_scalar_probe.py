"""Microprobe: in-kernel scalar-loop random access cost on TPU (Pallas).

Decision input for the fused candidate-pipeline kernel (VERDICT r3 item
5). The exhaustive-regime step spends ~1.05 ms in ~15 dependent XLA
gather/scatter ops over [B*M0]=8192 candidates (~7 ns per random access,
latency-pipelined — bench_step_profile). A single Pallas kernel holding
the state bitmaps in VMEM could replace all of them with ONE scalar loop
over the candidates IF Mosaic's per-element dynamic indexing is fast
enough: the break-even is ~128 ns/candidate for the whole chain
(1.05 ms / 8192), and a win needs <= ~60 ns/candidate.

Three probes, each an 8192-iteration `fori_loop` inside one kernel:

  gather   — acc += table[idx[i]]           (load-only floor)
  checkset — bitmap test-and-set + counter  (the enqueue primitive)
  chain    — scored test, enqueue test-and-set, score lookup, compacted
             emit: the full per-candidate work of expand+integrate

Prints one JSON line: ns per candidate per probe.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=8192, help="candidates")
    ap.add_argument("--n", type=int, default=1 << 20, help="table rows")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--chain-steps", type=int, default=16,
                    help="loop iterations chained per timing dispatch")
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args(argv)

    from rad_tpu.utils.launcher import ensure_supervised, device_warmup
    if not args.interpret:
        ensure_supervised(marker_timeout=300, retries=1, retry_sleep=60)
        device_warmup()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k, n = args.k, args.n
    words = n // 32

    # ---- probe kernels ---------------------------------------------------
    def gather_kernel(idx_ref, tab_ref, out_ref):
        def body(i, acc):
            j = idx_ref[i, 0]
            return acc + tab_ref[j, 0]

        out_ref[0, 0] = jax.lax.fori_loop(0, k, body, jnp.int32(0))

    def checkset_kernel(idx_ref, bm_ref, out_ref, bm_scratch):
        bm_scratch[...] = bm_ref[...]

        def body(i, acc):
            j = idx_ref[i, 0]
            w = j // 32
            b = j - w * 32
            word = bm_scratch[w, 0]
            hit = (word >> b) & 1
            bm_scratch[w, 0] = word | (1 << b)
            return acc + (1 - hit)

        out_ref[0, 0] = jax.lax.fori_loop(0, k, body, jnp.int32(0))

    def chain_kernel(idx_ref, scored_ref, enq_ref, scores_ref, out_ref,
                     emit_ref, enq_scratch):
        """Full per-candidate chain: scored test -> (unscored: compacted
        emit) -> enqueue test-and-set -> score lookup accumulate."""
        enq_scratch[...] = enq_ref[...]

        def body(i, carry):
            n_new, pos, ssum = carry
            j = idx_ref[i, 0]
            w = j // 32
            b = j - w * 32
            s_hit = (scored_ref[w, 0] >> b) & 1
            # compacted to_score emit for unscored candidates
            emit_ref[pos, 0] = jnp.where(s_hit == 0, j, emit_ref[pos, 0])
            pos = pos + (1 - s_hit)
            # enqueue check-and-set
            e_word = enq_scratch[w, 0]
            e_hit = (e_word >> b) & 1
            enq_scratch[w, 0] = e_word | (1 << b)
            # score gather for pushed candidates
            ssum = ssum + jnp.where(e_hit == 0, scores_ref[j, 0], 0.0)
            return n_new + (1 - s_hit), pos, ssum

        n_new, _, ssum = jax.lax.fori_loop(
            0, k, body, (jnp.int32(0), jnp.int32(0), jnp.float32(0)))
        out_ref[0, 0] = ssum + n_new.astype(jnp.float32)

    vm = pltpu.VMEM
    common = dict(interpret=args.interpret)

    # out goes to SMEM: Mosaic rejects SCALAR stores into VMEM refs
    # ("Cannot store scalars to VMEM") — that same constraint is what
    # makes the check-and-set kernels below unlowerable at all.
    gather = pl.pallas_call(
        gather_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=vm)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        **common)

    checkset = pl.pallas_call(
        checkset_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=vm)] * 2,
        out_specs=pl.BlockSpec(memory_space=vm),
        scratch_shapes=[vm((words, 1), jnp.int32)],
        **common)

    chain = pl.pallas_call(
        chain_kernel,
        out_shape=(jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((k, 1), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=vm)] * 4,
        out_specs=(pl.BlockSpec(memory_space=vm),
                   pl.BlockSpec(memory_space=vm)),
        scratch_shapes=[vm((words, 1), jnp.int32)],
        **common)

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n, size=(k, 1)), jnp.int32)
    tab = jnp.asarray(rng.integers(0, 100, size=(n, 1)), jnp.int32)
    bm = jnp.asarray(rng.integers(0, 2**31, size=(words, 1)), jnp.int32)
    scored = jnp.asarray(
        rng.integers(0, 2**31, size=(words, 1)), jnp.int32)
    scoresv = jnp.asarray(rng.random((n, 1)), jnp.float32)

    def timeit(fn, *a, label=""):
        # chain several loop dispatches into one program so the tunnel
        # RTT (~26 ms) is amortized (CLAUDE.md r3s4)
        reps = args.chain_steps

        @jax.jit
        def many(*a):
            acc = jnp.float32(0)
            for _ in range(reps):
                out = fn(*a)
                first = out[0] if isinstance(out, (tuple, list)) else out
                acc = acc + first[0, 0].astype(jnp.float32)
            return acc

        t0 = time.perf_counter()
        np.asarray(many(*a))
        log(f"{label}: first (incl. compile) {time.perf_counter()-t0:.1f}s")
        best = np.inf
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(many(*a))
            best = min(best, time.perf_counter() - t0)
        ns = best / reps / k * 1e9
        log(f"{label}: {best*1e3:.2f} ms / {reps} loops "
            f"-> {ns:.2f} ns/candidate")
        return ns

    results = {}
    try:
        results["gather_ns"] = timeit(gather, idx, tab, label="gather")
    except Exception as e:
        results["gather_error"] = str(e)[:200]
        log(f"gather unlowerable: {e}")
    try:
        results["checkset_ns"] = timeit(checkset, idx, bm, label="checkset")
    except Exception as e:
        results["checkset_error"] = str(e)[:200]
        log(f"checkset unlowerable: {e}")
    try:
        results["chain_ns"] = timeit(chain, idx, scored, bm, scoresv,
                                     label="chain")
    except Exception as e:
        results["chain_error"] = str(e)[:200]
        log(f"chain unlowerable: {e}")
    results["k"] = k
    results["n"] = n
    # the XLA chain this would replace: ~1.05 ms for 8192 candidates
    results["breakeven_ns"] = 1.05e-3 / 8192 * 1e9
    print(json.dumps({"metric": "scalar_loop_probe", **results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
