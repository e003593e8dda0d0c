"""Benchmark: Tanimoto distance-evaluations/sec/chip (BASELINE headline).

Computes the full Q x N Tanimoto distance reduction over a packed 1024-bit
fingerprint library using the MXU mapping (|a∧b| = a·b for 0/1 vectors in
bf16 with f32 accumulation; |a∨b| from precomputed popcounts). Baseline is
the same computation on host CPU via numpy's vectorized popcount — the
reference's compute substrate (usearch SIMD popcount, SURVEY.md §2 row 1).

Cold-cache-safe by construction (the round-3 driver run died at rc=124
inside a fresh remote compile): the top-level process does NO device work.
It measures the CPU baseline, then runs device measurements in supervised
child processes with per-phase wall-clock budgets, in proven-first order —

  1. XLA-scan path (shape compiled by every prior round; warms fastest and
     guarantees a number),
  2. Pallas fused 1-NN kernel + chained-scan timing (the headline, ~2x),
     only if budget remains.

Children append every milestone rate to a results file the moment it is
measured, so a kill at any point still leaves the best-so-far recorded.
The parent traps SIGTERM/SIGALRM and ALWAYS prints the best JSON achieved
(`timeout` still reports rc=124 when it fires, but the driver parses the
output tail, so the record survives). Park protection (device-init RPC lost
through the tunnel) comes from rad_tpu.utils.launcher: the child's first
act is a trivial device op printing a marker; no marker => kill + retry.

Prints exactly one JSON line on stdout:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import tempfile
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


def _db_cache_path(n: int) -> str:
    return os.path.join(tempfile.gettempdir(), f"radtpu_benchdb_{n}x32.npy")


def load_or_make_db(n: int) -> np.ndarray:
    """1024-bit packed fingerprints, cached on disk so repeat invocations
    (builder warm-up runs + the driver's round-end run) skip generation."""
    path = _db_cache_path(n)
    if os.path.exists(path):
        try:
            db = np.load(path, mmap_mode=None)
            if db.shape == (n, 32) and db.dtype == np.uint32:
                log(f"db cache hit: {path}")
                return db
        except Exception as e:
            log(f"db cache unreadable ({e}); regenerating")
    from rad_tpu.fp.pack import random_fingerprints

    t0 = time.perf_counter()
    db = random_fingerprints(n, n_bits=1024, density=0.1, seed=0)
    log(f"generated {n} x 1024-bit fingerprints "
        f"({time.perf_counter() - t0:.1f}s)")
    try:
        tmp = path + f".tmp{os.getpid()}"
        np.save(tmp, db)
        os.replace(tmp + ".npy" if not tmp.endswith(".npy") else tmp, path)
    except Exception as e:
        log(f"db cache write failed ({e}); continuing uncached")
    return db


# ---------------------------------------------------------------------------
# Child: one device measurement phase
# ---------------------------------------------------------------------------


def _xla_min_dist(jax, jnp, block: int):
    from rad_tpu.fp.pack import popcount_rows
    from rad_tpu.fp.tanimoto import unpack_to_dtype

    @jax.jit
    def min_dist(dbp, qp):
        q_bits = unpack_to_dtype(qp, jnp.bfloat16)
        q_pops = popcount_rows(qp).astype(jnp.float32)
        blocks = dbp.reshape(dbp.shape[0] // block, block, dbp.shape[1])

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

    return min_dist


def run_device_phase(args) -> int:
    """Supervised child: measure one path, appending each milestone rate to
    the results file immediately. First act is the warmup marker."""
    budget_end = time.monotonic() + args.budget if args.budget else None

    def remaining() -> float:
        return np.inf if budget_end is None else budget_end - time.monotonic()

    results = open(args.results, "a", buffering=1)

    def record(stage: str, rate: float):
        results.write(json.dumps({
            "path": args.path, "stage": stage, "value": float(rate)}) + "\n")
        results.flush()
        os.fsync(results.fileno())
        log(f"[{args.path}/{stage}] {rate:.3e} dist-evals/s (recorded)")

    # Graceful TERM: milestones are already on disk; just exit.
    signal.signal(signal.SIGTERM, lambda *_: sys.exit(0))

    from rad_tpu.utils.launcher import device_warmup

    device_warmup()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    db = np.load(args.db)
    n, q = db.shape[0], args.q
    db_j = jnp.asarray(db)
    q_j = jnp.asarray(db[:q].copy())

    if args.path == "pallas" and dev.platform == "tpu":
        from rad_tpu.fp.kernels import tanimoto_nn_pallas

        def min_dist(dbp, qp):
            return tanimoto_nn_pallas(qp, dbp, approx=True)[0]
    else:
        min_dist = _xla_min_dist(jax, jnp, args.block)

    log(f"compiling {args.path} path ({remaining():.0f}s budget left) ...")
    t0 = time.perf_counter()
    r = np.asarray(min_dist(db_j, q_j))
    log(f"first run (incl. compile): {time.perf_counter() - t0:.1f}s; "
        f"min dist overall = {r.min():.4f}")

    best = np.inf
    for i in range(4):
        t0 = time.perf_counter()
        # np.asarray forces a device->host readback — the only reliable
        # completion barrier through remote-execution backends where
        # block_until_ready can return early.
        np.asarray(min_dist(db_j, q_j))
        dt = time.perf_counter() - t0
        log(f"run {i}: {dt * 1e3:.1f} ms")
        best = min(best, dt)
    record("single", q * n / best)

    # Chained timing: k sweeps (distinct query blocks, so nothing is
    # loop-invariant) inside ONE jitted scan -> one dispatch + one readback
    # per k sweeps. Amortizes the ~26 ms tunnel RTT that sits inside every
    # single-sweep measurement (CLAUDE.md r3s4); this is the headline. It
    # costs a second compile, so only attempt it with budget in hand.
    k_chain = max(1, min(args.chain, n // q))
    if k_chain > 1 and remaining() > args.chain_min_budget:
        qk_j = jnp.asarray(db[: k_chain * q].reshape(k_chain, q, -1))

        @jax.jit
        def chain(dbp, qk):
            def body(c, qp):
                return c + min_dist(dbp, qp).sum(), None
            return jax.lax.scan(body, jnp.float32(0.0), qk)[0]

        t0 = time.perf_counter()
        np.asarray(chain(db_j, qk_j))
        log(f"chain first run (incl. compile): {time.perf_counter() - t0:.1f}s")
        best_c = np.inf
        for i in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(chain(db_j, qk_j))
            dt = time.perf_counter() - t0
            log(f"chain run {i}: {dt * 1e3:.1f} ms "
                f"({dt / k_chain * 1e3:.1f} ms/sweep)")
            best_c = min(best_c, dt)
        record("chain", k_chain * q * n / best_c)
    elif k_chain > 1:
        log(f"skipping chained timing ({remaining():.0f}s budget left "
            f"< {args.chain_min_budget}s)")
    return 0


# ---------------------------------------------------------------------------
# Parent: orchestration
# ---------------------------------------------------------------------------


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20,
                    help="library size (packed 1024-bit fingerprints)")
    ap.add_argument("--q", type=int, default=2048, help="query batch")
    ap.add_argument("--block", type=int, default=1 << 14)
    ap.add_argument("--cpu-n", type=int, default=1 << 15,
                    help="library size for the CPU baseline measurement")
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--deadline", type=float,
                    default=float(os.environ.get("BENCH_DEADLINE_S", 540)),
                    help="total wall-clock budget; the final JSON is "
                         "emitted before this expires no matter what")
    ap.add_argument("--phase", choices=["device"], default=None,
                    help="internal: run as a measurement child")
    ap.add_argument("--path", choices=["xla", "pallas"], default="xla")
    ap.add_argument("--db", help="internal: packed fingerprint .npy")
    ap.add_argument("--results", help="internal: milestone JSONL path")
    ap.add_argument("--budget", type=float, default=None,
                    help="internal: child wall budget")
    ap.add_argument("--chain-min-budget", type=float, default=110.0)
    args = ap.parse_args()

    if args.phase == "device":
        sys.exit(run_device_phase(args))

    t_start = time.monotonic()

    def left() -> float:
        return args.deadline - (time.monotonic() - t_start)

    state = {"best": None, "cpu_rate": None, "emitted": False,
             "results_path": None}

    def harvest() -> None:
        if state["results_path"] is None:
            return
        try:
            with open(state["results_path"]) as f:
                for line in f:
                    try:
                        rec = json.loads(line)
                    except ValueError:
                        continue
                    v = float(rec.get("value", 0.0))
                    if state["best"] is None or v > state["best"]:
                        state["best"] = v
        except OSError:
            pass

    def emit(final: bool = False) -> None:
        if state["emitted"]:
            return
        harvest()  # pick up child milestones flushed mid-phase
        if state["best"] is None:
            if final:
                log("no device measurement achieved; nothing to emit")
            return
        state["emitted"] = True
        vs = (state["best"] / state["cpu_rate"]
              if state["cpu_rate"] else None)
        print(json.dumps({
            "metric": "tanimoto_dist_evals_per_sec_per_chip",
            "value": state["best"],
            "unit": "dist-evals/s",
            "vs_baseline": vs,
        }), flush=True)

    def on_signal(signum, _frame):
        log(f"signal {signum}: emitting best-so-far and exiting")
        emit(final=True)
        sys.exit(0 if state["emitted"] else 1)

    signal.signal(signal.SIGTERM, on_signal)
    signal.signal(signal.SIGALRM, on_signal)
    # Hard backstop ~10s before the deadline in case orchestration wedges.
    signal.alarm(max(10, int(args.deadline - 10)))

    n = (args.n // 1024) * 1024
    db = load_or_make_db(n)

    log("measuring CPU baseline ...")
    state["cpu_rate"] = cpu_tanimoto_rate(db[: args.cpu_n])
    log(f"cpu rate: {state['cpu_rate']:.3e} dist-evals/s")

    db_path = _db_cache_path(n)
    if not os.path.exists(db_path):  # cache write failed; use a temp file
        db_path = os.path.join(tempfile.gettempdir(),
                               f"radtpu_benchdb_run{os.getpid()}.npy")
        np.save(db_path, db)
    results_path = os.path.join(
        tempfile.gettempdir(), f"radtpu_bench_results_{os.getpid()}.jsonl")
    open(results_path, "w").close()
    state["results_path"] = results_path

    from rad_tpu.utils.launcher import run_supervised

    def child(path: str, budget: float) -> None:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--phase", "device", "--path", path,
               "--db", db_path, "--results", results_path,
               "--q", str(args.q), "--block", str(args.block),
               "--chain", str(args.chain), "--reps", str(args.reps),
               "--budget", str(budget),
               "--chain-min-budget", str(args.chain_min_budget)]
        log(f"=== phase {path}: budget {budget:.0f}s ===")
        # Marker timeout: PATIENT by default (budget minus a flush
        # margin). Measured r5: after a device wedge, inits take
        # 5-15 min but patient clients eventually claim, while
        # kill-and-retry restarts the slow init from zero — under a
        # ~540 s total deadline patience wins. A true lost-lease park
        # (r3s5) is covered by the budget SIGTERM -> best-so-far flush.
        # RAD_TPU_MARKER_TIMEOUT overrides for operators who know the
        # tunnel state.
        mt = os.environ.get("RAD_TPU_MARKER_TIMEOUT")
        mt = float(mt) if mt else max(60.0, budget - 90.0)
        rc = run_supervised(
            cmd,
            marker_timeout=min(mt, budget - 30.0),
            budget=budget,
            retries=1 if budget > 3 * mt else 0,
            retry_sleep=60.0,
        )
        log(f"=== phase {path} done rc={rc} ===")
        harvest()

    # Phase 1: XLA-scan — the proven path (compiled by rounds 1-2; warms
    # fastest). Guarantees a recorded number even on a fully cold cache.
    child("xla", min(left() - 45.0, 400.0))

    # Phase 2: Pallas fused kernel — the ~2x headline; only with budget in
    # hand. Its compile is the exact thing that killed the round-3 record.
    pallas_budget = left() - 20.0
    if pallas_budget > 150.0:
        child("pallas", pallas_budget)
    else:
        log(f"skipping pallas phase ({left():.0f}s left)")

    signal.alarm(0)
    emit(final=True)
    if not state["emitted"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
