"""A/B microbench for the Tanimoto 1-NN Pallas kernel (TPU).

Variants:
  exact   — production epilogue (f32 divide, min+argmin)
  approx  — throughput epilogue (approx reciprocal, one packed-key max)
  floor   — intersections only (dot + integer max): the MXU+unpack ceiling;
            how far `approx` sits from `floor` is the remaining VPU cost.

Epilogue-decomposition probes (split the exact-epilogue cost between the
f32 divide and the min+argmin double reduction):
  exact-pk — exact f32 divide + the packed-key SINGLE max reduction
             (exact-pk − approx  = cost of the exact divide)
  newton   — approx reciprocal + one Newton refinement + min+argmin
             (newton − approx-minarg side: cost of the double reduction;
             the refined divide is ~1e-7 relative, NOT order-exact for
             equal-ratio (i,u) pairs — probe only, not a product path)

Each variant is one compile on the remote service (4-20 min for new
shapes) — batch runs of this script. Prints one JSON line with all rates.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_floor_kernel(q_tile: int, n_tile: int, compute_dtype,
                      mode: str = "floor"):
    """Probe kernels isolating kernel stages.

    mode="floor":    unpack + dot + integer max (no union/divide/argmin)
    mode="floor-t":  like floor but the db scratch is stored transposed
                     [d, NT] so the dot is a standard (M,K)x(K,N) — tests
                     whether the B-transposed contraction costs MXU rate
    mode="unpack":   unpack + a trivial reduce (no dot) — unpack cost alone
    mode="dot":      dot only from a pre-unpacked db resident in HBM
                     (16x packed traffic, no in-kernel unpack) — MXU ceiling
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from rad_tpu.fp.kernels import _unpack_block_bytes, unpack_bitmajor

    def kern(q_bits_ref, db_ref, out_ref, scratch, *, nbytes):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:, :] = jnp.zeros_like(out_ref[:, :])

        if mode != "dot":
            @pl.when(pl.program_id(1) == 0)
            def _():
                if mode == "floor-t":
                    blk = db_ref[:, :].astype(jnp.int32)      # [NT, nbytes]
                    for b in range(8):
                        bits = ((blk >> b) & 1).astype(scratch.dtype)
                        scratch[b * nbytes:(b + 1) * nbytes, :] = bits.T
                else:
                    _unpack_block_bytes(db_ref, scratch, nbytes)

        acc = jnp.int32 if scratch.dtype == jnp.int8 else jnp.float32
        if mode == "unpack":
            out_ref[:, :] = jnp.maximum(
                out_ref[:, :],
                jnp.sum(scratch[:8, :], axis=0,
                        keepdims=True).astype(jnp.int32).T[:out_ref.shape[0]])
            return
        if mode == "floor-t":
            inter = jax.lax.dot_general(
                q_bits_ref[:, :], scratch[:, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc)
        else:
            src = db_ref if mode == "dot" else scratch
            inter = jax.lax.dot_general(
                q_bits_ref[:, :], src[:, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=acc)
        out_ref[:, :] = jnp.maximum(out_ref[:, :],
                                    jnp.max(inter, axis=1, keepdims=True)
                                    .astype(out_ref.dtype))

    @functools.partial(jax.jit, static_argnames=())
    def run(q_packed, db_packed):
        q, w = q_packed.shape
        n, _ = db_packed.shape
        nbytes = w * 4
        d = w * 32
        q_bits = unpack_bitmajor(q_packed, compute_dtype)
        grid = (n // n_tile, q // q_tile)
        if mode == "dot":
            db_in = unpack_bitmajor(db_packed, compute_dtype)  # [N, d]
            db_spec = pl.BlockSpec((n_tile, d), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM)
            scratch = pltpu.VMEM((8, 8), compute_dtype)  # unused
        else:
            db_in = jax.lax.bitcast_convert_type(
                db_packed, jnp.uint8).reshape(n, nbytes)
            db_spec = pl.BlockSpec((n_tile, nbytes), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM)
            scratch = pltpu.VMEM(
                (d, n_tile) if mode == "floor-t" else (n_tile, d),
                compute_dtype)
        return pl.pallas_call(
            functools.partial(kern, nbytes=nbytes),
            grid=grid,
            in_specs=[
                pl.BlockSpec((q_tile, d), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                db_spec,
            ],
            out_specs=pl.BlockSpec((q_tile, 1), lambda i, j: (j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((q, 1), jnp.int32),
            scratch_shapes=[scratch],
        )(q_bits, db_in)

    return run


def make_epilogue_probe(q_tile: int, n_tile: int, compute_dtype,
                        mode: str):
    """1-NN kernels probing the exact-epilogue cost split.

    mode="exact-pk": exact f32 divide, then the packed-key single max
        reduction (the approx kernel's reduction with the exact divide).
    mode="newton":   approx reciprocal + one Newton step (~1e-7 relative,
        order-exact only up to equal-ratio ties), then min+argmin (the
        exact kernel's reduction with a cheap divide).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from rad_tpu.fp.kernels import _unpack_block_bytes, unpack_bitmajor
    from rad_tpu.fp.pack import popcount_rows

    def kern(q_bits_ref, q_pops_ref, db_ref, db_pops_ref, out_a, out_b,
             scratch, *, nbytes):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            if mode == "exact-pk":
                out_a[:, :] = jnp.full_like(out_a[:, :],
                                            jnp.iinfo(jnp.int32).min)
                out_b[:, :] = jnp.zeros_like(out_b[:, :])
            else:
                out_a[:, :] = jnp.full_like(out_a[:, :], jnp.inf)
                out_b[:, :] = jnp.full_like(out_b[:, :], -1)

        @pl.when(pl.program_id(1) == 0)
        def _():
            _unpack_block_bytes(db_ref, scratch, nbytes)

        acc = jnp.int32 if scratch.dtype == jnp.int8 else jnp.float32
        inter = jax.lax.dot_general(
            q_bits_ref[:, :], scratch[:, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc).astype(jnp.float32)
        union = q_pops_ref[:, :] + db_pops_ref[:, :].T - inter
        u = jnp.maximum(union, 1.0)
        if mode == "exact-pk":
            sim = inter / u
            sim = jnp.where(union > 0, sim, 1.0)
            bits = jax.lax.bitcast_convert_type(sim, jnp.int32)
            idx = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
            keys = (bits & ~jnp.int32(n_tile - 1)) | idx
            kmax = jnp.max(keys, axis=1, keepdims=True)
            better = kmax > out_a[:, :]
            out_a[:, :] = jnp.where(better, kmax, out_a[:, :])
            out_b[:, :] = jnp.where(better, i, out_b[:, :])
        else:  # newton
            r = pl.reciprocal(u, approx=True)
            r = r * (2.0 - u * r)                 # one Newton step
            sim = jnp.where(union > 0, inter * r, 1.0)
            dist = 1.0 - sim
            bmin = jnp.min(dist, axis=1, keepdims=True)
            barg = jnp.argmin(dist, axis=1)[:, None].astype(jnp.int32)
            gid = i * n_tile + barg
            better = bmin < out_a[:, :]
            out_a[:, :] = jnp.where(better, bmin, out_a[:, :])
            out_b[:, :] = jnp.where(better, gid, out_b[:, :])

    @jax.jit
    def run(q_packed, db_packed):
        q, w = q_packed.shape
        n, _ = db_packed.shape
        nbytes = w * 4
        d = w * 32
        q_bits = unpack_bitmajor(q_packed, compute_dtype)
        q_pops = popcount_rows(q_packed).astype(jnp.float32)[:, None]
        db_pops = popcount_rows(db_packed).astype(jnp.float32)[:, None]
        db_bytes = jax.lax.bitcast_convert_type(
            db_packed, jnp.uint8).reshape(n, nbytes)
        grid = (n // n_tile, q // q_tile)
        a_dtype = jnp.int32 if mode == "exact-pk" else jnp.float32
        out_a, _ = pl.pallas_call(
            functools.partial(kern, nbytes=nbytes),
            grid=grid,
            in_specs=[
                pl.BlockSpec((q_tile, d), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((q_tile, 1), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_tile, nbytes), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_tile, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((q_tile, 1), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((q_tile, 1), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(jax.ShapeDtypeStruct((q, 1), a_dtype),
                       jax.ShapeDtypeStruct((q, 1), jnp.int32)),
            scratch_shapes=[pltpu.VMEM((n_tile, d), compute_dtype)],
        )(q_bits, q_pops, db_bytes, db_pops)
        return out_a

    return run


def time_variant(name, fn, db_j, qk_j, reps=6):
    """Best seconds per sweep, timed as chained sweeps inside one jitted
    scan over distinct query blocks — one dispatch + one readback per
    ``k`` sweeps. The r3 correction: the old per-sweep timing carried
    ~26 ms of tunnel dispatch+readback INSIDE every ~23 ms measurement,
    inflating all kernel numbers ~2x (bench.py chain vs single-sweep)."""
    import jax
    import jax.numpy as jnp

    k = qk_j.shape[0]

    @jax.jit
    def chain(dbp, qk):
        def body(c, qp):
            return c + fn(dbp, qp).sum().astype(jnp.float32), None
        return jax.lax.scan(body, jnp.float32(0.0), qk)[0]

    t0 = time.perf_counter()
    np.asarray(chain(db_j, qk_j))
    log(f"{name}: first run (incl. compile) {time.perf_counter()-t0:.1f}s")
    best = np.inf
    for i in range(reps):
        t0 = time.perf_counter()
        np.asarray(chain(db_j, qk_j))
        dt = time.perf_counter() - t0
        log(f"  {name} run {i}: {dt*1e3:.1f} ms ({dt/k*1e3:.1f} ms/sweep)")
        best = min(best, dt)
    return best / k


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--q", type=int, default=2048)
    ap.add_argument("--q-tile", type=int, default=512)
    ap.add_argument("--n-tile", type=int, default=1024)
    ap.add_argument("--variants", nargs="+",
                    default=["exact", "approx", "floor"])
    ap.add_argument("--chain", type=int, default=8,
                    help="sweeps per timed dispatch (distinct query blocks)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from rad_tpu.fp.kernels import tanimoto_nn_pallas
    from rad_tpu.fp.pack import random_fingerprints

    log(f"device: {jax.devices()[0]}")
    n = (args.n // args.n_tile) * args.n_tile
    db = random_fingerprints(n, n_bits=1024, density=0.1, seed=0)
    db_j = jnp.asarray(db)
    k_chain = max(1, min(args.chain, n // args.q))
    qk_j = jnp.asarray(db[: k_chain * args.q].reshape(k_chain, args.q, -1))

    results = {}
    for v in args.variants:
        if v.startswith("floor") or v in ("unpack", "dot", "dot-bf16",
                                          "floor-bf16"):
            dtype = jnp.bfloat16 if v.endswith("bf16") else jnp.int8
            mode = v.replace("-bf16", "")
            fn0 = make_floor_kernel(args.q_tile, args.n_tile, dtype,
                                    mode=mode)
            fn = lambda dbp, qp, f=fn0: f(qp, dbp)
        elif v in ("exact-pk", "newton"):
            fn0 = make_epilogue_probe(args.q_tile, args.n_tile, jnp.int8,
                                      mode=v)
            fn = lambda dbp, qp, f=fn0: f(qp, dbp)
        else:
            fn = functools.partial(
                lambda dbp, qp, **kw: tanimoto_nn_pallas(qp, dbp, **kw)[0],
                q_tile=args.q_tile, n_tile=args.n_tile,
                approx=(v == "approx"))
            fn = functools.partial(fn)
        best = time_variant(v, fn, db_j, qk_j)
        results[v] = {"ms": best * 1e3,
                      "rate": args.q * n / best}
        log(f"{v}: {best*1e3:.1f} ms/sweep = {results[v]['rate']:.3e} "
            f"evals/s")

    print(json.dumps({"metric": "nn_kernel_variants", "n": n, "q": args.q,
                      "q_tile": args.q_tile, "n_tile": args.n_tile,
                      "chain": k_chain, "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
