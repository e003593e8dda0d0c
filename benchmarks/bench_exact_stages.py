"""Stage-level ablation of the exact-kNN builder (rad_tpu.build.exact).

The r3 xplane profile attributed 8.4 s of the 10.3 s 100k build to
`lax.top_k`, but swapping the per-block reduction to `approx_max_k`
left the steady build at 10.8 s — the attribution hit the documented
profiler trap (while/cond durations absorb overlapped child waits,
CLAUDE.md). This script times each stage DIRECTLY with forced host
readbacks at exactly the shapes the 100k build uses, so the wall-clock
split is unambiguous:

  allpairs  — _allpairs_topk at layer-0 shape (both reductions)
  select    — _select_layer (diversity heuristic) on real candidates
  symm      — _symmetrize (global reverse-edge merge)
  assemble  — the build's host-side glue (everything minus the stages)

Each stage at an already-built shape is a remote-compile cache hit.
Prints one JSON line.
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


def timeit(fn, *args, runs=2):
    """Time fn(*args) with full host readback; first call warms/compiles."""
    import jax
    best = np.inf
    out = None
    for i in range(runs + 1):
        t0 = time.perf_counter()
        out = fn(*args)
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf)  # tunnel-safe barrier
        dt = time.perf_counter() - t0
        if i > 0:
            best = min(best, dt)
    return best, out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--n-bits", type=int, default=1024)
    ap.add_argument("--connectivity", type=int, default=16)
    ap.add_argument("--stages", nargs="+",
                    default=["allpairs", "select", "symm", "build"])
    ap.add_argument("--bucket", type=int, default=64,
                    help="bucket size for the 'bucket' stage (fused "
                         "in-kernel reduction)")
    ap.add_argument("--q-block", type=int, default=4096)
    ap.add_argument("--col-block", type=int, default=1 << 13,
                    help="columns per all-pairs kernel call; wider = "
                         "fewer cross-block merges (one [q, k + "
                         "col_block/bucket] top_k per call)")
    ap.add_argument("--sel-block", type=int, default=2048,
                    help="selection-stage row chunk (the 'select' stages "
                         "and the 'build' stage)")
    ap.add_argument("--bucket-approx", action="store_true",
                    help="bucket kernel: approximate-reciprocal epilogue "
                         "(drops the exact f32 divide)")
    ap.add_argument("--bucket-q-tile", type=int, default=None)
    ap.add_argument("--bucket-n-tile", type=int, default=None)
    ap.add_argument("--exact-topk", action="store_true",
                    help="also time the approx_recall=None reduction")
    ap.add_argument("--recall", type=int, default=0, metavar="NQ",
                    help="after the 'build' stage: recall@10 of the built "
                         "graph over NQ sampled library queries vs blocked "
                         "exact ground truth (device search, ef=32)")
    ap.add_argument("--profile", metavar="DIR",
                    help="xplane-trace the allpairs stage and print the "
                         "top device ops (leaf events; see CLAUDE.md for "
                         "the while/cond attribution caveat)")
    ap.add_argument("--probes", type=int, default=None,
                    help="cluster-probed candidate stage: probe this many "
                         "clusters per query block (subquadratic; None = "
                         "exact). Adds a 'probed' stage and routes the "
                         "'build' stage through probes=")
    ap.add_argument("--probe-csize", type=int, default=None,
                    help="probe cluster size (default: --col-block)")
    ap.add_argument("--probe-sample", type=int, default=16)
    ap.add_argument("--probe-min-n", type=int, default=0,
                    help="layer-size floor for probing (bench default 0: "
                         "probe whatever --probes asks; the library "
                         "default gates upper layers to the exact stage)")
    ap.add_argument("--probe-granularity", choices=["qblock", "cluster"],
                    default="qblock",
                    help="probe-list granularity: per dispatched q-block "
                         "(finer coverage, default) or per cluster (the "
                         "r3 form)")
    ap.add_argument("--probe-width", type=int, default=None,
                    help="pad probe lists to this width with dead "
                         "clusters so a recall sweep over --probes "
                         "reuses ONE remote compile; scan time reflects "
                         "the padded width — never use for throughput")
    ap.add_argument("--symm", choices=["auto", "sort", "two_pass",
                                       "chunked", "spanned"],
                    default="auto",
                    help="symmetrization form for the 'build' stage "
                         "(compile-service probes at large n)")
    args = ap.parse_args(argv)

    import logging
    logging.basicConfig(
        level=logging.INFO, stream=sys.stderr,
        format="%(asctime)s %(name)s %(message)s")

    import jax
    import jax.numpy as jnp
    from rad_tpu.build import exact as ex
    from rad_tpu.build.reference import sample_levels
    from rad_tpu.fp.pack import popcount_rows_np

    log(f"device: {jax.devices()[0]}")
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "examples"))
    # library cache: generation is host-bound (~10 min sequential at 1M,
    # ~10 min batched at 10M on the one shared core) and deterministic
    # given (n, n_bits, seed=0) — probes/recall sweeps re-run this script
    # at identical n many times
    cache = f"/tmp/bes_lib_n{args.n}_b{args.n_bits}_s0.npy"
    if os.path.exists(cache):
        fps = np.load(cache)
        log(f"library loaded from {cache}")
    elif args.n > 2_000_000:
        # the sequential generator costs ~1 min/100k rows; batched is the
        # same manifold statistics, vectorized
        from enrichment_example import make_library_batched
        fps, _ = make_library_batched(args.n, args.n_bits, seed=0)
        np.save(cache, fps)
    else:
        from enrichment_example import make_library
        fps, _, _ = make_library(args.n, args.n_bits, seed=0)
        np.save(cache, fps)

    n, w = fps.shape
    m = args.connectivity
    m0 = 2 * m
    heuristic_k = max(4 * m, 32)
    k = max(heuristic_k, 2 * m0)

    # identical preprocessing to build_hnsw_exact
    levels_raw = sample_levels(n, m, seed=0)
    order = np.lexsort((np.arange(n), -levels_raw))
    packed = np.ascontiguousarray(fps[order], dtype=np.uint32)
    pops_np = popcount_rows_np(packed)

    # layer-0 shapes
    n_l = n
    big = max(args.q_block, args.col_block, 2048)
    n_pad = ex._round_up(n_l, big)
    pad = np.zeros((n_pad - n_l, w), np.uint32)
    packed_l = jnp.asarray(np.concatenate([packed[:n_l], pad]))
    pops_l = jnp.asarray(np.concatenate(
        [pops_np[:n_l], np.zeros(n_pad - n_l, pops_np.dtype)]))
    kk = min(k, n_l - 1)

    results = {}
    cand_d = cand_id = sel = sel_d = None

    b_opts = ((args.bucket_approx, args.bucket_q_tile, args.bucket_n_tile)
              if (args.bucket_approx or args.bucket_q_tile
                  or args.bucket_n_tile) else None)

    if "bucket" in args.stages:
        dt, (cand_d, cand_id) = timeit(
            lambda: ex._allpairs_topk(packed_l, n_l, kk, args.q_block,
                                      args.col_block,
                                      True, 0.99, bucket=args.bucket,
                                      bucket_opts=b_opts))
        results[f"allpairs_bucket{args.bucket}"] = dt
        log(f"allpairs (bucket={args.bucket} fused, opts={b_opts}): "
            f"{dt:.2f}s")
        if args.profile:
            import jax.profiler
            from rad_tpu.utils.profiling import aggregate_xla_ops
            with jax.profiler.trace(args.profile):
                out = ex._allpairs_topk(packed_l, n_l, kk, args.q_block,
                                      args.col_block,
                                        True, 0.99, bucket=args.bucket)
                np.asarray(out[0])
            ops, n_ev = aggregate_xla_ops(args.profile)
            total = sum(ops.values())
            log(f"profile (bucket path): {n_ev} events, "
                f"{total/1e6:.1f} ms device")
            for name, ns in sorted(ops.items(), key=lambda kv: -kv[1])[:20]:
                log(f"  {ns/1e6:10.2f} ms  {name}")

    if "probed" in args.stages or (args.probes and
                                   "allpairs" in args.stages):
        csz = args.probe_csize or args.col_block
        p = args.probes or 16
        dt, (cand_d, cand_id) = timeit(
            lambda: ex._allpairs_topk_probed(
                packed_l, n_l, kk, args.q_block, csz, True, 0.99,
                bucket=args.bucket, interpret=False, probes=p,
                probe_sample=args.probe_sample, seed=1,
                pairs_per_dispatch=ex.PAIRS_PER_DISPATCH,
                bucket_opts=b_opts,
                probe_granularity=args.probe_granularity,
                probe_width=args.probe_width), runs=2)
        results[f"allpairs_probed{p}"] = dt
        log(f"allpairs (probed p={p}, csize={csz}): {dt:.2f}s")

    if "allpairs" in args.stages and not args.probes:
        dt, (cand_d, cand_id) = timeit(
            lambda: ex._allpairs_topk(packed_l, n_l, kk, args.q_block,
                                      args.col_block,
                                      True, 0.99))
        results["allpairs_approx"] = dt
        log(f"allpairs (approx_max_k): {dt:.2f}s")
        if args.profile:
            import jax.profiler
            from rad_tpu.utils.profiling import aggregate_xla_ops
            with jax.profiler.trace(args.profile):
                out = ex._allpairs_topk(packed_l, n_l, kk, args.q_block,
                                      args.col_block,
                                        True, 0.99)
                np.asarray(out[0])
            ops, n_ev = aggregate_xla_ops(args.profile)
            total = sum(ops.values())
            log(f"profile: {n_ev} events, {total/1e6:.1f} ms device")
            for name, ns in sorted(ops.items(), key=lambda kv: -kv[1])[:20]:
                log(f"  {ns/1e6:10.2f} ms  {name}")
        if args.exact_topk:
            dt, _ = timeit(
                lambda: ex._allpairs_topk(packed_l, n_l, kk, args.q_block,
                                      args.col_block,
                                          True, None))
            results["allpairs_exact"] = dt
            log(f"allpairs (exact top_k): {dt:.2f}s")

    if "select" in args.stages and cand_d is not None:
        dt, (sel, sel_d) = timeit(
            lambda: ex._select_layer(packed_l, pops_l, cand_d, cand_id,
                                     n_l, m, heuristic_k, args.sel_block))
        results["select"] = dt
        log(f"select: {dt:.2f}s")

    if "select-mxu" in args.stages and cand_d is not None:
        dt, (sel, sel_d) = timeit(
            lambda: ex._select_layer(packed_l, pops_l, cand_d, cand_id,
                                     n_l, m, heuristic_k, args.sel_block,
                                     mxu_pairs=True))
        results["select_mxu"] = dt
        log(f"select (mxu pairs): {dt:.2f}s")

    if "symm" in args.stages and sel is not None:
        dt, _ = timeit(lambda: ex._symmetrize(sel, sel_d, n_l, m0))
        results["symm"] = dt
        log(f"symm: {dt:.2f}s")

    if "build" in args.stages:
        from rad_tpu.build.exact import build_hnsw_exact
        symm = None if args.symm == "auto" else args.symm

        def barrier(g):
            # neighbors stay DEVICE-resident (the traversal consumes them
            # there); force completion with one-row readbacks, not a full
            # adjacency download
            for t in g.neighbors:
                if t.shape[0]:
                    np.asarray(t[-1:])

        bkw = dict(symm_mode=symm, bucket_approx=args.bucket_approx,
                   bucket_q_tile=args.bucket_q_tile,
                   bucket_n_tile=args.bucket_n_tile,
                   q_block=args.q_block, col_block=args.col_block,
                   sel_block=args.sel_block, probes=args.probes,
                   probe_csize=args.probe_csize,
                   probe_sample=args.probe_sample,
                   probe_granularity=args.probe_granularity,
                   probe_width=args.probe_width,
                   probe_min_n=args.probe_min_n)
        t0 = time.perf_counter()
        g = build_hnsw_exact(fps, connectivity=m, seed=0, **bkw)
        barrier(g)
        dt0 = time.perf_counter() - t0
        log(f"build run1 (cold, incl. compiles): {dt0:.2f}s")
        t0 = time.perf_counter()
        g = build_hnsw_exact(fps, connectivity=m, seed=0, **bkw)
        barrier(g)
        dt = time.perf_counter() - t0
        results["build_total"] = min(dt0, dt)
        log(f"full build: {min(dt0, dt):.2f}s "
            f"({args.n / min(dt0, dt):.0f} nodes/s)")

        if args.recall:
            import jax.numpy as jnp
            from rad_tpu.fp.tanimoto import bruteforce_topk_blocked
            from rad_tpu.search.knn import search_device
            rng = np.random.default_rng(17)
            qidx = rng.choice(args.n, size=args.recall, replace=False)
            q = np.ascontiguousarray(fps[qidx])
            d_t, i_t = bruteforce_topk_blocked(jnp.asarray(q), g.packed,
                                               10)
            # ground truth over the graph's LEVEL-SORTED row order; map
            # back through keys (= original indices for default keys)
            keys = np.asarray(g.keys)
            i_t = keys[np.maximum(np.asarray(i_t), 0)]
            _, i_s = search_device(g, q, k=10, expansion_search=32)
            i_s = np.asarray(i_s)
            i_s = np.where(i_s >= 0, keys[np.maximum(i_s, 0)], -1)
            rec = np.mean([
                len(set(i_s[r].tolist()) & set(i_t[r].tolist())) / 10.0
                for r in range(args.recall)])
            results["recall_at_10"] = float(rec)
            log(f"recall@10 over {args.recall} queries: {rec:.4f}")

    print(json.dumps({"metric": "exact_build_stages", "n": args.n,
                      "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
