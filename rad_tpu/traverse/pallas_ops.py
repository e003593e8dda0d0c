"""Fused candidate-pipeline kernels for the exhaustive-regime engine.

The single-chip step's residual cost in the exhaustive regime is a chain
of ~15 dependent [B*M0]-sized random gathers/scatters over the state
tables (scored bitmap, score table, enqueued bitmap) plus two
first-occurrence dedups — measured 1.05 ms of the 1.6 ms step at
batch=256/1M (bench_step_profile; each op is latency-pipelined, so op
substitution is neutral and only FUSION can win). At <= ~2M nodes every
table fits comfortably in VMEM (~16 MB/core), so the whole chain can run
as ONE Pallas kernel with an in-kernel scalar loop over the candidates:

* :func:`candidate_filter_pallas` (K1) — the expand-side scored-test +
  within-batch dedup + front-compaction producing ``to_score``. The
  progressive mark in a VMEM scratch copy of the scored bitmap IS the
  first-occurrence dedup, so the separate O(N)-scratch
  ``first_occurrence`` scatter pass disappears.
* :func:`integrate_candidates_pallas` (K2) — the integrate-side chain:
  scored insert-if-absent (fresh mask), score-table writes, enqueued
  check-and-set at row granularity (progressive = XLA's
  ``first & ~enqueued`` exactly), and the push-candidate score lookup.
  State arrays are updated in place (input/output aliasing).

Bit-identity with the XLA chain (rad_tpu.traverse.device expand_impl /
integrate_impl) is pinned by tests/test_pallas_ops.py in interpreter
mode; the sequential loop's semantics match the XLA formulation by
construction (see the per-line comments).

Decision record (VERDICT r3 item 5): benchmarks/bench_scalar_probe.py
measures the per-candidate scalar-loop cost on the real chip; the
break-even against the XLA chain is ~128 ns/candidate and a win needs
<= ~60 ns. The engine flag stays opt-in until the measured win exists.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = jnp.float32(jnp.inf)

__all__ = ["candidate_filter_pallas", "integrate_candidates_pallas"]


@partial(jax.jit, static_argnames=("interpret",))
def candidate_filter_pallas(cand_flat: jnp.ndarray,
                            scored: jnp.ndarray,
                            interpret: bool | None = None) -> jnp.ndarray:
    """Expand-side candidate filter (K1).

    cand_flat: [K] int32 neighbor ids, -1 invalid.
    scored:    [N] bool — the scored set.
    Returns to_score [K] int32: unique unscored ids compacted to the
    front in candidate order, -1 padded — identical to the XLA
    formulation in expand_impl (unscored & first_occurrence + cumsum
    compaction).
    """
    if interpret is None:  # Mosaic path needs a TPU; CPU tests interpret
        interpret = jax.default_backend() != "tpu"
    k = cand_flat.shape[0]
    n = scored.shape[0]
    scored_i8 = scored.astype(jnp.int8).reshape(n, 1)
    cand2 = cand_flat.reshape(k, 1)

    def kernel(cand_ref, scored_ref, out_ref, mark_ref):
        # progressive mark scratch: scored ∪ already-emitted-this-batch —
        # testing it gives (unscored & first-occurrence) in one load
        mark_ref[...] = scored_ref[...]
        out_ref[...] = jnp.full((k, 1), -1, jnp.int32)

        def body(i, pos):
            j = cand_ref[i, 0]
            ok = j >= 0
            w = jnp.where(ok, j, 0)
            hit = mark_ref[w, 0]
            emit = ok & (hit == 0)
            # slot 0 rewrite on !ok/dup is a no-op (writes hit back)
            mark_ref[w, 0] = jnp.where(emit, jnp.int8(1), hit)
            p = jnp.where(emit, pos, k - 1)
            # pad slots stay -1: emit==False writes the existing value
            out_ref[p, 0] = jnp.where(emit, j, out_ref[p, 0])
            return pos + emit.astype(jnp.int32)

        jax.lax.fori_loop(0, k, body, jnp.int32(0))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((k, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, 1), jnp.int8)],
        interpret=interpret,
    )(cand2, scored_i8)
    return out.reshape(k)


@partial(jax.jit, static_argnames=("interpret",))
def integrate_candidates_pallas(to_score: jnp.ndarray,
                                new_scores: jnp.ndarray,
                                cand_flat: jnp.ndarray,
                                row_flat: jnp.ndarray,
                                scored: jnp.ndarray,
                                scores: jnp.ndarray,
                                enqueued: jnp.ndarray,
                                interpret: bool | None = None):
    """Integrate-side fused chain (K2).

    to_score:  [K] int32 from K1 (-1 pads).
    new_scores:[K] float32 aligned with to_score.
    cand_flat: [K] int32 raw candidates (-1 invalid).
    row_flat:  [K] int32 enqueue row per candidate (precomputed
               offsets[level] + cand; value irrelevant when cand < 0).
    scored [N] bool / scores [N] f32 / enqueued [R] bool: state tables.

    Returns (scored', scores', enqueued', fresh [K] bool, push [K] bool,
    cand_score [K] f32) where fresh/push/cand_score are bit-identical to
    integrate_impl's masks: ``fresh = ok & ~already``; ``push = ok &
    ~enqueued_pre & first_occurrence(row)`` (the progressive set gives
    exactly that); ``cand_score = push ? scores_post_insert[cand] : INF``.
    """
    if interpret is None:  # Mosaic path needs a TPU; CPU tests interpret
        interpret = jax.default_backend() != "tpu"
    kt = to_score.shape[0]     # may be narrower than the candidate set
    kc = cand_flat.shape[0]    # (fused_run narrow_width slices to_score)
    n = scored.shape[0]
    r_rows = enqueued.shape[0]
    scored_i8 = scored.astype(jnp.int8).reshape(n, 1)
    enq_i8 = enqueued.astype(jnp.int8).reshape(r_rows, 1)
    scores2 = scores.reshape(n, 1)

    def kernel(ts_ref, ns_ref, cand_ref, row_ref,
               scored_in, scores_in, enq_in,
               scored_out, scores_out, enq_out,
               fresh_ref, push_ref, cscore_ref):
        scored_out[...] = scored_in[...]
        scores_out[...] = scores_in[...]
        enq_out[...] = enq_in[...]

        # phase A: scored insert-if-absent + score-table write. Must
        # fully precede phase B: pushed candidates read the POST-insert
        # score table (matches integrate_impl's ordering).
        def body_a(i, _):
            j = ts_ref[i, 0]
            ok = j >= 0
            w = jnp.where(ok, j, 0)
            already = scored_out[w, 0]
            fresh = ok & (already == 0)
            scored_out[w, 0] = jnp.where(fresh, jnp.int8(1), already)
            scores_out[w, 0] = jnp.where(fresh, ns_ref[i, 0],
                                         scores_out[w, 0])
            fresh_ref[i, 0] = fresh.astype(jnp.int8)
            return 0

        jax.lax.fori_loop(0, kt, body_a, 0)

        # phase B: enqueue check-and-set + push score lookup. The
        # progressive set in enq_out makes a row's SECOND occurrence in
        # this batch read hit=1 — identical to the XLA
        # first_occurrence(row_key) & ~enqueued_pre combination.
        def body_b(i, _):
            j = cand_ref[i, 0]
            ok = j >= 0
            r = jnp.where(ok, row_ref[i, 0], 0)
            hit = enq_out[r, 0]
            push = ok & (hit == 0)
            enq_out[r, 0] = jnp.where(push, jnp.int8(1), hit)
            w = jnp.where(ok, j, 0)
            cscore_ref[i, 0] = jnp.where(push, scores_out[w, 0],
                                         float("inf"))
            push_ref[i, 0] = push.astype(jnp.int8)
            return 0

        jax.lax.fori_loop(0, kc, body_b, 0)

    outs = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), jnp.int8),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((r_rows, 1), jnp.int8),
            jax.ShapeDtypeStruct((kt, 1), jnp.int8),
            jax.ShapeDtypeStruct((kc, 1), jnp.int8),
            jax.ShapeDtypeStruct((kc, 1), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 6),
        input_output_aliases={4: 0, 5: 1, 6: 2},
        interpret=interpret,
    )(to_score.reshape(kt, 1), new_scores.reshape(kt, 1),
      cand_flat.reshape(kc, 1), row_flat.reshape(kc, 1),
      scored_i8, scores2, enq_i8)
    scored_o, scores_o, enq_o, fresh_o, push_o, cscore_o = outs
    return (scored_o.reshape(n).astype(jnp.bool_),
            scores_o.reshape(n),
            enq_o.reshape(r_rows).astype(jnp.bool_),
            fresh_o.reshape(kt).astype(jnp.bool_),
            push_o.reshape(kc).astype(jnp.bool_),
            cscore_o.reshape(kc))
