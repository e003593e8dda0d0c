"""Jitted batched HNSW k-NN search (greedy descent + layer-0 beam).

The device analogue of usearch's ``Index.search``: one compiled program per
(shape, ef, k) runs B queries in parallel (vmap), each performing the
standard HNSW query — greedy routing through the upper layers, then an
``expansion_search``-wide best-first beam on layer 0 — entirely with static
shapes (`lax.while_loop` + masked top-k merges), so XLA can pipeline the
gathers and the VPU popcount distance.

Beam state per query: ``(beam_d [ef], beam_id [ef], expanded [ef])`` plus a
fixed-capacity visited id hash table (rad_tpu.search.visited) — ``[H]``
per query with H independent of N, so batched search memory no longer
scales as B·N bools. Membership tests compare full ids (no false
positives); a failed insert only allows a revisit, which a beam-membership
mask and the merge's monotone eviction make harmless. The loop pops the
best unexpanded beam entry, gathers its ≤M0 neighbors, computes packed
Tanimoto distances, and merges into the beam with one sort — converging
when every beam slot is expanded (the parallel-friendly equivalent of the
candidate-heap termination in the sequential algorithm; oracle:
rad_tpu.build.reference.search_hnsw).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rad_tpu.fp.pack import popcount, popcount_rows
from rad_tpu.graph.storage import HNSWGraph
from rad_tpu.search.visited import (hashset_check_insert, hashset_init,
                                    use_dense_visited,
                                    visited_capacity_for)
from rad_tpu.traverse.device import prepare_device_graph

__all__ = ["search_device", "search_device_jit"]


def _query_dist(q_packed, q_pop, packed, pops, ids, valid):
    """Tanimoto distance from one query to gathered rows (masked +inf)."""
    safe = jnp.maximum(ids, 0)
    rows = packed[safe]  # [K, W]
    inter = jnp.sum(popcount(rows & q_packed[None, :]), axis=-1)
    union = q_pop + pops[safe] - inter
    sim = jnp.where(union > 0, inter / jnp.maximum(union, 1), 1.0)
    d = (1.0 - sim).astype(jnp.float32)
    return jnp.where(valid, d, jnp.inf)


@partial(jax.jit, static_argnames=("k", "ef", "max_level", "expand_width",
                                   "visited_capacity"))
def search_device_jit(
    packed: jnp.ndarray,
    pops: jnp.ndarray,
    adj: jnp.ndarray,
    offsets: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    ef: int,
    max_level: int,
    expand_width: int = 4,
    visited_capacity: int | None = None,
):
    """Batched search. Returns ``(dists [B, k], node_ids [B, k])``.

    ``expand_width`` (E) beam entries expand per iteration — the standard
    accelerator trade: E× fewer lockstep loop iterations and E·M0-wide
    distance batches, at slightly more distance evals than strictly
    best-first expansion (recall is unaffected: expansion *order* within a
    converged beam does not change the converged set).

    ``visited_capacity``: per-query visited hash table size (power of two);
    defaults to ~4× the expected visit count. Memory is B·H·4 bytes,
    independent of library size.
    """
    n = packed.shape[0]
    m0 = adj.shape[1]
    e = expand_width
    # dense [B, N] visited while it fits the budget (exact, cheapest);
    # bounded hash table past it (memory independent of N)
    dense = visited_capacity is None and use_dense_visited(
        queries.shape[0], n)
    if visited_capacity is None:
        visited_capacity = visited_capacity_for(ef, m0, n)
    # tie-churn safety net: re-encounters of tied-distance evicted nodes are
    # possible only after a (rare) hash-insert failure; a generous iteration
    # cap bounds them without ever truncating a normal search (which
    # converges in ≈ a few × ef/E iterations).
    max_iters = (16 * ef) // max(e, 1) + 256
    q_pops = popcount_rows(queries)

    def one_query(q, q_pop):
        # ---- greedy descent through layers max_level..1 ------------------
        def descend_layer(carry, l_rev):
            ep, d_ep = carry
            l = max_level - l_rev  # static unroll not needed; l is traced

            def cond(c):
                _, _, improved = c
                return improved

            def body(c):
                ep_i, d_i, _ = c
                row = adj[offsets[l] + ep_i]
                valid = row >= 0
                d_n = _query_dist(q, q_pop, packed, pops, row, valid)
                j = jnp.argmin(d_n)
                better = d_n[j] < d_i
                return (jnp.where(better, row[j], ep_i),
                        jnp.where(better, d_n[j], d_i),
                        better)

            ep, d_ep, _ = jax.lax.while_loop(
                cond, body, (ep, d_ep, jnp.bool_(True)))
            return (ep, d_ep), None

        d0 = _query_dist(q, q_pop, packed, pops,
                         jnp.zeros((1,), jnp.int32),
                         jnp.ones((1,), jnp.bool_))[0]
        if max_level > 0:
            (ep, d_ep), _ = jax.lax.scan(
                descend_layer, (jnp.int32(0), d0),
                jnp.arange(max_level, dtype=jnp.int32))
        else:
            ep, d_ep = jnp.int32(0), d0

        # ---- layer-0 beam ------------------------------------------------
        beam_d = jnp.full((ef,), jnp.inf, jnp.float32).at[0].set(d_ep)
        beam_id = jnp.full((ef,), -1, jnp.int32).at[0].set(ep)
        expanded = jnp.zeros((ef,), jnp.bool_)
        if dense:
            visited = jnp.zeros((n,), jnp.bool_).at[ep].set(True)
        else:
            visited, _ = hashset_check_insert(
                hashset_init(visited_capacity), ep[None],
                jnp.ones((1,), jnp.bool_))

        def cond(c):
            beam_d, beam_id, expanded, visited, it = c
            return jnp.any(~expanded & jnp.isfinite(beam_d)) \
                & (it < max_iters)

        def body(c):
            beam_d, beam_id, expanded, visited, it = c
            # take the E best unexpanded entries this iteration
            neg, sel = jax.lax.top_k(
                jnp.where(expanded, -jnp.inf, -beam_d), e)
            has_work = jnp.isfinite(-neg)
            expanded = expanded.at[jnp.where(has_work, sel, ef)].set(
                True, mode="drop")
            u = jnp.maximum(beam_id[sel], 0)               # [E]
            rows = adj[u].reshape(-1)                      # [E*M0]
            valid = (rows >= 0) & jnp.repeat(has_work, m0)
            if dense:
                seen = visited[jnp.maximum(rows, 0)]
                valid = valid & ~seen
            else:
                # beam-membership mask: exact duplicate prevention
                # independent of the (capacity-bounded) visited table
                in_beam = jnp.any(rows[:, None] == beam_id[None, :],
                                  axis=1)
                valid = valid & ~in_beam
            # intra-iteration dedup: the same node may appear in two
            # expanded rows; keep the first occurrence
            key = jnp.where(valid, rows, n)
            perm = jnp.argsort(key, stable=True)
            sk = key[perm]
            prev = jnp.concatenate([jnp.array([-1], jnp.int32), sk[:-1]])
            first_sorted = (sk != prev) & (sk < n)
            first = jnp.zeros((e * m0,), jnp.bool_).at[perm].set(
                first_sorted)
            valid = valid & first
            if dense:
                visited = visited.at[jnp.where(valid, rows, n)].set(
                    True, mode="drop")
            else:
                visited, seen = hashset_check_insert(visited, rows, valid)
                valid = valid & ~seen
            d_n = _query_dist(q, q_pop, packed, pops, rows, valid)
            all_d = jnp.concatenate([beam_d, d_n])
            all_id = jnp.concatenate([beam_id, jnp.where(valid, rows, -1)])
            all_e = jnp.concatenate([expanded,
                                     jnp.zeros((e * m0,), jnp.bool_)])
            sd, sid, se = jax.lax.sort((all_d, all_id, all_e), num_keys=1)
            return sd[:ef], sid[:ef], se[:ef], visited, it + 1

        beam_d, beam_id, expanded, visited, _ = jax.lax.while_loop(
            cond, body,
            (beam_d, beam_id, expanded, visited, jnp.int32(0)))
        return beam_d[:k], beam_id[:k]

    return jax.vmap(one_query)(queries, q_pops)


def _prep(graph: HNSWGraph):
    """Per-graph device arrays (adj/offsets), cached ON the graph object so
    the cache entry dies with the graph (no id()-reuse aliasing and no
    pinned device memory for dead graphs)."""
    prep = getattr(graph, "_device_prep", None)
    if prep is None:
        dg = prepare_device_graph(graph)
        packed = jnp.asarray(np.asarray(graph.packed))
        pops = jnp.asarray(np.asarray(graph.popcounts))
        prep = (dg, packed, pops)
        graph._device_prep = prep
    return prep


def search_device(
    graph: HNSWGraph,
    queries: np.ndarray,
    k: int = 10,
    expansion_search: int = 64,
    expand_width: int = 4,
    chunk_size: int | None = None,
    visited_capacity: int | None = None,
):
    """Search a built graph: ``(dists [B, k], node_ids [B, k])``.

    Query batches larger than ``chunk_size`` are processed in equal chunks
    through one compiled program (bounds compile size and the B·H visited
    tables; per-query memory is independent of library size).
    """
    dg, packed, pops = _prep(graph)
    queries = np.atleast_2d(np.asarray(queries, np.uint32))
    ef = max(expansion_search, k)
    b = queries.shape[0]
    if chunk_size is None:
        chunk_size = max(1, min(b, 4096))
    if b <= chunk_size:
        return search_device_jit(packed, pops, dg.adj, dg.offsets,
                                 jnp.asarray(queries), k=k, ef=ef,
                                 max_level=dg.max_level,
                                 expand_width=expand_width,
                                 visited_capacity=visited_capacity)
    # pad to a multiple of chunk_size so every chunk reuses one compile
    pad = (-b) % chunk_size
    if pad:
        queries = np.concatenate(
            [queries, np.repeat(queries[-1:], pad, axis=0)], axis=0)
    outs_d, outs_i = [], []
    for lo in range(0, queries.shape[0], chunk_size):
        d, i = search_device_jit(
            packed, pops, dg.adj, dg.offsets,
            jnp.asarray(queries[lo:lo + chunk_size]), k=k, ef=ef,
            max_level=dg.max_level, expand_width=expand_width,
            visited_capacity=visited_capacity)
        outs_d.append(np.asarray(d))
        outs_i.append(np.asarray(i))
    d = np.concatenate(outs_d)[:b]
    i = np.concatenate(outs_i)[:b]
    return jnp.asarray(d), jnp.asarray(i)
