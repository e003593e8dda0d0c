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

from rad_tpu.fp.pack import popcount_rows
from rad_tpu.fp.tanimoto import tanimoto_rows_to_target
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
    return tanimoto_rows_to_target(rows, pops[safe], q_packed, q_pop,
                                   valid=valid)


@partial(jax.jit, static_argnames=("k", "ef", "max_level", "expand_width",
                                   "visited_capacity", "prefix_words",
                                   "prefix_keep", "adj_bits", "adj_group",
                                   "m0_packed"))
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
    prefix_words: int = 0,
    prefix_keep: int = 0,
    prefix: jnp.ndarray | None = None,
    prefix_pops: jnp.ndarray | None = None,
    adj_bits: int = 32,
    adj_group: int = 1,
    m0_packed: int | None = None,
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

    ``prefix_words`` > 0 enables the two-stage prefix filter (the
    pHNSW/AQR-style screen, PAPERS.md): per candidate wave, Tanimoto on the
    first ``prefix_words`` words (gathered from the compact ``prefix``
    array — traffic shrinks by W/prefix_words) ranks the E·M0 candidates,
    and only the best ``prefix_keep`` get full-width distances and beam
    entry; the rest are pruned permanently. A heuristic: recall/throughput
    trade measured in benchmarks/bench_prefix.py.
    """
    n = packed.shape[0]
    if adj_bits < 32 and m0_packed is None:
        raise ValueError(
            "m0_packed is required when adj_bits < 32: a grouped "
            "bit-packed table's row width no longer encodes the neighbor "
            "count (search_device passes it automatically)")
    m0 = m0_packed if adj_bits < 32 else adj.shape[1]
    e = expand_width

    if adj_bits < 32:
        from rad_tpu.graph.adjpack import unpack_adjacency_rows
        w = adj.shape[-1] // adj_group

        def fetch_rows(ridx):
            """[...] row indices -> [..., M0] ids (grouped bit-field
            decode — the >180M serving layout, graph/adjpack.py)."""
            sup = adj[ridx // adj_group]
            cols = ((ridx % adj_group)[..., None] * w
                    + jnp.arange(w, dtype=jnp.int32))
            sub = jnp.take_along_axis(sup, cols, axis=-1)
            return unpack_adjacency_rows(sub, m0, adj_bits)
    else:
        def fetch_rows(ridx):
            return adj[ridx]
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
    pw = prefix_words
    keep = min(prefix_keep, e * m0) if pw > 0 else 0
    if pw > 0:
        assert prefix is not None and prefix_pops is not None
        q_pref_pops = popcount_rows(queries[:, :pw])
    else:
        q_pref_pops = jnp.zeros((queries.shape[0],), jnp.int32)

    def one_query(q, q_pop, q_pref_pop):
        # ---- greedy descent through layers max_level..1 ------------------
        def descend_layer(carry, l_rev):
            ep, d_ep = carry
            l = max_level - l_rev  # static unroll not needed; l is traced

            def cond(c):
                _, _, improved = c
                return improved

            def body(c):
                ep_i, d_i, _ = c
                row = fetch_rows(offsets[l] + ep_i)
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
            rows = fetch_rows(u).reshape(-1)               # [E*M0]
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
            if pw > 0:
                # stage 1: rank the wave by prefix Tanimoto (compact
                # [N, pw] gather), keep the best `keep` for full distances
                d_a = _query_dist(q[:pw], q_pref_pop, prefix, prefix_pops,
                                  rows, valid)
                neg_a, ksel = jax.lax.top_k(-d_a, keep)
                kvalid = jnp.isfinite(neg_a)
                krows = jnp.maximum(rows[ksel], 0)
                d_n = _query_dist(q, q_pop, packed, pops, krows, kvalid)
                new_ids = jnp.where(kvalid, rows[ksel], -1)
                w_new = keep
            else:
                d_n = _query_dist(q, q_pop, packed, pops, rows, valid)
                new_ids = jnp.where(valid, rows, -1)
                w_new = e * m0
            all_d = jnp.concatenate([beam_d, d_n])
            all_id = jnp.concatenate([beam_id, new_ids])
            all_e = jnp.concatenate([expanded,
                                     jnp.zeros((w_new,), jnp.bool_)])
            sd, sid, se = jax.lax.sort((all_d, all_id, all_e), num_keys=1)
            return sd[:ef], sid[:ef], se[:ef], visited, it + 1

        beam_d, beam_id, expanded, visited, _ = jax.lax.while_loop(
            cond, body,
            (beam_d, beam_id, expanded, visited, jnp.int32(0)))
        return beam_d[:k], beam_id[:k]

    return jax.vmap(one_query)(queries, q_pops, q_pref_pops)


def _prep(graph: HNSWGraph, packed_adjacency: bool | int = False):
    """Per-graph device arrays (adj/offsets), cached ON the graph object so
    the cache entry dies with the graph (no id()-reuse aliasing and no
    pinned device memory for dead graphs). Packed and int32 layouts cache
    under separate keys."""
    attr = ("_device_prep" if not packed_adjacency
            else f"_device_prep_packed_{packed_adjacency}")
    prep = getattr(graph, attr, None)
    if prep is None:
        dg = prepare_device_graph(graph, packed_adjacency=packed_adjacency)
        packed = jnp.asarray(np.asarray(graph.packed))
        pops = jnp.asarray(np.asarray(graph.popcounts))
        prep = (dg, packed, pops)
        setattr(graph, attr, prep)
    return prep


def _prefix_prep(graph: HNSWGraph, packed: jnp.ndarray, pw: int):
    """Compact [N, pw] prefix array + its popcounts, cached on the graph."""
    cache = getattr(graph, "_prefix_prep", None)
    if cache is None:
        cache = {}
        graph._prefix_prep = cache
    if pw not in cache:
        prefix = jnp.array(packed[:, :pw])  # compact copy, not a view
        cache[pw] = (prefix, popcount_rows(prefix))
    return cache[pw]


def search_device(
    graph: HNSWGraph,
    queries: np.ndarray,
    k: int = 10,
    expansion_search: int = 64,
    expand_width: int = 4,
    chunk_size: int | None = None,
    visited_capacity: int | None = None,
    prefix_filter: int | None = None,
    prefix_keep: int | None = None,
    packed_adjacency: bool | int = False,
):
    """Search a built graph: ``(dists [B, k], node_ids [B, k])``.

    ``packed_adjacency=True`` searches over the grouped bit-field
    neighbor table (rad_tpu.graph.adjpack — same results, ~bits/32 of
    the adjacency HBM; the serving option past the int32 ceiling).

    Query batches larger than ``chunk_size`` are processed in equal chunks
    through one compiled program (bounds compile size and the B·H visited
    tables; per-query memory is independent of library size).

    ``prefix_filter``: number of leading fingerprint BITS for the two-stage
    candidate screen (e.g. 128); ``prefix_keep`` = candidates per wave that
    graduate to full-width distances (default E·M0/4). Heuristic —
    measured recall/throughput trade in benchmarks/bench_prefix.py.
    """
    dg, packed, pops = _prep(graph, packed_adjacency)
    queries = np.atleast_2d(np.asarray(queries, np.uint32))
    ef = max(expansion_search, k)
    b = queries.shape[0]
    pw = 0
    prefix = prefix_pops = None
    keep = 0
    if prefix_filter:
        pw = max(1, int(prefix_filter) // 32)
        keep = prefix_keep or max(k, (expand_width * dg.m0) // 4)
        prefix, prefix_pops = _prefix_prep(graph, packed, pw)
    if chunk_size is None:
        chunk_size = max(1, min(b, 4096))
    kw = dict(k=k, ef=ef, max_level=dg.max_level,
              expand_width=expand_width,
              visited_capacity=visited_capacity,
              prefix_words=pw, prefix_keep=keep,
              prefix=prefix, prefix_pops=prefix_pops,
              adj_bits=dg.adj_bits, adj_group=dg.adj_group,
              m0_packed=dg.m0)
    if b <= chunk_size:
        return search_device_jit(packed, pops, dg.adj, dg.offsets,
                                 jnp.asarray(queries), **kw)
    # pad to a multiple of chunk_size so every chunk reuses one compile
    pad = (-b) % chunk_size
    if pad:
        queries = np.concatenate(
            [queries, np.repeat(queries[-1:], pad, axis=0)], axis=0)
    outs_d, outs_i = [], []
    for lo in range(0, queries.shape[0], chunk_size):
        d, i = search_device_jit(
            packed, pops, dg.adj, dg.offsets,
            jnp.asarray(queries[lo:lo + chunk_size]), **kw)
        outs_d.append(np.asarray(d))
        outs_i.append(np.asarray(i))
    d = np.concatenate(outs_d)[:b]
    i = np.concatenate(outs_i)[:b]
    return jnp.asarray(d), jnp.asarray(i)
