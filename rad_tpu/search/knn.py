"""Jitted batched HNSW k-NN search (greedy descent + layer-0 beam).

The device analogue of usearch's ``Index.search``: one compiled program per
(shape, ef, k) runs B queries in parallel (vmap), each performing the
standard HNSW query — greedy routing through the upper layers, then an
``expansion_search``-wide best-first beam on layer 0 — entirely with static
shapes (`lax.while_loop` + masked top-k merges), so XLA can pipeline the
gathers and the VPU popcount distance.

Beam state per query: ``(beam_d [ef], beam_id [ef], expanded [ef])`` plus a
``[N] bool`` visited map. The loop pops the best unexpanded beam entry,
gathers its ≤M0 neighbors, computes packed Tanimoto distances, and merges
into the beam with one sort — converging when every beam slot is expanded
(the parallel-friendly equivalent of the candidate-heap termination in the
sequential algorithm; oracle: rad_tpu.build.reference.search_hnsw).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rad_tpu.fp.pack import popcount, popcount_rows
from rad_tpu.graph.storage import HNSWGraph
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


@partial(jax.jit, static_argnames=("k", "ef", "max_level", "expand_width"))
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
):
    """Batched search. Returns ``(dists [B, k], node_ids [B, k])``.

    ``expand_width`` (E) beam entries expand per iteration — the standard
    accelerator trade: E× fewer lockstep loop iterations and E·M0-wide
    distance batches, at slightly more distance evals than strictly
    best-first expansion (recall is unaffected: expansion *order* within a
    converged beam does not change the converged set).
    """
    n = packed.shape[0]
    m0 = adj.shape[1]
    e = expand_width
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
        visited = jnp.zeros((n,), jnp.bool_).at[ep].set(True)

        def cond(c):
            beam_d, beam_id, expanded, visited = c
            return jnp.any(~expanded & jnp.isfinite(beam_d))

        def body(c):
            beam_d, beam_id, expanded, visited = c
            # take the E best unexpanded entries this iteration
            neg, sel = jax.lax.top_k(
                jnp.where(expanded, -jnp.inf, -beam_d), e)
            has_work = jnp.isfinite(-neg)
            expanded = expanded.at[jnp.where(has_work, sel, ef)].set(
                True, mode="drop")
            u = jnp.maximum(beam_id[sel], 0)               # [E]
            rows = adj[u].reshape(-1)                      # [E*M0]
            valid = (rows >= 0) & jnp.repeat(has_work, m0)
            seen = visited[jnp.maximum(rows, 0)]
            valid = valid & ~seen
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
            visited = visited.at[jnp.where(valid, rows, n)].set(
                True, mode="drop")
            d_n = _query_dist(q, q_pop, packed, pops, rows, valid)
            all_d = jnp.concatenate([beam_d, d_n])
            all_id = jnp.concatenate([beam_id, jnp.where(valid, rows, -1)])
            all_e = jnp.concatenate([expanded,
                                     jnp.zeros((e * m0,), jnp.bool_)])
            sd, sid, se = jax.lax.sort((all_d, all_id, all_e), num_keys=1)
            return sd[:ef], sid[:ef], se[:ef], visited

        beam_d, beam_id, expanded, visited = jax.lax.while_loop(
            cond, body, (beam_d, beam_id, expanded, visited))
        return beam_d[:k], beam_id[:k]

    return jax.vmap(one_query)(queries, q_pops)


# cache of per-graph device arrays (adj/offsets) keyed by graph identity
_PREP_CACHE: dict = {}


def _prep(graph: HNSWGraph):
    key = id(graph)
    if key not in _PREP_CACHE:
        dg = prepare_device_graph(graph)
        packed = jnp.asarray(np.asarray(graph.packed))
        pops = jnp.asarray(np.asarray(graph.popcounts))
        _PREP_CACHE[key] = (dg, packed, pops)
        if len(_PREP_CACHE) > 8:
            _PREP_CACHE.pop(next(iter(_PREP_CACHE)))
    return _PREP_CACHE[key]


def search_device(
    graph: HNSWGraph,
    queries: np.ndarray,
    k: int = 10,
    expansion_search: int = 64,
    expand_width: int = 4,
    chunk_size: int | None = None,
):
    """Search a built graph: ``(dists [B, k], node_ids [B, k])``.

    ``chunk_size`` bounds the per-query visited memory (B·N bytes): query
    batches larger than it are processed in equal chunks through the same
    compiled program. Defaults to capping visited at ~512 MB.
    """
    dg, packed, pops = _prep(graph)
    queries = np.atleast_2d(np.asarray(queries, np.uint32))
    ef = max(expansion_search, k)
    b = queries.shape[0]
    if chunk_size is None:
        chunk_size = max(1, min(b, (512 << 20) // max(len(graph), 1)))
    if b <= chunk_size:
        return search_device_jit(packed, pops, dg.adj, dg.offsets,
                                 jnp.asarray(queries), k=k, ef=ef,
                                 max_level=dg.max_level,
                                 expand_width=expand_width)
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
            max_level=dg.max_level, expand_width=expand_width)
        outs_d.append(np.asarray(d))
        outs_i.append(np.asarray(i))
    d = np.concatenate(outs_d)[:b]
    i = np.concatenate(outs_i)[:b]
    return jnp.asarray(d), jnp.asarray(i)
