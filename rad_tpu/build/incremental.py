"""True incremental insertion into a built HNSW graph (usearch ``add``
semantics, reference README.md:58).

The level-sorted id scheme (rad_tpu.graph.storage) assigns ids in
descending level order, so appending nodes means *renumbering*: new nodes'
ids interleave with old ones. The insert itself then costs O(K) — each new
node runs the standard greedy-descent + beam + heuristic-selection +
reverse-link pass of the batched device builder against the existing graph
— instead of the O(N+K) full rebuild that ``HNSWIndex.add`` performs.

Visibility invariant that makes this correct: adjacency rows only ever
reference *inserted* nodes (un-inserted rows are all ``-1`` and nothing
links to them until their own insertion applies reverse links), so the
beam's prefix mask generalizes to ``id < batch_start OR is_old[id]`` — the
``extra_visible`` hook in rad_tpu.build.device._beam_search_batch.

New-node levels are sampled from the same geometric distribution but
clamped to the existing ``max_level``: an appended node above the current
hierarchy would displace the entry point with an edge-less node. The
probability mass above max_level is ~1/(N·(M−1)) per node — negligible for
any append onto a non-toy graph — and the clamp is the documented
difference from a from-scratch build.
"""

from __future__ import annotations

import logging
import math

import jax
import jax.numpy as jnp
import numpy as np

from rad_tpu.build.device import (_apply_reverse_links, _beam_search_batch,
                                  _dist_rows, _select_neighbors,
                                  _stitch_batch)
from rad_tpu.build.reference import sample_levels
from rad_tpu.fp.pack import popcount_rows_np
from rad_tpu.graph.storage import HNSWGraph

logger = logging.getLogger(__name__)

__all__ = ["insert_into_graph"]

INF = jnp.inf


def _make_insert_ids(layer_sizes, m: int, ef: int, heuristic_k: int,
                     batch: int, stitch: bool):
    """Jitted insert program over an EXPLICIT id batch (non-contiguous ids;
    -1 padded). ``is_old`` marks pre-existing nodes visible to the beam."""
    max_level = len(layer_sizes) - 1

    @jax.jit
    def insert_ids(adj_layers, packed, pops, levels, batch_ids, batch_min,
                   is_old):
        active = batch_ids >= 0
        safe_ids = jnp.maximum(batch_ids, 0)
        lv = levels[safe_ids]
        prefix = jnp.broadcast_to(batch_min, (batch,))

        ep = jnp.zeros((batch,), jnp.int32)
        d_ep = _dist_rows(packed, pops, safe_ids, ep[:, None],
                          active[:, None])[:, 0]
        eps_d = d_ep[:, None]
        eps_i = ep[:, None]

        new_layers = list(adj_layers)
        for l in range(max_level, -1, -1):
            adj_l = new_layers[l]
            in_layer = (lv >= l) & active
            above = (lv < l) & active

            def greedy_cond(c):
                ep_i, ep_di, improved = c
                return jnp.any(improved)

            def greedy_body(c):
                ep_i, ep_di, _ = c
                nbrs = adj_l[jnp.minimum(ep_i, adj_l.shape[0] - 1)]
                valid = (nbrs >= 0) & above[:, None]
                d_n = _dist_rows(packed, pops, safe_ids, nbrs, valid)
                jbest = jnp.argmin(d_n, axis=1)
                dbest = d_n[jnp.arange(batch), jbest]
                better = dbest < ep_di
                return (jnp.where(better, nbrs[jnp.arange(batch), jbest],
                                  ep_i),
                        jnp.where(better, dbest, ep_di),
                        better)

            g_ep, g_d, _ = jax.lax.while_loop(
                greedy_cond, greedy_body,
                (eps_i[:, 0], eps_d[:, 0], above))

            beam_d, beam_id = _beam_search_batch(
                packed, pops, adj_l, safe_ids, eps_i, eps_d,
                prefix, in_layer, ef, packed.shape[0],
                extra_visible=is_old)

            cap = adj_l.shape[1]
            sel = _select_neighbors(packed, pops, safe_ids, beam_d, beam_id,
                                    min(m, cap), heuristic_k, in_layer)

            write_rows = jnp.where(in_layer, safe_ids, adj_l.shape[0])
            fwd = jnp.full((batch, cap), -1, jnp.int32).at[
                :, : sel.shape[1]].set(sel)
            adj_l = adj_l.at[write_rows].set(fwd, mode="drop")
            adj_l = _apply_reverse_links(packed, pops, adj_l, sel, safe_ids,
                                         cap, in_layer)
            if l == 0 and stitch:
                adj_l = _stitch_batch(packed, pops, adj_l, safe_ids, active,
                                      m, cap)
            new_layers[l] = adj_l

            eps_d = jnp.where(in_layer[:, None], beam_d[:, :ef],
                              jnp.concatenate(
                                  [g_d[:, None],
                                   jnp.full((batch, ef - 1), INF)], axis=1))
            eps_i = jnp.where(in_layer[:, None], beam_id[:, :ef],
                              jnp.concatenate(
                                  [g_ep[:, None],
                                   jnp.full((batch, ef - 1), -1,
                                            jnp.int32)], axis=1))
        return tuple(new_layers)

    return insert_ids


def insert_into_graph(
    graph: HNSWGraph,
    new_packed: np.ndarray,
    new_keys: np.ndarray | None = None,
    expansion_add: int = 200,
    seed: int = 0,
    batch_size: int = 128,
    heuristic_k: int | None = None,
    stitch: bool = True,
) -> HNSWGraph:
    """Insert ``new_packed`` rows into a built graph, returning a NEW graph
    (ids are renumbered to keep the level-sorted invariant; keys are stable
    — the usearch identity model, SURVEY.md §0).

    Cost is O(K) insert work plus an O(N+K) renumber/copy of the stored
    arrays — no re-linking of existing nodes except where reverse links
    attach the newcomers.
    """
    m = graph.connectivity
    n = len(graph)
    new_packed = np.ascontiguousarray(np.atleast_2d(new_packed),
                                      dtype=np.uint32)
    k = new_packed.shape[0]
    if new_packed.shape[1] != np.asarray(graph.packed).shape[1]:
        raise ValueError("fingerprint width mismatch")
    if new_keys is None:
        start = int(np.asarray(graph.keys).max()) + 1 if n else 0
        new_keys = np.arange(start, start + k, dtype=np.int64)
    new_keys = np.asarray(new_keys, dtype=np.int64)
    if new_keys.shape[0] != k:
        raise ValueError(
            f"new_keys has {new_keys.shape[0]} entries for {k} "
            f"fingerprints (mismatched lengths would silently drop or "
            f"misattribute keys)")
    if np.intersect1d(new_keys, np.asarray(graph.keys)).size:
        raise ValueError("duplicate keys (multi-key indexes unsupported)")
    heuristic_k = heuristic_k or max(4 * m, 32)
    ef = max(expansion_add, 2 * m)

    old_levels = np.asarray(graph.levels)
    new_levels = np.minimum(sample_levels(k, m, seed),
                            max(graph.max_level, 0)).astype(np.int32)

    # ------------------------------------------------- renumber (interleave)
    levels_all = np.concatenate([old_levels, new_levels])
    is_new_in = np.concatenate([np.zeros(n, np.int8), np.ones(k, np.int8)])
    order = np.lexsort((np.arange(n + k), is_new_in, -levels_all))
    inv = np.empty(n + k, np.int64)
    inv[order] = np.arange(n + k)

    packed_all = np.concatenate(
        [np.asarray(graph.packed), new_packed])[order]
    keys_all = np.concatenate([np.asarray(graph.keys), new_keys])[order]
    levels_sorted = levels_all[order]
    is_old_sorted = (is_new_in[order] == 0)
    max_level = int(levels_sorted[0]) if n + k else 0
    layer_sizes = tuple(int((levels_sorted >= l).sum())
                        for l in range(max_level + 1))

    old_to_new = inv[:n]
    tables = []
    for l, t in enumerate(graph.neighbors):
        t = np.asarray(t)
        tab = np.full((layer_sizes[l], t.shape[1]), -1, np.int32)
        mapped = np.where(t >= 0, old_to_new[np.maximum(t, 0)],
                          -1).astype(np.int32)
        n_l_old = t.shape[0]
        tab[old_to_new[:n_l_old]] = mapped
        tables.append(tab)

    # ------------------------------------------------------------- insert
    packed_d = jnp.asarray(packed_all)
    pops_d = jnp.asarray(popcount_rows_np(packed_all))
    levels_d = jnp.asarray(levels_sorted)
    is_old_d = jnp.asarray(is_old_sorted)
    adj_layers = tuple(jnp.asarray(t) for t in tables)

    insert_ids = _make_insert_ids(layer_sizes, m, ef, heuristic_k,
                                  batch_size, stitch)
    new_gids = np.sort(inv[n:]).astype(np.int32)
    n_batches = math.ceil(k / batch_size)
    for bi in range(n_batches):
        chunk = new_gids[bi * batch_size:(bi + 1) * batch_size]
        pad = batch_size - chunk.shape[0]
        batch_ids = np.concatenate(
            [chunk, np.full(pad, -1, np.int32)]).astype(np.int32)
        adj_layers = insert_ids(adj_layers, packed_d, pops_d, levels_d,
                                jnp.asarray(batch_ids),
                                jnp.int32(chunk[0]), is_old_d)
    adj_layers = jax.block_until_ready(adj_layers)

    return HNSWGraph(
        packed=packed_d,
        popcounts=pops_d,
        keys=keys_all,  # host int64 (jnp would truncate to int32)
        levels=levels_d,
        neighbors=tuple(np.asarray(t) for t in adj_layers),
        ndim=graph.ndim,
        connectivity=m,
    )
