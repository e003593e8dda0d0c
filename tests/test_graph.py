"""Tests for HNSW graph storage + the host reference builder."""

import numpy as np
import pytest

from rad_tpu.build.reference import build_hnsw, sample_levels, search_hnsw
from rad_tpu.fp import random_fingerprints, tanimoto_matrix
from rad_tpu.graph.storage import HNSWGraph

import jax.numpy as jnp


@pytest.fixture(scope="module")
def small_graph(request):
    fps = random_fingerprints(200, n_bits=64, density=0.3, seed=42)
    return build_hnsw(fps, connectivity=8, expansion_add=40, seed=0)


def test_levels_sorted_and_layer_sizes(small_graph):
    g = small_graph
    levels = np.asarray(g.levels)
    assert (np.diff(levels) <= 0).all(), "ids must be level-sorted descending"
    for l, nl in enumerate(g.layer_sizes):
        assert nl == int((levels >= l).sum())
    assert g.layer_sizes[0] == len(g) == 200
    assert g.max_level == int(levels[0])


def test_level_distribution_geometric():
    levels = sample_levels(20000, connectivity=16, seed=3)
    frac_l1 = (levels >= 1).mean()
    # P(level >= 1) = exp(-ln 16) = 1/16
    assert 0.03 < frac_l1 < 0.10


def test_adjacency_validity(small_graph):
    g = small_graph
    for l, table in enumerate(g.neighbors):
        t = np.asarray(table)
        cap = 2 * g.connectivity if l == 0 else g.connectivity
        assert t.shape == (g.layer_sizes[l], cap)
        valid = t[t >= 0]
        # neighbors must exist on the same layer
        assert (valid < g.layer_sizes[l]).all()
        # no self loops
        rows, _ = np.nonzero(t == np.arange(t.shape[0])[:, None])
        assert rows.size == 0


def test_graph_connected_layer0(small_graph):
    """Every node reachable from the entry point on layer 0 (BFS)."""
    t = np.asarray(small_graph.neighbors[0])
    n = t.shape[0]
    seen = np.zeros(n, bool)
    stack = [0]
    seen[0] = True
    while stack:
        u = stack.pop()
        for v in t[u][t[u] >= 0]:
            if not seen[v]:
                seen[v] = True
                stack.append(int(v))
    assert seen.all(), f"{(~seen).sum()} nodes unreachable on layer 0"


def test_fork_api_accessors(small_graph):
    g = small_graph
    # get_neighbors returns flat [id, key, id, key, ...] (fork parity)
    out = g.get_neighbors(0, 0)
    assert len(out) % 2 == 0 and len(out) > 0
    ids, keys = out[0::2], out[1::2]
    host_keys = np.asarray(g.keys)
    for i, k in zip(ids, keys):
        assert host_keys[i] == k
    # top-level nodes
    top = g.get_top_level_nodes()
    assert len(top) == 2 * g.layer_sizes[g.max_level]
    # key -> id round trip
    some_keys = host_keys[[5, 17, 3]].tolist()
    assert g.get_node_ids_from_keys(some_keys) == [5, 17, 3]
    # invalid access raises (parity with rad/hnsw_server.py:480-487)
    with pytest.raises(ValueError):
        g.get_neighbors(len(g) + 5, 0)
    with pytest.raises(ValueError):
        g.get_neighbors(0, g.max_level + 3)
    # a node that exists globally but not on the top layer raises
    if g.max_level > 0 and g.layer_sizes[g.max_level] < len(g):
        with pytest.raises(ValueError):
            g.get_neighbors(len(g) - 1, g.max_level)


def test_levels_stats(small_graph):
    stats = small_graph.levels_stats()
    assert len(stats) == small_graph.max_level + 1
    assert stats[0].nodes == 200
    assert stats[0].edges > 0
    assert all(s.edges <= s.max_edges for s in stats)


def test_save_load_roundtrip(tmp_path, small_graph):
    path = str(tmp_path / "graph.npz")
    small_graph.save(path)
    loaded = HNSWGraph.load(path, mmap=True)
    assert len(loaded) == len(small_graph)
    assert loaded.connectivity == small_graph.connectivity
    assert loaded.ndim == small_graph.ndim
    np.testing.assert_array_equal(np.asarray(loaded.packed),
                                  np.asarray(small_graph.packed))
    for a, b in zip(loaded.neighbors, small_graph.neighbors):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fp_format_version_stamped_and_checked(tmp_path, small_graph,
                                               caplog):
    """Saves stamp the Morgan fingerprint format version; loading under a
    different current version warns (ADVICE r4: persisted indexes built
    under an older perception must be rebuilt, not silently mismatched)."""
    import json as _json
    import logging as _logging
    from rad_tpu.chem.morgan import FP_FORMAT_VERSION

    path = str(tmp_path / "graph.npz")
    small_graph.save(path)
    with np.load(path) as z:
        meta = _json.loads(bytes(z["meta_json"]).decode())
    assert meta["fp_format_version"] == FP_FORMAT_VERSION

    with caplog.at_level(_logging.WARNING, logger="rad_tpu.graph.storage"):
        HNSWGraph.load(path, mmap=False)
    assert not any("fingerprint format" in r.message for r in caplog.records)

    # rewrite the meta with an older version and expect the load warning
    meta["fp_format_version"] = FP_FORMAT_VERSION - 1
    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files if k != "meta_json"}
    arrays["meta_json"] = np.frombuffer(
        _json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **arrays)
    with caplog.at_level(_logging.WARNING, logger="rad_tpu.graph.storage"):
        HNSWGraph.load(path, mmap=False)
    assert any("fingerprint format" in r.message for r in caplog.records)


@pytest.mark.slow
def test_search_recall_vs_bruteforce():
    """Graph search must recover most true neighbors (recall oracle,
    BASELINE metric #1)."""
    fps = random_fingerprints(500, n_bits=256, density=0.2, seed=11)
    g = build_hnsw(fps, connectivity=12, expansion_add=80, seed=1)
    queries = random_fingerprints(20, n_bits=256, density=0.2, seed=99)
    d, ids = search_hnsw(g, queries, k=10, expansion_search=120)
    # brute force over the *level-sorted* packed matrix
    full = np.asarray(
        tanimoto_matrix(jnp.asarray(queries), jnp.asarray(np.asarray(g.packed)))
    )
    true_ids = np.argsort(full, axis=1, kind="stable")[:, :10]
    recall = np.mean([
        len(set(ids[i].tolist()) & set(true_ids[i].tolist())) / 10
        for i in range(20)
    ])
    assert recall >= 0.85, f"recall@10 = {recall}"


def test_search_self_query_finds_self(small_graph):
    g = small_graph
    q = np.asarray(g.packed)[[3, 50, 150]]
    d, ids = search_hnsw(g, q, k=1, expansion_search=40)
    assert (d[:, 0] == 0).all()


def test_device_put_pytree(small_graph):
    import jax
    g = small_graph.device_put()
    # every leaf EXCEPT keys moves to device; keys stay host-side on
    # purpose (nothing device-side reads them, and jnp.asarray would
    # truncate int64 user keys to int32 with x64 off)
    leaves, _ = jax.tree_util.tree_flatten(g)
    device_leaves = [l for l in leaves if l is not g.keys]
    assert all(isinstance(l, jax.Array) for l in device_leaves)
    assert np.asarray(g.keys).dtype == np.int64
    g2 = jax.tree_util.tree_map(lambda x: x, g)
    assert isinstance(g2, HNSWGraph)
    assert g2.connectivity == g.connectivity


def test_load_view_is_memory_mapped(tmp_path, small_graph):
    """view-load parity with usearch Index(path=, view=True): arrays are
    np.memmap views into the .npz, not eager copies."""
    p = str(tmp_path / "g.npz")
    small_graph.save(p)
    from rad_tpu.graph.storage import HNSWGraph
    g = HNSWGraph.load(p, mmap=True)
    assert isinstance(np.asarray(g.packed).base, np.memmap) or \
        isinstance(g.packed, np.memmap), type(g.packed)
    np.testing.assert_array_equal(np.asarray(g.packed),
                                  np.asarray(small_graph.packed))
    np.testing.assert_array_equal(np.asarray(g.neighbors[0]),
                                  np.asarray(small_graph.neighbors[0]))
    # eager load agrees
    g2 = HNSWGraph.load(p, mmap=False)
    np.testing.assert_array_equal(np.asarray(g2.packed),
                                  np.asarray(g.packed))


def test_exclude_vectors_serving_file(tmp_path, small_graph):
    """exclude_vectors=True parity with the reference's serving deployment
    (Index(path=, view=True, exclude_vectors=True),
    reference scripts/start_hnsw_server.py:69): the file omits the
    fingerprint matrix; a graph loaded from it answers every graph query
    but reports has_vectors=False."""
    import os

    full = str(tmp_path / "full.npz")
    lean = str(tmp_path / "lean.npz")
    small_graph.save(full)
    small_graph.save(lean, exclude_vectors=True)
    assert os.path.getsize(lean) < os.path.getsize(full)

    g = type(small_graph).load(lean, mmap=True)
    assert not g.has_vectors
    assert small_graph.has_vectors
    assert len(g) == len(small_graph)
    assert g.max_level == small_graph.max_level
    # fork accessors still work (adjacency is intact)
    ref = small_graph.get_neighbors(0, 0)
    assert g.get_neighbors(0, 0) == ref
    assert g.get_top_level_nodes() == small_graph.get_top_level_nodes()
    np.testing.assert_array_equal(np.asarray(g.keys),
                                  np.asarray(small_graph.keys))


def test_npz_stream_writer_parity(tmp_path, small_graph):
    """NpzStreamWriter produces archives HNSWGraph.load(mmap=True) maps in
    place, identical to a save() file — the 1B-node serving-file path
    (reference's 2B mmap deployment, index.html:568-580) writes its ~70 GiB
    of adjacency through this in chunks."""
    from rad_tpu.graph.storage import NpzStreamWriter

    p = str(tmp_path / "streamed.npz")
    w = NpzStreamWriter(p)
    w.write_array("keys", np.asarray(small_graph.keys))
    w.write_array("levels", np.asarray(small_graph.levels))
    for l, t in enumerate(small_graph.neighbors):
        t = np.asarray(t)
        with w.member(f"neighbors_{l}", t.shape, t.dtype) as mb:
            step = max(1, t.shape[0] // 3)
            for i in range(0, t.shape[0], step):
                mb.write(t[i:i + step])
    w.close({"ndim": small_graph.ndim,
             "connectivity": small_graph.connectivity,
             "n_layers": len(small_graph.neighbors),
             "exclude_vectors": True, "version": 1})

    g = HNSWGraph.load(p, mmap=True)
    assert isinstance(g.levels, np.memmap), type(g.levels)
    assert not g.has_vectors
    np.testing.assert_array_equal(np.asarray(g.keys),
                                  np.asarray(small_graph.keys))
    np.testing.assert_array_equal(np.asarray(g.levels),
                                  np.asarray(small_graph.levels))
    for a, b in zip(g.neighbors, small_graph.neighbors):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert g.get_neighbors(0, 0) == small_graph.get_neighbors(0, 0)


def test_npz_stream_writer_shape_guards(tmp_path):
    from rad_tpu.graph.storage import NpzStreamWriter

    p = str(tmp_path / "bad.npz")
    w = NpzStreamWriter(p)
    with pytest.raises(ValueError, match="does not extend"):
        with w.member("a", (4, 3), np.int32) as mb:
            mb.write(np.zeros((2, 5), np.int32))
    with pytest.raises(ValueError, match="declared"):
        with w.member("b", (4, 3), np.int32) as mb:
            mb.write(np.zeros((2, 3), np.int32))


def test_synth_graph_file_streamed(tmp_path):
    """bench_serving's chunked synthesizer writes a valid level-sorted,
    self-edge-free serving file (anti-rot for the 1B bench path)."""
    import sys
    sys.path.insert(0, "/root/repo")
    from benchmarks.bench_serving import synth_graph_file

    p = str(tmp_path / "synth.npz")
    info = synth_graph_file(5000, 8, p, chunk_rows=700)
    g = HNSWGraph.load(p, mmap=True)
    assert len(g) == 5000
    assert g.max_level == info["max_level"]
    assert list(g.layer_sizes) == info["layer_sizes"]
    lv = np.asarray(g.levels)
    assert (np.diff(lv) <= 0).all()          # level-sorted descending
    for l, t in enumerate(g.neighbors):
        t = np.asarray(t)
        n_l = t.shape[0]
        assert t.shape[1] == (16 if l == 0 else 8)
        assert (t >= -1).all() and (t < n_l).all()
        ids = np.arange(n_l, dtype=np.int32)[:, None]
        assert not (t == ids).any()          # no self edges
    assert g.get_neighbors(0, 0)             # fork accessor works


def test_virtual_arrays():
    """ArangeKeys / DerivedLevels: the lazy stand-ins for the keys/levels
    members a v2 serving file omits (24 GB at the reference's 2B scale)."""
    from rad_tpu.graph.storage import ArangeKeys, DerivedLevels

    k = ArangeKeys(100)
    assert k.shape == (100,) and k.dtype == np.int64 and len(k) == 100
    assert int(k[7]) == 7 and int(k[-1]) == 99
    np.testing.assert_array_equal(k[10:20], np.arange(10, 20))
    np.testing.assert_array_equal(k[np.asarray([5, 0, 99])], [5, 0, 99])
    np.testing.assert_array_equal(np.asarray(k), np.arange(100))
    with pytest.raises(IndexError):
        k[100]

    sizes = (100, 37, 9, 1)
    lv = DerivedLevels(sizes)
    assert lv.shape == (100,) and lv.dtype == np.int32
    expect = np.array([sum(i < s for s in sizes) - 1 for i in range(100)],
                      np.int32)
    np.testing.assert_array_equal(np.asarray(lv), expect)
    assert int(lv[0]) == 3 and int(lv[99]) == 0


def test_slim_serving_format(tmp_path):
    """The v2 serving file (identity keys, derived levels, meta edge
    counts) reproduces the v1 file's whole fork-API surface while being
    strictly smaller."""
    import sys
    sys.path.insert(0, "/root/repo")
    from benchmarks.bench_serving import synth_graph_file
    from rad_tpu.graph.storage import ArangeKeys, DerivedLevels

    p1 = str(tmp_path / "v1.npz")
    p2 = str(tmp_path / "v2.npz")
    synth_graph_file(5000, 8, p1, chunk_rows=700)
    synth_graph_file(5000, 8, p2, chunk_rows=700, slim=True)
    import os
    assert os.path.getsize(p2) < os.path.getsize(p1) - 5000 * 10

    g1 = HNSWGraph.load(p1, mmap=True)
    g2 = HNSWGraph.load(p2, mmap=True)
    assert isinstance(g2.keys, ArangeKeys)
    assert isinstance(g2.levels, DerivedLevels)
    assert len(g2) == len(g1) == 5000
    np.testing.assert_array_equal(np.asarray(g2.keys), np.asarray(g1.keys))
    np.testing.assert_array_equal(np.asarray(g2.levels),
                                  np.asarray(g1.levels))
    assert g2.get_top_level_nodes() == g1.get_top_level_nodes()
    rng = np.random.default_rng(0)
    for nid in rng.integers(0, 5000, size=20):
        assert g2.get_neighbors(int(nid), 0) == g1.get_neighbors(int(nid), 0)
    assert g2.get_node_ids_from_keys([0, 17, 4999]) == [0, 17, 4999]
    with pytest.raises(KeyError):
        g2.get_node_ids_from_keys([5000])
    # levels_stats: g2 comes from meta edge counts, g1 from a table scan
    s1 = [vars(s) for s in g1.levels_stats()]
    s2 = [vars(s) for s in g2.levels_stats()]
    assert s1 == s2
    # and the cache makes the second call free (same object)
    assert g1.levels_stats() is g1.levels_stats()


def test_save_slim(tmp_path, small_graph):
    """HNSWGraph.save(slim=True) is the library-level v2 writer: it must
    round-trip through load to virtual keys/levels + cached stats, and
    refuse graphs whose keys are not the identity (level-sorting permutes
    user keys, so slim is only valid for id-keyed serving graphs)."""
    import dataclasses

    from rad_tpu.graph.storage import ArangeKeys, DerivedLevels

    # built graphs carry permuted user keys -> slim must refuse
    with pytest.raises(ValueError, match="identity keys"):
        small_graph.save(str(tmp_path / "x.npz"), exclude_vectors=True,
                         slim=True)
    with pytest.raises(ValueError, match="exclude_vectors"):
        small_graph.save(str(tmp_path / "x.npz"), slim=True)

    ided = dataclasses.replace(
        small_graph, keys=np.arange(len(small_graph), dtype=np.int64))
    p = str(tmp_path / "slim.npz")
    ided.save(p, exclude_vectors=True, slim=True)
    g = HNSWGraph.load(p, mmap=True)
    assert isinstance(g.keys, ArangeKeys)
    assert isinstance(g.levels, DerivedLevels)
    np.testing.assert_array_equal(np.asarray(g.levels),
                                  np.asarray(small_graph.levels))
    for a, b in zip(g.neighbors, small_graph.neighbors):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # meta edge counts == a fresh scan's
    assert [vars(s) for s in g.levels_stats()] == \
        [vars(s) for s in small_graph.levels_stats()]
    assert g.get_node_ids_from_keys([0, 5]) == [0, 5]


def test_slim_file_http_server(tmp_path):
    """The HTTP server serves a v2 (virtual keys/levels) file end-to-end —
    the 2B-deployment request path, with nothing materialized."""
    import http.client
    import json as _json
    import sys
    import threading

    sys.path.insert(0, "/root/repo")
    from benchmarks.bench_serving import synth_graph_file
    from rad_tpu.server.http_server import create_hnsw_server

    p = str(tmp_path / "slim.npz")
    synth_graph_file(3000, 8, p, chunk_rows=700, slim=True)
    g = HNSWGraph.load(p, mmap=True)
    srv, _app = create_hnsw_server(g, host="127.0.0.1", port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("GET", "/neighbors/5/0")
        r = _json.loads(conn.getresponse().read())
        assert r["node_id"] == 5 and r["neighbor_count"] > 0
        # identity keys: the key slots in [id, smiles_or_key...] pairs
        assert g.get_neighbors(5, 0)[::2] == [
            n for i, n in enumerate(r["neighbors"][::2])]
        conn.request("GET", "/top-level-nodes")
        top = _json.loads(conn.getresponse().read())
        assert top["node_count"] == g.layer_sizes[g.max_level]
        conn.request("GET", "/info")
        info = _json.loads(conn.getresponse().read())
        assert info["hnsw"]["size"] == 3000
        assert [s["nodes"] for s in info["levels_stats"]] == \
            list(g.layer_sizes)
        conn.close()
    finally:
        srv.shutdown()


def test_uint32_adjacency():
    """uint32 adjacency tables (ids past 2**31 — the >2.1B serving regime):
    fork accessors mask 0xFFFFFFFF sentinels, levels_stats counts edges
    correctly, and the device-traversal path refuses them loudly."""
    from rad_tpu.graph.storage import (ADJ_SENTINEL_U32, ArangeKeys,
                                       DerivedLevels, neighbor_valid_mask)
    from rad_tpu.traverse.device import prepare_device_graph

    fps = random_fingerprints(50, n_bits=64, density=0.3, seed=1)
    g = build_hnsw(fps, connectivity=4, expansion_add=16, seed=0)
    neighbors_u = tuple(
        np.where(np.asarray(t) >= 0, np.asarray(t).astype(np.uint32),
                 ADJ_SENTINEL_U32)
        for t in g.neighbors)
    gu = HNSWGraph(packed=g.packed, popcounts=g.popcounts,
                   keys=g.keys,
                   levels=DerivedLevels(g.layer_sizes),
                   neighbors=neighbors_u, ndim=g.ndim,
                   connectivity=g.connectivity)
    for t, tu in zip(g.neighbors, neighbors_u):
        np.testing.assert_array_equal(neighbor_valid_mask(tu),
                                      np.asarray(t) >= 0)
    for nid in (0, 1, 17, 49):
        assert gu.get_neighbors(nid, 0) == g.get_neighbors(nid, 0)
    assert [vars(s) for s in gu.levels_stats()] == \
        [vars(s) for s in g.levels_stats()]
    with pytest.raises(ValueError, match="uint32"):
        prepare_device_graph(gu)
