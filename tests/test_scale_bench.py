"""Anti-rot execution tests for the scale benchmark (CPU, tiny shapes).

bench_scale generates its graph ON DEVICE (nothing host-side to reuse), so
these tests pin the generator's invariants and run all three scorer modes
end-to-end at toy sizes — the same guard the examples have.
"""

import json
import sys

import numpy as np
import pytest


sys.path.insert(0, "benchmarks")


def test_layer_sizes_shape():
    from bench_scale import hnsw_layer_sizes

    sizes = hnsw_layer_sizes(100_000, 8)
    assert sizes[0] == 100_000
    assert all(a > b for a, b in zip(sizes, sizes[1:]))
    assert sizes[-1] >= 1
    # expected geometric decay
    assert sizes[1] == pytest.approx(12_500, rel=0.01)


def test_device_graph_generator_invariants():
    from bench_scale import make_device_graph

    dg, sizes = make_device_graph(20_000, 8, seed=3, n_chunks=4)
    adj = np.asarray(dg.adj)
    offsets = np.asarray(dg.offsets)
    assert dg.n_rows == sum(sizes)
    assert adj.shape[1] == 16
    # per-level: ids in range, no self loops, padding beyond caps
    for l, nl in enumerate(sizes):
        rows = adj[offsets[l]:offsets[l] + nl]
        cap = 16 if l == 0 else 8
        valid = rows[:, :cap]
        ok = valid >= 0
        assert (valid[ok] < nl).all()
        self_hits = valid == np.arange(nl)[:, None]
        assert not self_hits.any()
        assert (rows[:, cap:] == -1).all()


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["hash", "id", "fps"])
def test_bench_scale_runs(mode, capsys):
    from bench_scale import main

    rc = main(["--n", "30000", "--budget", "5000", "--frontier", "262144",
               "--mode", mode, "--n-bits", "128", "--runs", "1"])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["metric"] == "scale_traversal_nodes_per_sec"
    assert out["value"] > 0


@pytest.mark.slow
def test_bench_scale_packed_adj_runs(capsys):
    """--packed-adj: grouped bit-field generation + id-mode run (the
    past-180M config) at toy size, including --no-score-table."""
    from bench_scale import main

    rc = main(["--n", "30000", "--budget", "5000", "--frontier", "262144",
               "--mode", "id", "--no-score-table", "--packed-adj",
               "--runs", "1"])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["metric"] == "scale_traversal_nodes_per_sec"
    assert out["packed_adj_bits"] == 15
    assert out["value"] > 0


def test_bench_scale_packed_generator_matches_unpacked():
    """Packed on-device generation decodes to exactly the int32 table."""
    from bench_scale import make_device_graph
    from rad_tpu.graph.adjpack import unpack_adjacency_rows

    dg_u, sizes = make_device_graph(20_000, 8, seed=3, n_chunks=4)
    dg_p, _ = make_device_graph(20_000, 8, seed=3, n_chunks=4,
                                packed_bits=15)
    g, w = dg_p.adj_group, np.asarray(dg_p.adj).shape[1] // dg_p.adj_group
    sup = np.asarray(dg_p.adj).reshape(-1, w)       # [R_pad, W]
    dec = np.asarray(unpack_adjacency_rows(sup, dg_p.m0, 15))
    r = dg_u.n_rows
    np.testing.assert_array_equal(dec[:r], np.asarray(dg_u.adj)[:r])


def test_bench_scale_mem_analysis(capsys):
    """--mem-analysis AOT-compiles with abstract inputs (no HBM) and
    reports a peak consistent with the argument sizes."""
    from bench_scale import main

    rc = main(["--n", "30000", "--budget", "5000", "--frontier", "262144",
               "--mode", "id", "--no-score-table", "--packed-adj",
               "--mem-analysis"])
    assert rc == 0
    line = capsys.readouterr().out.strip()
    out = json.loads(line[line.index("{"):])
    assert out["metric"] == "scale_mem_analysis"
    assert out["peak_gib"] > 0
    assert out["argument_gib"] <= out["peak_gib"]
