"""Multi-host (DCN) path: 2 CPU processes × 2 virtual devices.

Exercises initialize_multihost + global_mesh + the graph-sharded kernels
over a mesh that spans processes — the CPU analogue of a multi-slice pod
(the reference tests multi-node behavior on localhost the same way,
SURVEY.md §4). Each process holds the full host library; shard_graph's
make_array_from_callback path contributes only the shards the process
owns, and the sharded brute-force top-k's collectives ride the
inter-process channel (DCN stand-in).

Documented skip: if jax.distributed cannot bind/rendezvous in this
container (sandboxed network), the test SKIPS with the reason rather than
failing — the code path is then validated only on real pods.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1]); port = sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from rad_tpu.parallel.multihost import initialize_multihost, global_mesh
    initialize_multihost(f"127.0.0.1:{port}", num_processes=2,
                         process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    mesh = global_mesh()
    assert mesh.devices.size == 4

    import numpy as np
    from rad_tpu.build.reference import build_hnsw
    from rad_tpu.fp import random_fingerprints
    from rad_tpu.parallel.sharded import shard_graph, sharded_bruteforce_topk

    # identical library in every process (deterministic seed)
    fps = random_fingerprints(256, n_bits=128, density=0.25, seed=13)
    graph = build_hnsw(fps, connectivity=4, expansion_add=16, seed=0)
    sg = shard_graph(graph, mesh)
    # query with graph rows (ids are level-sorted, so fps[i] != node i)
    queries = np.asarray(graph.packed)[:8]
    d, ids = sharded_bruteforce_topk(sg, queries, k=3, mesh=mesh)
    d = np.asarray(d); ids = np.asarray(ids)
    # self-queries: global top-1 must be the query itself at distance 0
    assert (d[:, 0] == 0).all(), d[:, 0]
    assert ids[:, 0].tolist() == list(range(8)), ids[:, 0]
    # ground truth across the WHOLE library (host side)
    from rad_tpu.fp.tanimoto import tanimoto_matrix
    import jax.numpy as jnp
    full = np.asarray(tanimoto_matrix(jnp.asarray(queries),
                                      jnp.asarray(np.asarray(graph.packed))))
    true_ids = np.argsort(full, axis=1, kind="stable")[:, :3]
    np.testing.assert_allclose(
        d, np.take_along_axis(full, true_ids, 1), atol=1e-6)

    # sharded TRAVERSAL STEP across the 2-process mesh: the pod engine's
    # fused step (replicated state, graph sharded over DCN+local devices)
    # must match the single-device engine's scored set bit-for-bit
    from rad_tpu.traverse import device as dev
    from rad_tpu.parallel.sharded import make_sharded_step
    from rad_tpu.fp.pack import popcount_rows
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec

    dgl = dev.prepare_device_graph(graph)
    packed_l = jnp.asarray(np.asarray(graph.packed))
    pops_l = jnp.asarray(np.asarray(graph.popcounts))
    target = jnp.asarray(np.asarray(graph.packed)[7])
    t_pop = popcount_rows(target[None, :])[0]
    n_top = graph.layer_sizes[graph.max_level]
    ids = jnp.arange(n_top, dtype=jnp.int32)
    seed = tanimoto_matrix(target[None, :], packed_l[:n_top])[0]
    st = dev.prime(dev.init_state(dgl, frontier_capacity=1 << 10,
                                  head_capacity=None), dgl, ids, seed)
    import dataclasses as dc
    st_np = jax.tree_util.tree_map(np.asarray, st)  # snapshot pre-donation

    st_o = st
    for _ in range(2):
        st_o = dev.fused_step(st_o, dgl, packed_l, pops_l, target, t_pop, 8)
    oracle_scored = np.asarray(st_o.scored)
    oracle_n = int(st_o.n_scored)

    def to_global(x):
        return multihost_utils.host_local_array_to_global_array(
            np.asarray(x), mesh, PartitionSpec())
    gstate = jax.tree_util.tree_map(to_global, st_np)
    step = make_sharded_step(sg, mesh, batch=8)
    gt = to_global(np.asarray(target))
    gtp = to_global(np.asarray(t_pop))
    for _ in range(2):
        gstate = step(gstate, gt, gtp)
    sharded_scored = np.asarray(jax.device_get(
        multihost_utils.process_allgather(gstate.scored, tiled=True)))
    np.testing.assert_array_equal(sharded_scored, oracle_scored)
    n_sh = int(np.asarray(jax.device_get(
        multihost_utils.process_allgather(gstate.n_scored, tiled=True))))
    assert n_sh == oracle_n, (n_sh, oracle_n)
    print(f"proc {pid}: multihost ok (step parity {oracle_n} scored)",
          flush=True)
""")


@pytest.mark.slow
@pytest.mark.slow
def test_two_process_global_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = tmp_path / "child.py"
    script.write_text(CHILD)
    env = dict(os.environ, PYTHONPATH=ROOT, JAX_PLATFORMS="",
               XLA_FLAGS="")
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("jax.distributed rendezvous timed out in this "
                    "container (sandboxed network) — DCN path validated "
                    "on real pods only")
    for p, out in zip(procs, outs):
        if p.returncode != 0:
            low = out.lower()
            if ("unavailable" in low or "deadline" in low
                    or "permission" in low or "failed to connect" in low):
                pytest.skip(f"jax.distributed unavailable here: "
                            f"{out.splitlines()[-1] if out else '?'}")
            raise AssertionError(out)
        assert "multihost ok" in out
