#!/usr/bin/env python
"""Distributed scoring workers over HTTP (multi-machine deployment).

The reference's recipe for scaling the expensive scoring step is "run
workers on any machine that can reach the shared Redis"
(reference README.md:120-129). rad-tpu replaces the Redis transport with
the coordination endpoints of its HTTP server; this example runs the whole
topology on localhost:

  head node:   index + coordination service + HTTP server
  worker node: RemoteCoordinationClient + ScoringWorker (per machine)

Run:  python examples/distributed_workers_example.py
"""

from __future__ import annotations

import threading
import time

import numpy as np


def main() -> int:
    from rad_tpu.build.reference import build_hnsw
    from rad_tpu.fp import random_fingerprints
    from rad_tpu.server.http_server import create_hnsw_server
    from rad_tpu.service.local import LocalHNSWService
    from rad_tpu.service.remote import RemoteCoordinationClient
    from rad_tpu.store.smiles_store import InMemorySmilesStore
    from rad_tpu.traverse.coordinator import CoordinationService
    from rad_tpu.traverse.workers import ScoringWorker

    # ---------------- head node: build + serve ----------------------------
    n = 600
    fps = random_fingerprints(n, n_bits=256, density=0.15, seed=0)
    graph = build_hnsw(fps, connectivity=8, expansion_add=48, seed=0)
    keys = np.asarray(graph.keys)
    store = InMemorySmilesStore({int(k): f"MOL_{int(k)}" for k in keys})
    service = LocalHNSWService(graph, store)
    coord = CoordinationService(service, heartbeat_interval=1.0,
                                worker_timeout=10.0)

    rng = np.random.default_rng(1)
    table = {f"MOL_{int(k)}": float(s)
             for k, s in zip(keys, rng.permutation(n).astype(float))}

    def scoring_fn(smiles: str) -> float:  # stand-in for docking
        time.sleep(0.001)
        return table[smiles]

    # prime on the head node
    top = service.get_top_level_nodes()
    lvl = max(0, graph.max_level - 1)
    for nid, smi in zip(top[0::2], top[1::2]):
        s = scoring_fn(smi)
        coord.scored_set.insert(nid, s, smi)
        if not coord.visited_set.checkAndInsert(nid, lvl):
            coord.priority_queue.insert(nid, lvl, s)
    coord.start()

    server, _ = create_hnsw_server(graph, host="127.0.0.1", port=0,
                                   smiles_store=store, coordination=coord)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    print(f"head node serving at {url}")

    # ---------------- 'other machines': workers over HTTP -----------------
    workers = []
    for i in range(3):
        client = RemoteCoordinationClient(url, max_retries=1)
        w = ScoringWorker(client, scoring_fn, poll_interval=0.01,
                          worker_id=f"machine-{i}")
        w.start()
        workers.append((w, client))
    print("3 remote workers attached")

    # ---------------- monitor until done ----------------------------------
    n_to_score = 300
    t0 = time.time()
    while time.time() - t0 < 60:
        done, reason = coord.check_termination(n_to_score=n_to_score)
        if done:
            break
        time.sleep(0.1)
    for w, client in workers:
        w.stop()
        client.shutdown()

    mols = coord.scored_set.get_molecules()
    stats = coord.get_coordination_stats()
    print(f"scored {len(mols)} molecules in {stats['runtime_seconds']:.1f}s "
          f"({reason}); best: {coord.scored_set.get_best_molecules(3)}")
    ids = [m[0] for m in mols]
    assert len(ids) == len(set(ids)), "duplicate scoring!"

    coord.shutdown()
    server.shutdown()
    service.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
