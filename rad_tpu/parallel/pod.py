"""PodTraverser: the RADTraverser lifecycle over a graph-sharded mesh.

User-facing driver for BASELINE config 5 (billion-scale graph sharded over
a pod): same prime/traverse/get_best_molecules surface as the single-chip
engine, with fingerprints + adjacency row-sharded across the mesh and the
traversal state replicated. Scoring runs on-device (similarity-to-target or
any jittable surrogate); for host scoring functions combine the sharded
*graph* with the host driver via per-step expansion instead.
"""

from __future__ import annotations

import time
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from rad_tpu.graph.storage import HNSWGraph
from rad_tpu.parallel.mesh import make_mesh
from rad_tpu.parallel.sharded import ShardedGraph, make_sharded_step, \
    shard_graph
from rad_tpu.traverse import device as dev

__all__ = ["PodTraverser"]


def dataclasses_replace_padded(sg: ShardedGraph):
    """DeviceGraph view with padded sizes (sentinels outside every shard)."""
    from rad_tpu.traverse.device import DeviceGraph

    return DeviceGraph(adj=sg.adj, offsets=sg.offsets,
                       n_nodes=sg.n_pad_nodes, n_rows=sg.n_pad_rows,
                       m0=sg.m0, max_level=sg.max_level)


class PodTraverser:
    """Best-first traversal with the graph sharded over a device mesh.

    ``target_packed``: the on-device scorer's target fingerprint (default
    scorer = Tanimoto distance to it; lower = better). Pass any jittable
    ``scorer(fp_rows, pop_rows, target_packed, target_pop) -> scores`` (an
    ML surrogate, a pharmacophore model) to replace it.
    """

    def __init__(
        self,
        graph: HNSWGraph,
        target_packed: np.ndarray,
        mesh=None,
        n_devices: int | None = None,
        batch_size: int = 64,
        frontier_capacity: int = 1 << 16,
        log_capacity: int | None = None,
        buffer_capacity: int = 1 << 15,
        scorer=None,
        shard_state: bool = False,
    ) -> None:
        self.graph = graph
        self.mesh = mesh if mesh is not None else make_mesh(
            n_devices, axis_names=("graph",))
        self.sg: ShardedGraph = shard_graph(graph, self.mesh)
        self.batch_size = batch_size
        if shard_state:
            # billion-scale layout: scored/scores/enqueued row-sharded too
            from rad_tpu.parallel.sharded import (init_state_sharded,
                                                  make_sharded_step_full)
            self.dg = dataclasses_replace_padded(self.sg)
            self._step = make_sharded_step_full(self.sg, self.mesh,
                                                batch_size, scorer=scorer)
            self.state = init_state_sharded(
                self.sg, self.mesh, frontier_capacity,
                log_capacity if log_capacity is not None else len(graph),
                buffer_capacity)
        else:
            self.dg = self.sg.device_graph()
            self._step = make_sharded_step(self.sg, self.mesh, batch_size,
                                           scorer=scorer)
            self.state = dev.init_state(self.dg, frontier_capacity,
                                        log_capacity, buffer_capacity)
        t = jnp.asarray(np.asarray(target_packed, np.uint32))
        from rad_tpu.fp.pack import popcount_rows
        self._target = t
        self._target_pop = popcount_rows(t[None, :])[0]
        self._primed = False
        self.stats = {"steps": 0}

    def prime(self) -> int:
        from rad_tpu.fp.tanimoto import tanimoto_matrix
        n_top = self.graph.layer_sizes[self.graph.max_level]
        ids = jnp.arange(n_top, dtype=jnp.int32)
        packed_top = jnp.asarray(np.asarray(self.graph.packed)[:n_top])
        seed_scores = tanimoto_matrix(self._target[None, :], packed_top)[0]
        self.state = dev.prime(self.state, self.dg, ids, seed_scores)
        self._primed = True
        return n_top

    def traverse(self, n_to_score: Optional[int] = None,
                 timeout: Optional[float] = None) -> dict:
        if not self._primed:
            raise RuntimeError("prime() must be called before traverse()")
        if n_to_score is None and timeout is None:
            raise ValueError("provide n_to_score and/or timeout")
        start = time.monotonic()
        reason = None
        while True:
            if timeout is not None and time.monotonic() - start > timeout:
                reason = "timeout"
                break
            scored = int(self.state.n_scored)
            if n_to_score is not None and scored >= n_to_score:
                reason = "n_to_score"
                break
            if dev.frontier_empty(self.state):
                reason = "queue_empty"
                break
            self.state = self._step(self.state, self._target,
                                    self._target_pop)
            self.stats["steps"] += 1
        self.stats.update(termination_reason=reason,
                          runtime_seconds=time.monotonic() - start,
                          n_scored=int(self.state.n_scored))
        return dict(self.stats)

    @property
    def n_scored(self) -> int:
        return int(self.state.n_scored)

    def get_molecules(self, n: int | None = None) -> List[Tuple[int, float]]:
        ids = dev.read_order_log(self.state)
        if n is not None:
            ids = ids[:n]
        scores = np.asarray(self.state.scores)[ids]
        return [(int(i), float(s)) for i, s in zip(ids, scores)]

    def get_best_molecules(self, n: int | None = None):
        mols = self.get_molecules()
        mols.sort(key=lambda x: x[1])
        return mols[:n] if n is not None else mols
