"""PodTraverser: the RADTraverser lifecycle over a graph-sharded mesh.

User-facing driver for BASELINE config 5 (billion-scale graph sharded over
a pod): same prime/traverse/get_best_molecules surface as the single-chip
engine, with fingerprints + adjacency row-sharded across the mesh and the
traversal state replicated (or row-sharded too, ``shard_state=True``).

Two scoring modes:

* **on-device** (``target_packed`` / jittable ``scorer``): the whole step
  fuses into one sharded program — similarity-to-target or an ML surrogate
  (the Chemprop-style capability, reference README.md:206).
* **host** (``scoring_fn``): the real RAD use case — an external docking
  program scoring SMILES on the host (reference
  rad/distributed_worker.py:296-308) while the *graph lives across the
  pod*. The step splits at the scoring boundary
  (rad_tpu.parallel.sharded.make_sharded_expand_integrate); the pipelined
  loop overlaps host scoring of batch k with sharded expansion of batch
  k+1 (the reference's prefetch-proxy overlap,
  rad/coordination_service.py:314-347). The scored set is bit-identical to
  the single-device host driver at pipeline_depth=1.
"""

from __future__ import annotations

import time
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rad_tpu.graph.storage import HNSWGraph
from rad_tpu.parallel.mesh import make_mesh
from rad_tpu.parallel.sharded import (ShardedGraph, init_state_sharded,
                                      make_sharded_expand_integrate,
                                      make_sharded_step,
                                      make_sharded_step_full, shard_graph)
from rad_tpu.traverse import device as dev
from rad_tpu.traverse.pipeline import HostScoringBridge, pipelined_traverse

__all__ = ["PodTraverser"]


def _padded_device_graph(sg: ShardedGraph):
    """DeviceGraph view with padded sizes (sentinels outside every shard)."""
    from rad_tpu.traverse.device import DeviceGraph

    return DeviceGraph(adj=sg.adj, offsets=sg.offsets,
                       n_nodes=sg.n_pad_nodes, n_rows=sg.n_pad_rows,
                       m0=sg.m0, max_level=sg.max_level,
                       adj_bits=sg.adj_bits, adj_group=sg.adj_group)


# back-compat alias (pre-round-2 name)
dataclasses_replace_padded = _padded_device_graph


class PodTraverser:
    """Best-first traversal with the graph sharded over a device mesh.

    Exactly one of:
      ``target_packed`` — on-device scorer target (default scorer =
      Tanimoto distance to it; lower = better; override with any jittable
      ``scorer(fp_rows, pop_rows, target_packed, target_pop) -> scores``);
      ``scoring_fn`` — host SMILES → float function (docking program);
      combine with ``smiles_store`` for key→SMILES lookup and
      ``pipeline_depth`` in :meth:`traverse` to hide host latency.
    """

    def __init__(
        self,
        graph: HNSWGraph,
        target_packed: np.ndarray | None = None,
        mesh=None,
        n_devices: int | None = None,
        batch_size: int = 64,
        frontier_capacity: int | None = None,
        log_capacity: int | None = None,
        buffer_capacity: int = 1 << 15,
        head_capacity: int | None | str = "auto",
        scorer=None,
        shard_state: bool = False,
        scoring_fn: Optional[Callable[[str], float]] = None,
        smiles_store=None,
        n_score_threads: int = 8,
        failed_score: float = float("inf"),
        order_log_spill: bool | str = False,
        packed_adjacency: bool | int = False,
    ) -> None:
        if (target_packed is None) == (scoring_fn is None):
            raise ValueError(
                "provide exactly one of target_packed (on-device scoring; "
                "optionally with a custom jittable `scorer`) or scoring_fn "
                "(host scoring)")
        self.graph = graph
        self.mesh = mesh if mesh is not None else make_mesh(
            n_devices, axis_names=("graph",))
        self.sg: ShardedGraph = shard_graph(
            graph, self.mesh, packed_adjacency=packed_adjacency)
        self.batch_size = batch_size
        self.shard_state = shard_state
        self.stats = {"steps": 0}
        self._host_mode = scoring_fn is not None
        self._bridge = None
        # host-spilled order log (docs/SCALING.md beyond-HBM regime): the
        # replicated device ring stays O(log_capacity); the full insertion
        # order accumulates host-side (RAM or file)
        self._spill = None
        if order_log_spill:
            from rad_tpu.traverse.spill import SpilledOrderLog
            self._spill = SpilledOrderLog(
                order_log_spill if isinstance(order_log_spill, str)
                else None)

        if shard_state:
            # billion-scale layout: scored/scores/enqueued row-sharded too
            self.dg = _padded_device_graph(self.sg)
            self.state = init_state_sharded(
                self.sg, self.mesh, frontier_capacity,
                log_capacity if log_capacity is not None else len(graph),
                buffer_capacity)
        else:
            self.dg = self.sg.device_graph()
            self.state = dev.init_state(self.dg, frontier_capacity,
                                        log_capacity, buffer_capacity,
                                        head_capacity)

        if self._host_mode:
            self._bridge = HostScoringBridge(
                graph.keys, scoring_fn,
                smiles_store=smiles_store,
                n_score_threads=n_score_threads,
                failed_score=failed_score, stats=self.stats)
            self._expand, self._integrate = make_sharded_expand_integrate(
                self.sg, self.mesh, batch_size, shard_state=shard_state)
            self._target = None
            self._target_pop = None
        else:
            step_factory = (make_sharded_step_full if shard_state
                            else make_sharded_step)
            self._step = step_factory(self.sg, self.mesh, batch_size,
                                      scorer=scorer)
            t = jnp.asarray(np.asarray(target_packed, np.uint32))
            from rad_tpu.fp.pack import popcount_rows
            self._target = t
            self._target_pop = popcount_rows(t[None, :])[0]
        self._primed = False

    def prime(self) -> int:
        """Score every top-layer node and seed the frontier (reference
        rad/traverser.py:128-176)."""
        n_top = self.graph.layer_sizes[self.graph.max_level]
        ids = jnp.arange(n_top, dtype=jnp.int32)
        if self._host_mode:
            smiles = self._bridge.smiles_for_ids(np.arange(n_top))
            seed_scores = jnp.asarray(self._bridge.score_smiles(smiles))
        else:
            from rad_tpu.fp.tanimoto import tanimoto_matrix
            # slice BEFORE materializing: np.asarray(packed) would pull the
            # whole fingerprint matrix to host (the graph here can be the
            # pod-scale one; only the top layer's rows are needed)
            packed_top = jnp.asarray(np.asarray(self.graph.packed[:n_top]))
            seed_scores = tanimoto_matrix(self._target[None, :],
                                          packed_top)[0]
        self.state = dev.prime(self.state, self.dg, ids, seed_scores)
        self._primed = True
        if self._spill is not None:
            self._spill.drain(self.state)
        return n_top

    def traverse(self, n_to_score: Optional[int] = None,
                 timeout: Optional[float] = None,
                 pipeline_depth: int = 1) -> dict:
        if not self._primed:
            raise RuntimeError("prime() must be called before traverse()")
        if n_to_score is None and timeout is None:
            raise ValueError("provide n_to_score and/or timeout")
        if self._host_mode:
            self.state, _ = pipelined_traverse(
                self.state, self._expand, self._integrate,
                self._bridge.score_batch,
                n_scored_of=lambda st: int(st.n_scored),
                n_to_score=n_to_score, timeout=timeout,
                pipeline_depth=pipeline_depth, stats=self.stats,
                after_integrate=(self._spill.drain
                                 if self._spill is not None else None))
            return dict(self.stats, n_scored=self.n_scored)

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
            if self._spill is not None:
                self._spill.drain(self.state)
        self.stats.update(termination_reason=reason,
                          runtime_seconds=time.monotonic() - start,
                          n_scored=int(self.state.n_scored))
        return dict(self.stats)

    def shutdown(self) -> None:
        if self._bridge is not None:
            self._bridge.shutdown()

    def get_stats(self) -> dict:
        return dict(
            self.stats,
            n_scored=self.n_scored,
            frontier_size=dev.frontier_size(self.state),
            frontier_dropped=int(self.state.n_dropped),
            device_steps=int(self.state.n_steps),
            n_devices=int(self.mesh.devices.size),
            shard_state=self.shard_state,
        )

    # ----------------------------------------------------------- checkpoint
    def save_checkpoint(self, path: str) -> None:
        """Persist traversal state (gathers sharded arrays to host; for
        multi-host runs call on every process or use a sharded
        checkpointer). A new PodTraverser over the same graph + mesh
        resumes with :meth:`load_checkpoint`. Atomic write-then-rename;
        the file lands at exactly ``path`` whatever its suffix."""
        dev.save_state_atomic(self.state, path)

    def load_checkpoint(self, path: str) -> None:
        state = dev.load_state(path)
        if state.scored.shape[0] != self.state.scored.shape[0]:
            raise ValueError("checkpoint is for a different graph size")
        if self.shard_state:
            # restore the row-sharded placement
            self.state = jax.tree_util.tree_map(
                lambda old, new: jax.device_put(new, old.sharding),
                self.state, state)
        else:
            self.state = state
        self._primed = bool(int(self.state.n_scored) > 0)
        # drop any spill-log entries the pre-crash run wrote beyond this
        # checkpoint (same resume guard as DeviceTraverser.load_checkpoint)
        if self._spill is not None and len(self._spill) > self.n_scored:
            self._spill.truncate(self.n_scored)

    @property
    def n_scored(self) -> int:
        return int(self.state.n_scored)

    def get_molecules(self, n: int | None = None) -> List[Tuple]:
        """(node_id, score[, smiles]) in traversal order; SMILES included
        in host mode (parity with rad/scored.py:63-85). With
        ``order_log_spill`` the complete order is served from the host log
        even past the device ring capacity."""
        if self._spill is not None:
            self._spill.drain(self.state)
            ids = self._spill.read()
        else:
            ids = dev.read_order_log(self.state)
        if n is not None:
            ids = ids[:n]
        scores = dev.gather_scores(self.state, ids)
        if self._host_mode:
            smiles = self._bridge.smiles_for_ids(ids) if len(ids) else []
            return [(int(i), float(s), sm)
                    for i, s, sm in zip(ids, scores, smiles)]
        return [(int(i), float(s)) for i, s in zip(ids, scores)]

    def get_best_molecules(self, n: int | None = None):
        """Best-scoring rows, ties broken by traversal order; selects the
        top ``n`` by score BEFORE any SMILES lookups (a billion-scale
        campaign must not run one store lookup per scored molecule to
        return 100 rows)."""
        if self._spill is not None:
            self._spill.drain(self.state)
            ids = np.asarray(self._spill.read())
        else:
            ids = np.asarray(dev.read_order_log(self.state))
        scores = dev.gather_scores(self.state, ids)
        order = np.argsort(scores, kind="stable")
        if n is not None:
            order = order[:n]
        ids, scores = ids[order], scores[order]
        if self._host_mode:
            smiles = self._bridge.smiles_for_ids(ids) if len(ids) else []
            return [(int(i), float(s), sm)
                    for i, s, sm in zip(ids, scores, smiles)]
        return [(int(i), float(s)) for i, s in zip(ids, scores)]
