"""Pipelined host-scoring traversal loop, engine-agnostic.

One loop drives every engine whose step splits at the scoring boundary into
``expand`` (pop + gather + emit candidate ids) and ``integrate`` (write
scores + frontier merge): the single-chip stepwise engine
(rad_tpu.traverse.driver.DeviceTraverser) and the graph-sharded pod engine
(rad_tpu.parallel.pod.PodTraverser with a host ``scoring_fn``).

``pipeline_depth > 1`` keeps that many expansion batches in flight: the
device expands batch k+1 while the host scores batch k — the analogue of
the reference's prefetch-proxy overlap (rad/coordination_service.py:314-347,
where the coordination service prefetches neighbors for the next work item
while workers score the current one). All once-only invariants hold at any
depth because integrate's insert-if-absent drops ids scored by an earlier
in-flight batch.
"""

from __future__ import annotations

import collections
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["pipelined_traverse", "HostScoringBridge"]


class HostScoringBridge:
    """id batch → SMILES lookup → threaded ``scoring_fn`` calls → scores.

    The host half of the scoring boundary, shared by the single-chip and
    pod drivers: maps node ids through the key table to SMILES (store
    optional — parity with the reference's SQLite sidecar, README.md:64-88),
    fans the per-molecule ``scoring_fn`` calls over a thread pool (docking
    programs are subprocess/IO-bound — the analogue of the reference's N
    scoring workers, rad/distributed_worker.py:244-333), and records
    failures as ``failed_score`` instead of crashing the sweep.
    """

    def __init__(self, keys: np.ndarray, scoring_fn, smiles_store=None,
                 n_score_threads: int = 8,
                 failed_score: float = float("inf"),
                 stats: Optional[dict] = None):
        from rad_tpu.graph.storage import host_keys_view
        # virtual keys (v2 slim serving graphs) stay lazy: indexing them
        # per batch beats materializing 8 B/node up front
        self.keys = host_keys_view(keys)
        self.scoring_fn = scoring_fn
        self.smiles_store = smiles_store
        self.failed_score = failed_score
        self.stats = stats if stats is not None else {}
        self.stats.setdefault("scoring_errors", 0)
        self._pool = (ThreadPoolExecutor(max_workers=n_score_threads,
                                         thread_name_prefix="rad-score")
                      if n_score_threads > 1 else None)

    def smiles_for_ids(self, ids: np.ndarray):
        keys = self.keys[ids]
        if self.smiles_store is None:
            return [str(int(k)) for k in keys]
        return self.smiles_store.get_smiles_list(keys.tolist())

    def score_smiles(self, smiles) -> np.ndarray:
        def one(s: str) -> float:
            try:
                return float(self.scoring_fn(s))
            except Exception:
                self.stats["scoring_errors"] += 1
                return self.failed_score

        if self._pool is not None and len(smiles) > 1:
            out = list(self._pool.map(one, smiles))
        else:
            out = [one(s) for s in smiles]
        return np.asarray(out, dtype=np.float32)

    def score_batch(self, to_score: np.ndarray) -> np.ndarray:
        """Score a -1-padded id batch; padding positions return 0 (ignored
        by integrate's insert-if-absent mask)."""
        ids = to_score[to_score >= 0]
        new_scores = np.zeros(to_score.shape, np.float32)
        if ids.size:
            new_scores[: ids.size] = self.score_smiles(
                self.smiles_for_ids(ids))
        return new_scores

    def shutdown(self):
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None


def pipelined_traverse(
    state,
    expand: Callable,
    integrate: Callable,
    score_batch: Callable[[np.ndarray], np.ndarray],
    *,
    n_scored_of: Callable,
    n_to_score: Optional[int] = None,
    timeout: Optional[float] = None,
    pipeline_depth: int = 1,
    stats: Optional[dict] = None,
    after_integrate: Optional[Callable] = None,
) -> Tuple[object, str]:
    """Run expand → host-score → integrate until a stop condition.

    expand(state) -> (state, out)   out: dict with "to_score" [K] int32
                                    (-1 padded) and "exp_valid" [B] bool
    integrate(state, out, new_scores [K] f32 device array) -> state
    score_batch(to_score np [K]) -> np [K] f32 (positions of valid ids
                                    filled; padding ignored by integrate)
    after_integrate(state) — optional host hook run after every integrate
    (e.g. the incremental order-log drain, rad_tpu.traverse.spill)

    Termination reasons mirror the reference (rad/traverser.py:178-245 +
    rad/coordination_service.py:415-457): ``n_to_score``, ``timeout``,
    ``queue_empty``. Returns (state, reason).
    """
    if n_to_score is None and timeout is None:
        raise ValueError("provide n_to_score and/or timeout")
    if stats is None:
        stats = {}
    stats.setdefault("steps", 0)
    stats.setdefault("scoring_time", 0.0)
    stats.setdefault("device_time", 0.0)

    score_pool = (
        ThreadPoolExecutor(max_workers=max(pipeline_depth, 1),
                           thread_name_prefix="rad-batch")
        if pipeline_depth > 1 else None)
    start = time.monotonic()
    stats["started_at"] = start
    reason = None
    inflight = collections.deque()

    def _timed_score(to_score: np.ndarray) -> np.ndarray:
        t0 = time.perf_counter()
        out = score_batch(to_score)
        stats["scoring_time"] += time.perf_counter() - t0
        return out

    def _integrate(state, out, to_score, fut):
        new_scores = fut.result() if fut is not None \
            else _timed_score(to_score)
        t0 = time.perf_counter()
        state = integrate(state, out, jnp.asarray(new_scores,
                                                  dtype=jnp.float32))
        stats["device_time"] += time.perf_counter() - t0
        stats["steps"] += 1
        if after_integrate is not None:
            after_integrate(state)
        return state

    try:
        while True:
            if timeout is not None and time.monotonic() - start > timeout:
                reason = "timeout"
                break
            if n_to_score is not None and n_scored_of(state) >= n_to_score:
                reason = "n_to_score"
                break
            # fill the pipeline
            expanded_empty = False
            while len(inflight) < max(pipeline_depth, 1):
                t0 = time.perf_counter()
                state, out = expand(state)
                to_score = np.asarray(out["to_score"])
                exp_valid = np.asarray(out["exp_valid"])
                stats["device_time"] += time.perf_counter() - t0
                if not exp_valid.any():
                    expanded_empty = True
                    break
                fut = (score_pool.submit(_timed_score, to_score)
                       if score_pool is not None else None)
                inflight.append((out, to_score, fut))
            if not inflight:
                if expanded_empty:
                    reason = "queue_empty"
                    break
                continue
            state = _integrate(state, *inflight.popleft())
        # drain remaining in-flight batches so their pops aren't lost
        while inflight:
            state = _integrate(state, *inflight.popleft())
    finally:
        if score_pool is not None:
            score_pool.shutdown(wait=False)
    stats["termination_reason"] = reason
    stats["runtime_seconds"] = time.monotonic() - start
    return state, reason
