"""Park-supervised process launching for device-facing benchmarks.

Through a remote-execution tunnel a fresh client's device-init RPC can be
lost ("grant unclaimed — client lost"): the process parks forever with zero
CPU while other clients init fine. The mitigation (proven in
examples/dudez_workflow.py --device-scored) is two-sided:

1. The worker's FIRST act is a trivial device op that prints a marker
   (:func:`device_warmup`), so a park is visible immediately instead of
   after minutes of host-side setup.
2. A supervisor watches for the marker and kills + relaunches the worker
   if it does not appear within a window (:func:`run_supervised`, or the
   self-supervising :func:`ensure_supervised`).

This is the analogue of the reference's worker liveness machinery
(heartbeat + dead-worker relaunch, rad/coordination_service.py:522-552)
applied to the device-lease boundary instead of scoring workers.
"""

from __future__ import annotations

import os
import queue
import signal
import subprocess
import sys
import threading
import time
from typing import Callable, Optional, Sequence

DEFAULT_MARKER = "device warmup ok"

PARKED = -9001  # sentinel rc: marker never appeared, retries exhausted
OVER_BUDGET = -9002  # sentinel rc: budget expired after marker


def device_warmup(label: str = DEFAULT_MARKER) -> float:
    """Run a trivial device op and print ``label`` — call FIRST in workers.

    Returns the warmup wall time. Import of jax happens here so callers can
    keep module import cheap and make this genuinely the first device use.
    """
    t0 = time.perf_counter()
    import jax.numpy as jnp

    float(jnp.zeros((8,), jnp.float32).sum())
    dt = time.perf_counter() - t0
    print(f"{label} ({dt:.1f}s)", flush=True)
    return dt


def _pump(stream, q: "queue.Queue[Optional[str]]") -> None:
    for line in iter(stream.readline, ""):
        q.put(line)
    q.put(None)


def _terminate(proc: subprocess.Popen, grace: float = 10.0) -> None:
    if proc.poll() is not None:
        return
    try:
        proc.terminate()
        proc.wait(timeout=grace)
    except Exception:
        pass
    if proc.poll() is None:
        try:
            proc.kill()
            proc.wait(timeout=5)
        except Exception:
            pass


def run_supervised(
    cmd: Sequence[str],
    *,
    marker: str = DEFAULT_MARKER,
    marker_timeout: float = 300.0,
    budget: Optional[float] = None,
    retries: int = 1,
    retry_sleep: float = 60.0,
    tee=None,
    on_line: Optional[Callable[[str], None]] = None,
    env: Optional[dict] = None,
) -> int:
    """Run ``cmd``; require ``marker`` on its merged output within
    ``marker_timeout`` seconds (park detection). On a park: kill, sleep
    ``retry_sleep``, relaunch up to ``retries`` times (budget permitting).
    ``budget`` bounds each attempt's total wall time (SIGTERM then SIGKILL,
    so the child can flush partial results from its own TERM handler).

    Output lines are forwarded to ``tee`` (default ``sys.stderr``) and to
    ``on_line``. Returns the child's exit code, or ``PARKED`` /
    ``OVER_BUDGET`` sentinels.
    """
    tee = sys.stderr if tee is None else tee
    overall = time.monotonic()
    attempt = 0
    while True:
        attempt += 1
        start = time.monotonic()
        proc = subprocess.Popen(
            list(cmd),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        q: "queue.Queue[Optional[str]]" = queue.Queue()
        t = threading.Thread(target=_pump, args=(proc.stdout, q), daemon=True)
        t.start()
        saw_marker = False
        eof = False
        timed_out = False
        while True:
            now = time.monotonic()
            if budget is not None and now - overall > budget:
                timed_out = True
                _terminate(proc)
            if not saw_marker and now - start > marker_timeout:
                break  # parked
            try:
                line = q.get(timeout=1.0)
            except queue.Empty:
                if proc.poll() is not None and eof:
                    break
                continue
            if line is None:
                eof = True
                if proc.poll() is not None:
                    break
                continue
            if marker in line:
                saw_marker = True
            try:
                tee.write(line)
                tee.flush()
            except Exception:
                pass
            if on_line is not None:
                on_line(line)
        if saw_marker or timed_out:
            _terminate(proc)
            # drain remaining buffered lines
            while True:
                try:
                    line = q.get(timeout=0.5)
                except queue.Empty:
                    break
                if line is None:
                    break
                try:
                    tee.write(line)
                    tee.flush()
                except Exception:
                    pass
                if on_line is not None:
                    on_line(line)
            if timed_out and proc.returncode not in (0,):
                return OVER_BUDGET
            return proc.returncode if proc.returncode is not None else 0
        if eof and proc.returncode == 0:
            return 0  # clean exit without marker (e.g. no device phase)
        # parked: no marker, no clean exit
        _terminate(proc, grace=2.0)
        exited_early = eof and proc.returncode not in (None, 0)
        # a FAST non-zero exit is a deterministic crash (bad args, import
        # error), not a park — the park sleep-and-retry cycle would just
        # replay it a minute later (ADVICE r4). Return it immediately.
        if exited_early and time.monotonic() - start < 30.0:
            return proc.returncode
        budget_left = (None if budget is None
                       else budget - (time.monotonic() - overall))
        if attempt > retries or (
                budget_left is not None
                and budget_left < retry_sleep + marker_timeout / 2):
            return proc.returncode if exited_early else PARKED
        print(
            f"[launcher] no '{marker}' within {marker_timeout:.0f}s "
            f"(attempt {attempt}); kill + sleep {retry_sleep:.0f}s + retry",
            file=sys.stderr,
            flush=True,
        )
        time.sleep(retry_sleep)


_SUPERVISED_ENV = "RAD_TPU_SUPERVISED"


def ensure_supervised(
    *,
    marker: str = DEFAULT_MARKER,
    marker_timeout: float = 300.0,
    retries: int = 1,
    retry_sleep: float = 60.0,
    budget: Optional[float] = None,
) -> None:
    """Self-supervision entry for device-facing bench scripts.

    In the supervised child (env flag set) or on non-tunnel platforms
    (JAX_PLATFORMS=cpu) this returns immediately and the caller should then
    call :func:`device_warmup` as its first device act. Otherwise it
    re-execs ``sys.argv`` as a supervised child, forwards its output, and
    exits with the child's return code.
    """
    if os.environ.get(_SUPERVISED_ENV) == "1":
        return
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return  # no tunnel, no park hazard
    # operator override for degraded-tunnel periods where device init is
    # legitimately slow (observed: ~14 min after a device wedge) — a
    # 300 s kill-and-retry cycle only adds churn there
    env_t = os.environ.get("RAD_TPU_MARKER_TIMEOUT")
    if env_t:
        marker_timeout = float(env_t)
    env = dict(os.environ)
    env[_SUPERVISED_ENV] = "1"
    rc = run_supervised(
        [sys.executable, *sys.argv],
        marker=marker,
        marker_timeout=marker_timeout,
        retries=retries,
        retry_sleep=retry_sleep,
        budget=budget,
        tee=sys.stdout,
        env=env,
    )
    sys.exit(0 if rc == 0 else 1)
