"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

This container pins a remote single-chip TPU backend ('axon') via
sitecustomize, whose per-process init + remote compiles cost minutes. Tests
must run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without real hardware (mirrors how the reference tests multi-node
behavior on localhost — SURVEY.md §4). sitecustomize imports jax but does not
initialize a backend, so re-pinning the platform here (before any backend
init) is safe and takes effect.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from rad_tpu.fp import random_fingerprints


def pytest_addoption(parser):
    parser.addoption(
        "--full", action="store_true", default=False,
        help="run the full lane including @pytest.mark.slow tests "
             "(16/32-device dryruns, multihost two-process tests, "
             "billion-scale shape checks). Default lane skips them so a "
             "dev-loop `pytest -q` stays fast; CI runs both lanes.")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--full") or os.environ.get("RAD_TPU_FULL_TESTS"):
        return
    if "slow" in (config.getoption("-m") or ""):
        return  # explicit -m slow / -m 'not slow' selection wins
    skip = pytest.mark.skip(reason="slow lane: pass --full (or -m slow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert devs[0].platform == "cpu"
    return devs


@pytest.fixture(scope="session")
def small_fps():
    """64-bit, 200-vector fingerprint set (reference test scale:
    tests/test_hnsw_service.py:13-28 uses dim 64, 20-1000 vectors)."""
    return random_fingerprints(200, n_bits=64, density=0.3, seed=42)


@pytest.fixture(scope="session")
def medium_fps():
    """1024-bit, 1000-vector fingerprint set (reference canonical dim)."""
    return random_fingerprints(1000, n_bits=1024, density=0.1, seed=7)
