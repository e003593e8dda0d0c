"""Native (C++) host components: multithreaded HNSW builder + exact kNN.

ctypes bindings over ``hnsw_builder.cpp``, compiled on first use with g++
(no pybind11 in this environment; the C ABI + ctypes keeps the build
dependency-free). The native builder is the host-speed path for large
library construction — the role usearch's C++ core plays in the reference
(SURVEY.md §2 rows 1-2) — while the JAX builder (rad_tpu.build.device) is
the on-device path.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["native_available", "build_hnsw_native", "search_knn_native",
           "smiles_fingerprints_native", "bruteforce_topk_native"]

_SRC = os.path.join(os.path.dirname(__file__), "hnsw_builder.cpp")
_LIB: Optional[ctypes.CDLL] = None
_LIB_ERR: Optional[str] = None


def _lib_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    # user-owned cache dir (0700), NOT the world-shared tmpdir: the digest
    # is computable from public source, so a predictable world-writable
    # path would let another local user pre-plant a library there
    cache = os.environ.get("RAD_TPU_NATIVE_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "rad_tpu")
    os.makedirs(cache, mode=0o700, exist_ok=True)
    return os.path.join(cache, f"hnsw_builder_{digest}.so")


def _owned_by_us(path: str) -> bool:
    try:
        st = os.stat(path)
    except OSError:
        return False
    return st.st_uid == os.getuid() if hasattr(os, "getuid") else True


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_ERR
    if _LIB is not None or _LIB_ERR is not None:
        return _LIB
    path = _lib_path()
    if os.path.exists(path) and not _owned_by_us(path):
        _LIB_ERR = f"cached library {path} not owned by this user"
        logger.warning("native build unavailable: %s", _LIB_ERR)
        return None
    if not os.path.exists(path):
        # compile to a mkstemp-unique temp (no fixed .tmp name → no race
        # between concurrent builds), then atomically publish
        fd, tmp = tempfile.mkstemp(suffix=".so",
                                   dir=os.path.dirname(path))
        os.close(fd)
        base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                "-funroll-loops", "-o", tmp, _SRC]
        # prefer native ISA (POPCNT/AVX2 for the distance loop); fall back
        # for cross-compilation or exotic hosts
        attempts = [base[:1] + ["-march=native"] + base[1:],
                    base[:1] + ["-mpopcnt"] + base[1:],
                    base]
        err = None
        for cmd in attempts:
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               text=True)
                os.replace(tmp, path)
                logger.info("compiled native builder -> %s (%s)", path,
                            cmd[1])
                err = None
                break
            except (subprocess.CalledProcessError, OSError) as e:
                err = getattr(e, "stderr", str(e)) or str(e)
        if err is not None:
            _LIB_ERR = err
            try:
                os.unlink(tmp)
            except OSError:
                pass
            logger.warning("native build unavailable: %s", _LIB_ERR)
            return None
    lib = ctypes.CDLL(path)
    lib.rad_build_hnsw.restype = ctypes.c_int
    lib.rad_build_hnsw.argtypes = [
        ctypes.POINTER(ctypes.c_uint32),   # packed
        ctypes.POINTER(ctypes.c_int32),    # pops
        ctypes.c_int64,                    # n
        ctypes.c_int32,                    # words
        ctypes.POINTER(ctypes.c_int32),    # levels
        ctypes.POINTER(ctypes.c_int64),    # layer_sizes
        ctypes.c_int32,                    # max_level
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),  # tables
        ctypes.POINTER(ctypes.c_int32),    # layer_caps
        ctypes.c_int32,                    # connectivity
        ctypes.c_int32,                    # ef_construction
        ctypes.c_int32,                    # n_threads
    ]
    lib.rad_search_knn.restype = ctypes.c_int
    lib.rad_search_knn.argtypes = [
        ctypes.POINTER(ctypes.c_uint32),   # packed
        ctypes.POINTER(ctypes.c_int32),    # pops
        ctypes.c_int64,                    # n
        ctypes.c_int32,                    # words
        ctypes.POINTER(ctypes.c_int64),    # layer_sizes
        ctypes.c_int32,                    # max_level
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),  # tables
        ctypes.POINTER(ctypes.c_int32),    # layer_caps
        ctypes.POINTER(ctypes.c_uint32),   # queries
        ctypes.POINTER(ctypes.c_int32),    # q_pops
        ctypes.c_int64,                    # nq
        ctypes.c_int32,                    # k
        ctypes.c_int32,                    # ef (expansion_search)
        ctypes.c_int32,                    # n_threads
        ctypes.POINTER(ctypes.c_float),    # out_d
        ctypes.POINTER(ctypes.c_int64),    # out_i
    ]
    lib.rad_fingerprint_smiles.restype = ctypes.c_int
    lib.rad_fingerprint_smiles.argtypes = [
        ctypes.c_char_p,                   # buf
        ctypes.POINTER(ctypes.c_int64),    # offsets [n+1]
        ctypes.c_int64,                    # n
        ctypes.c_int32,                    # n_bits
        ctypes.c_int32,                    # radius
        ctypes.POINTER(ctypes.c_uint32),   # out [n, W]
        ctypes.c_int32,                    # n_threads
    ]
    lib.rad_bruteforce_topk.restype = None
    lib.rad_bruteforce_topk.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
    ]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


def build_hnsw_native(
    packed: np.ndarray,
    keys: np.ndarray | None = None,
    connectivity: int = 16,
    expansion_add: int = 200,
    ndim: int | None = None,
    seed: int = 0,
    n_threads: int = 0,
):
    """Build an HNSWGraph with the C++ core. Same semantics/params as
    rad_tpu.build.reference.build_hnsw; ``n_threads=0`` = all cores."""
    from rad_tpu.build.reference import sample_levels
    from rad_tpu.fp.pack import popcount_rows_np
    from rad_tpu.graph.storage import HNSWGraph

    lib = _load()
    if lib is None:
        raise RuntimeError(f"native builder unavailable: {_LIB_ERR}")

    packed = np.ascontiguousarray(packed, dtype=np.uint32)
    n, w = packed.shape
    ndim = ndim or w * 32
    m = connectivity
    if keys is None:
        keys = np.arange(n, dtype=np.int64)
    keys = np.asarray(keys, dtype=np.int64)

    levels_raw = sample_levels(n, m, seed)
    order = np.lexsort((np.arange(n), -levels_raw))
    packed = np.ascontiguousarray(packed[order])
    keys = keys[order]
    levels = np.ascontiguousarray(levels_raw[order].astype(np.int32))
    max_level = int(levels[0]) if n else 0
    layer_sizes = np.array([(levels >= l).sum()
                            for l in range(max_level + 1)], dtype=np.int64)
    caps = np.array([2 * m if l == 0 else m
                     for l in range(max_level + 1)], dtype=np.int32)
    pops = np.ascontiguousarray(popcount_rows_np(packed).astype(np.int32))

    tables = [np.full((int(layer_sizes[l]), int(caps[l])), -1, np.int32)
              for l in range(max_level + 1)]
    table_ptrs = (ctypes.POINTER(ctypes.c_int32) * (max_level + 1))(
        *[t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) for t in tables])

    rc = lib.rad_build_hnsw(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        pops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n, w,
        levels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        layer_sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        max_level, table_ptrs,
        caps.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        m, expansion_add, n_threads,
    )
    if rc != 0:
        raise RuntimeError(f"native build failed with code {rc}")

    return HNSWGraph(
        packed=packed,
        popcounts=popcount_rows_np(packed),
        keys=keys,
        levels=levels,
        neighbors=tuple(tables),
        ndim=ndim,
        connectivity=m,
    )


def search_knn_native(graph, queries: np.ndarray, k: int = 10,
                      expansion_search: int = 64, n_threads: int = 0):
    """Batched k-NN beam search on the host C++ core: (dists, node_ids).

    The CPU counterpart of the jitted device search (rad_tpu.search.knn) —
    usearch ``Index.search`` parity for deployments that serve a graph
    without an accelerator (e.g. the HTTP server host). Same semantics:
    greedy upper-layer descent from the entry point, then an
    ``expansion_search``-wide beam on layer 0. ``n_threads=0`` = all
    cores; ids are node ids (map to keys via ``graph.keys``).
    """
    from rad_tpu.fp.pack import popcount_rows_np

    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_LIB_ERR}")
    packed = np.ascontiguousarray(np.asarray(graph.packed), dtype=np.uint32)
    n, w = packed.shape
    queries = np.ascontiguousarray(np.atleast_2d(queries), dtype=np.uint32)
    if queries.shape[1] != w:
        raise ValueError(
            f"query width {queries.shape[1]} != graph width {w}")
    nq = queries.shape[0]
    pops = np.ascontiguousarray(
        np.asarray(graph.popcounts).astype(np.int32))
    q_pops = np.ascontiguousarray(
        popcount_rows_np(queries).astype(np.int32))
    tables = [np.ascontiguousarray(np.asarray(t), dtype=np.int32)
              for t in graph.neighbors]
    max_level = len(tables) - 1
    layer_sizes = np.array([t.shape[0] for t in tables], dtype=np.int64)
    caps = np.array([t.shape[1] for t in tables], dtype=np.int32)
    table_ptrs = (ctypes.POINTER(ctypes.c_int32) * (max_level + 1))(
        *[t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) for t in tables])
    out_d = np.empty((nq, k), np.float32)
    out_i = np.empty((nq, k), np.int64)
    rc = lib.rad_search_knn(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        pops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n, w,
        layer_sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        max_level, table_ptrs,
        caps.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        queries.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        q_pops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), nq, k,
        expansion_search, n_threads,
        out_d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        raise RuntimeError(f"native search failed with code {rc}")
    return out_d, out_i


def smiles_fingerprints_native(smiles, n_bits: int = 1024, radius: int = 2,
                               n_threads: int = 0) -> np.ndarray:
    """Multithreaded batch SMILES fingerprinting: packed ``[N, W] uint32``.

    The native library-ingestion data loader — bit-identical to the Python
    fallback ``rad_tpu.fp.pack._hash_fingerprint_bits`` (FNV-1a 64 over
    byte substrings), used for RDKit-free environments. ``n_threads=0`` =
    all cores.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_LIB_ERR}")
    smiles = list(smiles)
    n = len(smiles)
    w = (n_bits + 31) // 32
    out = np.zeros((max(n, 1), w), np.uint32)
    if n == 0:
        return out[:0]
    encoded = [s.encode("utf-8") for s in smiles]
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum([len(e) for e in encoded], out=offsets[1:])
    buf = b"".join(encoded)
    rc = lib.rad_fingerprint_smiles(
        buf,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, n_bits, radius,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        n_threads,
    )
    if rc != 0:
        raise RuntimeError(f"native fingerprinting failed with code {rc}")
    return out


def bruteforce_topk_native(packed: np.ndarray, queries: np.ndarray,
                           k: int = 10):
    """Exact CPU top-k via the C++ popcount scan: (dists, ids)."""
    from rad_tpu.fp.pack import popcount_rows_np

    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_LIB_ERR}")
    packed = np.ascontiguousarray(packed, dtype=np.uint32)
    queries = np.ascontiguousarray(np.atleast_2d(queries), dtype=np.uint32)
    n, w = packed.shape
    nq = queries.shape[0]
    pops = np.ascontiguousarray(popcount_rows_np(packed).astype(np.int32))
    q_pops = np.ascontiguousarray(
        popcount_rows_np(queries).astype(np.int32))
    out_d = np.empty((nq, k), np.float32)
    out_i = np.empty((nq, k), np.int64)
    lib.rad_bruteforce_topk(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        pops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n, w,
        queries.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        q_pops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), nq, k,
        out_d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out_d, out_i
