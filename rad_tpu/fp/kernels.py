"""Pallas TPU kernels for packed-fingerprint Tanimoto distance.

The hot op of the framework (SURVEY.md §7 hard part #2). The XLA path
(rad_tpu.fp.tanimoto.tanimoto_matrix_mxu) must materialize the unpacked
``[N, d]`` bf16 database in HBM — 16× the packed footprint. These kernels
keep HBM traffic at the packed representation and unpack *inside* VMEM,
right before the MXU dot:

    HBM (packed 128 B/row) ──DMA──> VMEM ──VPU unpack──> bf16 tile ──MXU──>
    inter = q·dbᵀ;  dist = 1 − inter / (|q| + |db| − inter)

Performance-critical choices:
  * the packed block is viewed as **bytes** ``[NT, W*4] uint8`` so the
    unpack runs on full 128-lane registers (a uint32 view leaves 3/4 of the
    lanes idle for 1024-bit fingerprints);
  * the unpacked feature order is **bit-major permuted**
    (``out[:, b*(W*4) + byte] = (x[:, byte] >> b) & 1``) — each of the 8
    shift-mask steps writes one contiguous full-width slice. Dot products
    are invariant to any fixed feature permutation, so the query side is
    unpacked with the same permutation (:func:`unpack_bitmajor`);
  * the grid is ``(n_tiles, q_tiles)`` with q innermost, and the unpacked
    db tile lives in scratch — each database block is unpacked **once** and
    reused for every query tile.

Two entry points:
  * :func:`tanimoto_matrix_pallas` — full ``[Q, N]`` distance block;
  * :func:`tanimoto_nn_pallas` — running min+argmin over the N axis
    (1-NN without ever writing the Q×N matrix to HBM).

Both validate against the SWAR reference on CPU via ``interpret=True``
(tests/test_kernels.py) and run compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rad_tpu.fp.pack import popcount_rows

__all__ = ["tanimoto_matrix_pallas", "tanimoto_nn_pallas", "unpack_bitmajor"]


def unpack_bitmajor(packed: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Unpack ``[..., W] uint32`` → ``[..., W*32]`` 0/1 in bit-major order.

    Feature ``b * (W*4) + byte`` is bit ``b`` of byte ``byte`` — the
    permutation the kernels' in-VMEM unpack produces. Any fixed permutation
    leaves dot products (and hence Tanimoto) unchanged.
    """
    *lead, w = packed.shape
    as_bytes = jax.lax.bitcast_convert_type(
        packed.astype(jnp.uint32), jnp.uint8).reshape(*lead, w * 4)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (as_bytes[..., None, :] >> shifts[:, None]) & jnp.uint8(1)
    return bits.reshape(*lead, 8 * w * 4).astype(dtype)


def _unpack_block_bytes(db_bytes_ref, scratch, nbytes: int):
    """VPU unpack of [NT, nbytes] uint8 → [NT, 8*nbytes] bit-major 0/1.

    Output dtype follows the scratch buffer: int8 for the 2×-peak integer
    MXU path (exact — 0/1 dots accumulate in int32), bf16 otherwise."""
    blk = db_bytes_ref[:, :].astype(jnp.int32)          # [NT, nbytes]
    out_dtype = scratch.dtype
    for b in range(8):
        bits = (blk >> b) & 1
        scratch[:, b * nbytes:(b + 1) * nbytes] = bits.astype(out_dtype)


def _tanimoto_block(q_bits, q_pops, scratch, db_pops_t):
    acc = jnp.int32 if scratch.dtype == jnp.int8 else jnp.float32
    inter = jax.lax.dot_general(
        q_bits, scratch[:, :],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=acc).astype(jnp.float32)  # [QT, NT]
    union = q_pops + db_pops_t - inter
    sim = jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 1.0)
    return 1.0 - sim


def _matrix_kernel(q_bits_ref, q_pops_ref, db_ref, db_pops_ref, out_ref,
                   scratch, *, nbytes: int):
    @pl.when(pl.program_id(1) == 0)
    def _():
        _unpack_block_bytes(db_ref, scratch, nbytes)

    out_ref[:, :] = _tanimoto_block(
        q_bits_ref[:, :], q_pops_ref[:, :], scratch, db_pops_ref[:, :].T)


@functools.partial(jax.jit,
                   static_argnames=("q_tile", "n_tile", "interpret",
                                    "compute_dtype"))
def tanimoto_matrix_pallas(q_packed: jnp.ndarray, db_packed: jnp.ndarray,
                           q_tile: int = 512, n_tile: int = 1024,
                           interpret: bool = False,
                           compute_dtype=jnp.int8) -> jnp.ndarray:
    """Full [Q, N] Tanimoto distance matrix with in-kernel unpack.

    Q must divide by ``q_tile`` and N by ``n_tile`` (pad with zero rows and
    slice — zero rows are distance 1 to everything non-empty).
    ``compute_dtype=jnp.int8`` rides the 2×-peak integer MXU (exact);
    ``jnp.bfloat16`` is the fallback.
    """
    q, w = q_packed.shape
    n, _ = db_packed.shape
    assert q % q_tile == 0 and n % n_tile == 0, (q, n, q_tile, n_tile)
    nbytes = w * 4
    d = w * 32
    q_bits = unpack_bitmajor(q_packed, compute_dtype)
    q_pops = popcount_rows(q_packed).astype(jnp.float32)[:, None]
    db_pops = popcount_rows(db_packed).astype(jnp.float32)[:, None]
    db_bytes = jax.lax.bitcast_convert_type(
        db_packed, jnp.uint8).reshape(n, nbytes)

    grid = (n // n_tile, q // q_tile)
    kernel = functools.partial(_matrix_kernel, nbytes=nbytes)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tile, nbytes), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tile, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q_tile, n_tile), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_tile, d), compute_dtype)],
        interpret=interpret,
    )(q_bits, q_pops, db_bytes, db_pops)


def _nn_kernel_fast(q_bits_ref, q_pops_ref, db_ref, db_pops_ref,
                    key_ref, blk_ref, scratch, *, nbytes: int, n_tile: int):
    """Throughput epilogue: approximate reciprocal for the divide and ONE
    packed-key max-reduction instead of min+argmin.

    Similarity (not distance) is maximized; each candidate's f32 sim is
    bitcast to int32 (order-preserving for non-negative floats) with the
    lane index packed into the low 10 mantissa bits — a single integer max
    then selects best sim AND its index. Costs ~2^-13 relative sim
    resolution plus the VPU's approximate-reciprocal error; ties resolve to
    the larger index (the exact kernel takes the first). Callers that need
    exact distances use the default epilogue."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        key_ref[:, :] = jnp.full_like(key_ref[:, :], jnp.iinfo(jnp.int32).min)
        blk_ref[:, :] = jnp.zeros_like(blk_ref[:, :])

    @pl.when(pl.program_id(1) == 0)
    def _():
        _unpack_block_bytes(db_ref, scratch, nbytes)

    acc = jnp.int32 if scratch.dtype == jnp.int8 else jnp.float32
    inter = jax.lax.dot_general(
        q_bits_ref[:, :], scratch[:, :],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=acc).astype(jnp.float32)      # [QT, NT]
    union = q_pops_ref[:, :] + db_pops_ref[:, :].T - inter
    sim = inter * pl.reciprocal(jnp.maximum(union, 1.0), approx=True)
    sim = jnp.where(union > 0, sim, 1.0)
    bits = jax.lax.bitcast_convert_type(sim, jnp.int32)
    idx = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
    keys = (bits & ~jnp.int32(n_tile - 1)) | idx
    kmax = jnp.max(keys, axis=1, keepdims=True)              # [QT, 1]
    better = kmax > key_ref[:, :]
    key_ref[:, :] = jnp.where(better, kmax, key_ref[:, :])
    blk_ref[:, :] = jnp.where(better, i, blk_ref[:, :])


def _nn_kernel(q_bits_ref, q_pops_ref, db_ref, db_pops_ref,
               min_ref, arg_ref, scratch, *, nbytes: int, n_tile: int):
    i = pl.program_id(0)  # db block (outer)

    @pl.when(i == 0)
    def _():
        min_ref[:, :] = jnp.full_like(min_ref[:, :], jnp.inf)
        arg_ref[:, :] = jnp.full_like(arg_ref[:, :], -1)

    @pl.when(pl.program_id(1) == 0)
    def _():
        _unpack_block_bytes(db_ref, scratch, nbytes)

    dist = _tanimoto_block(
        q_bits_ref[:, :], q_pops_ref[:, :], scratch, db_pops_ref[:, :].T)
    bmin = jnp.min(dist, axis=1, keepdims=True)           # [QT, 1]
    barg = jnp.argmin(dist, axis=1)[:, None].astype(jnp.int32)
    gid = i * n_tile + barg
    better = bmin < min_ref[:, :]
    min_ref[:, :] = jnp.where(better, bmin, min_ref[:, :])
    arg_ref[:, :] = jnp.where(better, gid, arg_ref[:, :])


@functools.partial(jax.jit,
                   static_argnames=("q_tile", "n_tile", "interpret",
                                    "compute_dtype", "approx"))
def tanimoto_nn_pallas(q_packed: jnp.ndarray, db_packed: jnp.ndarray,
                       q_tile: int | None = None, n_tile: int = 1024,
                       interpret: bool = False, compute_dtype=jnp.int8,
                       approx: bool = False):
    """1-NN by Tanimoto: returns (min_dist [Q], argmin_id [Q]).

    ``approx=True`` selects the throughput epilogue (approximate
    reciprocal + one packed-key reduction, see :func:`_nn_kernel_fast`):
    distances carry ~1e-3 absolute error and distance ties resolve to the
    larger id. The neighbor identity is unaffected outside ties.

    ``q_tile=None`` picks the largest power-of-two divisor of Q up to 1024
    (measured fastest on v5e: 47.6 ms vs 49.3 at 512 for the 2048×1M
    sweep, BENCHMARKS.md)."""
    q, w = q_packed.shape
    n, _ = db_packed.shape
    if q_tile is None:
        q_tile = 8
        while q_tile < 1024 and q % (q_tile * 2) == 0:
            q_tile *= 2
    assert q % q_tile == 0 and n % n_tile == 0, (q, n, q_tile, n_tile)
    assert n_tile & (n_tile - 1) == 0, "n_tile must be a power of two"
    nbytes = w * 4
    d = w * 32
    q_bits = unpack_bitmajor(q_packed, compute_dtype)
    q_pops = popcount_rows(q_packed).astype(jnp.float32)[:, None]
    db_pops = popcount_rows(db_packed).astype(jnp.float32)[:, None]
    db_bytes = jax.lax.bitcast_convert_type(
        db_packed, jnp.uint8).reshape(n, nbytes)

    grid = (n // n_tile, q // q_tile)
    kern_fn = _nn_kernel_fast if approx else _nn_kernel
    kernel = functools.partial(kern_fn, nbytes=nbytes, n_tile=n_tile)
    out_a, out_b = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tile, nbytes), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tile, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((q_tile, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((q, 1),
                                 jnp.int32 if approx else jnp.float32),
            jax.ShapeDtypeStruct((q, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((n_tile, d), compute_dtype)],
        interpret=interpret,
    )(q_bits, q_pops, db_bytes, db_pops)
    if not approx:
        return out_a[:, 0], out_b[:, 0]
    key, blk = out_a[:, 0], out_b[:, 0]
    idx = key & (n_tile - 1)
    sim = jax.lax.bitcast_convert_type(key & ~jnp.int32(n_tile - 1),
                                       jnp.float32)
    return 1.0 - sim, blk * n_tile + idx
