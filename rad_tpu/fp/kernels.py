"""Pallas TPU kernels for packed-fingerprint Tanimoto distance.

The hot op of the framework (SURVEY.md §7 hard part #2). The XLA path
(rad_tpu.fp.tanimoto.tanimoto_matrix_mxu) must materialize the unpacked
``[N, d]`` bf16 database in HBM — 16× the packed footprint. These kernels
keep HBM traffic at the packed ``[N, d/32] uint32`` representation and
unpack *inside* VMEM, right before the MXU dot:

    HBM (packed 128 B/row) ──DMA──> VMEM ──VPU unpack──> bf16 tile ──MXU──>
    inter = q·dbᵀ;  dist = 1 − inter / (|q| + |db| − inter)

Two entry points:
  * :func:`tanimoto_matrix_pallas` — full ``[Q, N]`` distance block
    (building block for batched search / recall sweeps);
  * :func:`tanimoto_nn_pallas` — running min + argmin over the N grid axis
    (1-NN distance without ever writing the Q×N matrix to HBM) — the
    benchmark headline configuration.

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
from rad_tpu.fp.tanimoto import unpack_to_dtype

__all__ = ["tanimoto_matrix_pallas", "tanimoto_nn_pallas"]


def _unpack_block(db_ref, scratch, nt: int, words: int):
    """VPU unpack of a packed [NT, W] uint32 block into bf16 [NT, W*32].

    Bit layout matches rad_tpu.fp.pack: out[n, w*32 + b] = (db[n, w] >> b)&1.
    """
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (1, 32), 1)
    for w in range(words):
        word = db_ref[:, w][:, None]                    # [NT, 1] uint32
        bits = (word >> shifts) & jnp.uint32(1)         # [NT, 32]
        # Mosaic has no uint32->bf16 cast; hop through int32
        scratch[:, w * 32:(w + 1) * 32] = bits.astype(
            jnp.int32).astype(jnp.bfloat16)


def _matrix_kernel(q_bits_ref, q_pops_ref, db_ref, db_pops_ref, out_ref,
                   scratch, *, words: int):
    nt = db_ref.shape[0]
    _unpack_block(db_ref, scratch, nt, words)
    inter = jax.lax.dot_general(
        q_bits_ref[:, :], scratch[:, :],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # [QT, NT]
    union = q_pops_ref[:, :] + db_pops_ref[:, :].T - inter
    sim = jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 1.0)
    out_ref[:, :] = 1.0 - sim


@functools.partial(jax.jit,
                   static_argnames=("q_tile", "n_tile", "interpret"))
def tanimoto_matrix_pallas(q_packed: jnp.ndarray, db_packed: jnp.ndarray,
                           q_tile: int = 256, n_tile: int = 512,
                           interpret: bool = False) -> jnp.ndarray:
    """Full [Q, N] Tanimoto distance matrix with in-kernel unpack.

    Q must divide by ``q_tile`` and N by ``n_tile`` (pad with zero rows and
    slice if needed — zero rows give distance 1 to everything non-empty).
    """
    q, w = q_packed.shape
    n, _ = db_packed.shape
    assert q % q_tile == 0 and n % n_tile == 0, (q, n, q_tile, n_tile)
    d = w * 32
    q_bits = unpack_to_dtype(q_packed, jnp.bfloat16)
    q_pops = popcount_rows(q_packed).astype(jnp.float32)[:, None]
    db_pops = popcount_rows(db_packed).astype(jnp.float32)[:, None]

    grid = (q // q_tile, n // n_tile)
    kernel = functools.partial(_matrix_kernel, words=w)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tile, w), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tile, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q_tile, n_tile), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_tile, d), jnp.bfloat16)],
        interpret=interpret,
    )(q_bits, q_pops, db_packed, db_pops)


def _nn_kernel(q_bits_ref, q_pops_ref, db_ref, db_pops_ref,
               min_ref, arg_ref, scratch, *, words: int, n_tile: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        min_ref[:, :] = jnp.full_like(min_ref[:, :], jnp.inf)
        arg_ref[:, :] = jnp.full_like(arg_ref[:, :], -1)

    _unpack_block(db_ref, scratch, db_ref.shape[0], words)
    inter = jax.lax.dot_general(
        q_bits_ref[:, :], scratch[:, :],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    union = q_pops_ref[:, :] + db_pops_ref[:, :].T - inter
    sim = jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 1.0)
    dist = 1.0 - sim                                      # [QT, NT]

    bmin = jnp.min(dist, axis=1, keepdims=True)           # [QT, 1]
    barg = jnp.argmin(dist, axis=1)[:, None].astype(jnp.int32)
    gid = j * n_tile + barg
    better = bmin < min_ref[:, :]
    min_ref[:, :] = jnp.where(better, bmin, min_ref[:, :])
    arg_ref[:, :] = jnp.where(better, gid, arg_ref[:, :])


@functools.partial(jax.jit,
                   static_argnames=("q_tile", "n_tile", "interpret"))
def tanimoto_nn_pallas(q_packed: jnp.ndarray, db_packed: jnp.ndarray,
                       q_tile: int = 256, n_tile: int = 512,
                       interpret: bool = False):
    """1-NN by Tanimoto: returns (min_dist [Q], argmin_id [Q]).

    Scans the full database in n_tile blocks, carrying a running min —
    the Q×N matrix never leaves VMEM.
    """
    q, w = q_packed.shape
    n, _ = db_packed.shape
    assert q % q_tile == 0 and n % n_tile == 0, (q, n, q_tile, n_tile)
    d = w * 32
    q_bits = unpack_to_dtype(q_packed, jnp.bfloat16)
    q_pops = popcount_rows(q_packed).astype(jnp.float32)[:, None]
    db_pops = popcount_rows(db_packed).astype(jnp.float32)[:, None]

    grid = (q // q_tile, n // n_tile)
    kernel = functools.partial(_nn_kernel, words=w, n_tile=n_tile)
    min_d, arg = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tile, w), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tile, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((q_tile, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((q, 1), jnp.float32),
            jax.ShapeDtypeStruct((q, 1), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((n_tile, d), jnp.bfloat16)],
        interpret=interpret,
    )(q_bits, q_pops, db_packed, db_pops)
    return min_d[:, 0], arg[:, 0]
