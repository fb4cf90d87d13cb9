"""Pallas TPU kernel: batched row gather as an in-VMEM one-hot matmul.

The grouping op's gather — (B, N, C) tables indexed by (B, S*K) — is the
hot spot of the training step. XLA's native gather lowers to a slow
scatter/gather sequence on TPU (~28 ms for the reference workload), and an
HBM-materialized one-hot matmul pays ~2.7 GB of memory traffic. This kernel
builds the one-hot comparison matrix directly in VMEM, row-tile by
row-tile, and rides the MXU for the contraction — HBM traffic is just the
inputs and outputs.

Exactness: the one-hot and the table are kept in float32 and contracted
with HIGHEST precision, so each output row is the table row bit-exactly
(one-hot rows have a single 1).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _make_gather_kernel(tile: int):
    def kernel(idx_ref, table_ref, out_ref):
        # idx_ref:   (1, 1, R) int32   — one batch row's indices
        # table_ref: (1, C, N) float32 — the batch row's table, transposed
        # out_ref:   (1, C, R) float32 — transposed output
        # Transposed contraction keeps the tiny channel dim on sublanes
        # (pad 4->8, 2x) instead of lanes (pad 4->128, 32x).
        n = table_ref.shape[2]
        table_t = table_ref[0, :, :]                            # (C, N)
        num_chunks = idx_ref.shape[2] // tile

        def chunk(c, _):
            idx = idx_ref[0, 0, pl.ds(c * tile, tile)]          # (tile,)
            rows = jax.lax.broadcasted_iota(jnp.int32, (n, tile), 0)
            onehot_t = (rows == idx[None, :]).astype(jnp.float32)
            # (C, N) @ (N, tile) -> (C, tile). HIGHEST precision: full
            # bf16-split passes make the 0/1 x value contraction bit-exact
            # in f32; with the transposed layout the MXU is far from the
            # bottleneck, so the extra passes are nearly free.
            out_ref[0, :, pl.ds(c * tile, tile)] = jax.lax.dot_general(
                table_t, onehot_t,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return 0

        jax.lax.fori_loop(0, num_chunks, chunk, 0)

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def gather_rows(table: Array, idx: Array, interpret: bool = False) -> Array:
    """table: (B, N, C) float32; idx: (B, R) int32 in [0, N).
    Returns (B, R, C): out[b, r] = table[b, idx[b, r]].
    """
    B, N, C = table.shape
    R = idx.shape[1]
    # Chunk the in-VMEM one-hot to ~4 MB (tile * N * 4B).
    tile = min(R, max(128, (4 * 1024 * 1024 // 4) // max(N, 1)))
    while R % tile:
        tile //= 2
    tile = max(tile, 1)

    out_t = pl.pallas_call(
        _make_gather_kernel(tile),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, R), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, R), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, R), table.dtype),
        interpret=interpret,
    )(idx.astype(jnp.int32)[:, None, :],
      jnp.swapaxes(table.astype(jnp.float32), 1, 2))
    return jnp.swapaxes(out_t, 1, 2)


def _make_scatter_kernel(tile: int, n: int):
    def kernel(idx_ref, grad_ref, out_ref):
        # idx_ref:  (1, 1, R) int32; grad_ref: (1, C, R) transposed grads;
        # out_ref:  (1, C, N) transposed accumulator.
        num_chunks = idx_ref.shape[2] // tile
        out_ref[0, :, :] = jnp.zeros_like(out_ref[0, :, :])

        def chunk(c, _):
            idx = idx_ref[0, 0, pl.ds(c * tile, tile)]
            rows = jax.lax.broadcasted_iota(jnp.int32, (n, tile), 0)
            onehot_t = (rows == idx[None, :]).astype(jnp.float32)  # (N,tile)
            g_t = grad_ref[0, :, pl.ds(c * tile, tile)]            # (C,tile)
            # (C, tile) x (N, tile) contracted over tile -> (C, N).
            out_ref[0, :, :] += jax.lax.dot_general(
                g_t, onehot_t,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return 0

        jax.lax.fori_loop(0, num_chunks, chunk, 0)

    return kernel


@partial(jax.jit, static_argnames=("n", "interpret"))
def scatter_add_rows(idx: Array, grads: Array, n: int,
                     interpret: bool = False) -> Array:
    """Transpose of gather_rows: out[b, i] = sum_{r: idx[b,r]==i} grads[b,r].
    idx: (B, R) int32; grads: (B, R, C). Returns (B, n, C)."""
    B, R, C = grads.shape
    tile = min(R, max(128, (4 * 1024 * 1024 // 4) // max(n, 1)))
    while R % tile:
        tile //= 2
    tile = max(tile, 1)
    out_t = pl.pallas_call(
        _make_scatter_kernel(tile, n),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, R), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, R), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, n), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, n), grads.dtype),
        interpret=interpret,
    )(idx.astype(jnp.int32)[:, None, :],
      jnp.swapaxes(grads.astype(jnp.float32), 1, 2))
    return jnp.swapaxes(out_t, 1, 2)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows_vjp(table: Array, idx: Array,
                    interpret: bool = False) -> Array:
    """Differentiable gather_rows (backward = in-VMEM scatter-add)."""
    return gather_rows(table, idx, interpret)


def _gather_fwd(table, idx, interpret):
    return gather_rows(table, idx, interpret), (idx, table.shape[1])


def _gather_bwd(interpret, res, g):
    idx, n = res
    return scatter_add_rows(idx, g, n, interpret), None


gather_rows_vjp.defvjp(_gather_fwd, _gather_bwd)
