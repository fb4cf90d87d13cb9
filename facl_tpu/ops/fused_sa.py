"""Fused set-abstraction stage: [Dense -> BatchNorm(train) -> ReLU] x L
followed by a max-pool over the neighbor axis.

This module defines the op's exact semantics as a pure-JAX reference
(``sa_train_reference``) numerically matching the flax
``PointMLP`` + ``jnp.max`` path used by the encoders, and dispatches to the
Pallas TPU kernels (facl_tpu.ops.pallas.sa_kernel) that compute the same
thing without materializing the (rows, width) intermediates in HBM — the
training step's dominant memory traffic.

Parameter layout: ``layers`` is a tuple of (W (Cin, Cout), b, gamma, beta)
per Dense+BN pair. Stats are computed in float32 regardless of the compute
dtype (as flax does); the returned (mean, var) per layer feed the caller's
running-stat updates.
"""
from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class SALayerParams(NamedTuple):
    kernel: Array     # (Cin, Cout)
    bias: Array       # (Cout,)
    scale: Array      # (Cout,) BN gamma
    shift: Array      # (Cout,) BN beta


def _bn_train(p: Array, eps: float) -> Tuple[Array, Array, Array]:
    """Batch statistics in f32 over all leading axes (flax convention).
    Returns (normalized (same dtype as p), mean, var)."""
    pf = p.astype(jnp.float32)
    mean = jnp.mean(pf, axis=0)
    # max(.., 0): the E[x^2]-E[x]^2 identity rounds negative on
    # (near-)constant channels; past -eps that's rsqrt(negative)=NaN.
    var = jnp.maximum(jnp.mean(jnp.square(pf), axis=0) - jnp.square(mean),
                      0.0)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (pf - mean) * inv
    return xhat, mean, var


def sa_train_reference(
    x: Array,
    layers: Sequence[SALayerParams],
    pool_size: int,
    eps: float = 1e-5,
    compute_dtype=jnp.float32,
) -> Tuple[Array, List[Tuple[Array, Array]]]:
    """Reference forward (train mode).

    x: (R, C0) rows; R must be a multiple of pool_size.
    Returns (pooled (R // pool_size, C_last), [(mean, var)] per layer).
    """
    h = x.astype(compute_dtype)
    stats = []
    for lp in layers:
        p = (h @ lp.kernel.astype(compute_dtype)
             + lp.bias.astype(compute_dtype))
        xhat, mean, var = _bn_train(p, eps)
        y = (xhat * lp.scale.astype(jnp.float32)
             + lp.shift.astype(jnp.float32)).astype(compute_dtype)
        h = jax.nn.relu(y)
        stats.append((mean, var))
    R, C = h.shape
    pooled = jnp.max(h.reshape(R // pool_size, pool_size, C), axis=1)
    return pooled, stats


def sa_eval_reference(
    x: Array,
    layers: Sequence[SALayerParams],
    running: Sequence[Tuple[Array, Array]],
    pool_size: int,
    eps: float = 1e-5,
    compute_dtype=jnp.float32,
) -> Array:
    """Eval-mode forward using running statistics."""
    h = x.astype(compute_dtype)
    for lp, (mean, var) in zip(layers, running):
        p = (h @ lp.kernel.astype(compute_dtype)
             + lp.bias.astype(compute_dtype)).astype(jnp.float32)
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
        y = ((p - mean) * inv * lp.scale + lp.shift).astype(compute_dtype)
        h = jax.nn.relu(y)
    R, C = h.shape
    return jnp.max(h.reshape(R // pool_size, pool_size, C), axis=1)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def sa_train_fused(
    x: Array,
    layers: Tuple[SALayerParams, ...],
    pool_size: int,
    eps: float = 1e-5,
    compute_dtype=jnp.float32,
    interpret: bool = False,
    need_dx: bool = True,
):
    """Pallas fused SA with a fused backward (custom VJP). Differentiable
    w.r.t. x and every layer parameter; the (mean, var) stats output is a
    non-differentiable aux (stop-gradient), matching flax BN's treatment
    of running statistics."""
    from facl_tpu.ops.pallas.sa_kernel import sa_train_forward_unified
    pooled, stats, _ = sa_train_forward_unified(
        x, layers, pool_size, eps, compute_dtype, interpret)
    return pooled, stats


def _sa_fused_fwd(x, layers, pool_size, eps, compute_dtype, interpret,
                  need_dx):
    # jax >= 0.9: fwd receives the primal's original signature (nondiff
    # args in place); bwd receives the nondiff args first.
    from facl_tpu.ops.pallas.sa_kernel import sa_train_forward_unified
    pooled, stats, packed = sa_train_forward_unified(
        x, layers, pool_size, eps, compute_dtype, interpret)
    return (pooled, stats), (x, layers, packed)


def _sa_fused_bwd(pool_size, eps, compute_dtype, interpret, need_dx, res,
                  cts):
    from facl_tpu.ops.pallas.sa_kernel import sa_train_backward_unified
    x, layers, packed = res
    dpooled, _ = cts                     # stats cotangent ignored (aux)
    dx, grads = sa_train_backward_unified(
        x, layers, packed, dpooled, pool_size, eps, compute_dtype,
        interpret, need_dx)
    if dx is None:
        dx = jnp.zeros_like(x, dtype=jnp.float32)
    dlayers = tuple(
        SALayerParams(kernel=dw.astype(lp.kernel.dtype),
                      bias=db.astype(lp.bias.dtype),
                      scale=dg.astype(lp.scale.dtype),
                      shift=dbe.astype(lp.shift.dtype))
        for lp, (dw, db, dg, dbe) in zip(layers, grads))
    return dx.astype(x.dtype), dlayers


sa_train_fused.defvjp(_sa_fused_fwd, _sa_fused_bwd)


def sa_train(
    x: Array,
    layers: Tuple[SALayerParams, ...],
    pool_size: int,
    eps: float = 1e-5,
    compute_dtype=jnp.float32,
    impl: str = "auto",
):
    """Dispatching fused SA (train mode). impl: auto | reference | pallas."""
    use_pallas = impl == "pallas" or (
        impl == "auto" and jax.default_backend() not in ("cpu", "gpu"))
    if use_pallas:
        return sa_train_fused(x, layers, pool_size, eps, compute_dtype)
    return sa_train_reference(x, layers, pool_size, eps, compute_dtype)
