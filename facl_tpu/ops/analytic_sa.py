"""Set-abstraction stage with an analytic (hand-derived) backward pass.

Forward semantics are IDENTICAL to ``sa_stage._reference_4d`` in train
mode: [Dense -> BatchNorm(train) -> ReLU] x L then max over the neighbor
axis (reference: cn3d_model_conbag.py:43-58 + the :218 max-pool). The
difference is the VJP: XLA's autodiff of this stack materializes the
per-layer normalized tensors and runs f32 convert+reduce chains over
them — device-profiled at ~14.5 ms of the 28.5 ms training step for the
reference workload (rows = G*B*S*K = 2.6M, widths 64/64/256). The
analytic backward restructures the math so NO (rows, C) tensor beyond
``dy`` of each layer and the already-stored activations is ever formed:

* BatchNorm backward needs, per layer, two per-channel sums
  u = sum(dy) and v = sum(dy * xhat). Since xhat is affine in
  ``h_prev @ W``, v collapses to ``diag((dy^T h_prev) @ W)`` — one
  (C, Cin) matmul instead of an elementwise product + f32 reduce over
  the widest tensor.
* The same (C, Cin) matmul transposed IS the main term of dW, and the
  mean/var correction terms collapse to ``colsum(h) (x) u`` (rank one)
  and ``(h^T h) @ W`` (a Gram matrix) — so dW never touches xhat.
* The row-broadcast corrections inside dh = dp @ W^T collapse to
  ``h @ (W diag(.) W^T)`` (a Cin x Cin matrix) plus a constant row.
* The ReLU mask of a hidden layer is recovered from the STORED
  activation (h > 0 <=> y > 0, exactly), so no mask tensor is saved;
  the top layer (never materialized in the residuals) is recomputed
  from the stored h2 with the forward's exact cast chain, so the
  max-pool tie-splitting reproduces ``jnp.max``'s gradient semantics.

Gradient contract: the returned ``stats`` are non-differentiable (they
feed the running-average state update, which the trainer never
differentiates — the same contract as flax BatchNorm variables); their
cotangent is ignored.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from facl_tpu.ops.fused_sa import SALayerParams

Array = jax.Array


def _forward_body(x: Array, layers, eps: float, dtype):
    """The exact _reference_4d train-mode op sequence. Returns
    (pooled, stats, hs) with hs = [x, h1, ..., h_{L-1}] — each layer's
    input (x kept in its own dtype so the VJP residuals stay a pure
    array pytree; hidden activations in the compute dtype)."""
    h = x.astype(dtype)
    axes = tuple(range(h.ndim - 1))
    stats = []
    hs = [x]
    for li, lp in enumerate(layers):
        p = h @ lp.kernel.astype(dtype) + lp.bias.astype(dtype)
        pf32 = p.astype(jnp.float32)
        mean = jnp.mean(pf32, axis=axes)
        mean2 = jnp.mean(jnp.square(pf32), axis=axes)
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)  # see sa_fwd._finalize
        stats.append((mean, var))
        mul = jax.lax.rsqrt(var + eps) * lp.scale
        shift = lp.shift - mean * mul
        y = (p * mul + shift).astype(dtype)
        h = jax.nn.relu(y)
        if li < len(layers) - 1:
            hs.append(h)
    pooled = jnp.max(h, axis=-2)
    return pooled, stats, hs


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def sa_train_analytic(x: Array, layers: Tuple[SALayerParams, ...],
                      eps: float = 1e-5, dtype=jnp.float32):
    """x: (..., K, C0) neighborhoods. Returns (pooled (..., C_L),
    [(mean, var)] batch stats). Same values as the reference path;
    hand-derived backward (module docstring)."""
    pooled, stats, _ = _forward_body(x, tuple(layers), eps, dtype)
    return pooled, stats


def _fwd(x, layers, eps, dtype):
    layers = tuple(layers)
    pooled, stats, hs = _forward_body(x, layers, eps, dtype)
    return (pooled, stats), (hs, layers, stats, pooled)


def _mm(a, b):
    """Matmul with f32 accumulation (inputs may be bf16)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _mm_rows(a, b):
    """a^T @ b contracting every leading (row) axis: (..., C), (..., Cin)
    -> (C, Cin), f32 accumulation. The contraction is done on the
    ORIGINAL N-D shapes — flattening to (R, C) first and contracting
    dim 0 makes XLA materialize a (C, R) transpose of the 2.6M-row
    operands as a while+dynamic-update-slice loop (device-profiled at
    ~25 ms/step); the N-D form lowers to the same native reduction
    autodiff's weight gradients use."""
    dims = tuple(range(a.ndim - 1))
    return jax.lax.dot_general(
        a, b, dimension_numbers=((dims, dims), ((), ())),
        preferred_element_type=jnp.float32)


def _layer_bwd(dy: Array, h_prev: Array, lp: SALayerParams,
               mean: Array, var: Array, eps: float, dtype):
    """Backward through one Dense+BN(train)+ReLU given dy = dL/dy
    (already ReLU-masked): dy (..., C), h_prev (..., Cin) — kept N-D,
    see _mm_rows.

    Returns (dW, db, dgamma, dbeta, dh_prev (..., Cin))."""
    f32 = jnp.float32
    n = 1
    for d in dy.shape[:-1]:
        n *= d
    rows_axes = tuple(range(dy.ndim - 1))

    W = lp.kernel.astype(f32)
    b = lp.bias.astype(f32)
    gamma = lp.scale.astype(f32)
    inv = jax.lax.rsqrt(var + eps)
    gi = gamma * inv

    dyd = dy.astype(dtype)
    u = jnp.sum(dy.astype(f32), axis=rows_axes)                          # (C,)
    # A = dy^T @ h_prev — serves v (via diag(A @ W)) AND dW's main term.
    A = _mm_rows(dyd, h_prev)                                    # (C, Cin)
    # v = sum(dy * xhat) = inv * (diag(A @ W) + u * (b - mean)).
    # HIGHEST on the tiny f32 term dots: TPU DEFAULT rounds f32 matmuls
    # through bf16 and the Gram entries are O(n) (sa_bwd._layer_terms).
    hp = jax.lax.Precision.HIGHEST
    v = inv * (jnp.einsum("cj,jc->c", A, W, precision=hp)
               + u * (b - mean))

    # colsum(h) and Gram(h) stand in for every h^T @ xhat contraction.
    ch = jnp.sum(h_prev.astype(f32), axis=rows_axes)                     # (Cin,)
    Gh = _mm_rows(h_prev, h_prev)                                # (Cin,Cin)
    HX = (jnp.matmul(Gh, W, precision=hp)
          + ch[:, None] * (b - mean)[None, :]) * inv[None, :]

    dW = gi[None, :] * (A.T - ch[:, None] * (u / n)[None, :]
                        - HX * (v / n)[None, :])
    # sum(xhat) is exactly 0 in real arithmetic (mean = colsum(p)/n);
    # the float residue reproduces autodiff's noise-level db.
    sum_xhat = (jnp.matmul(ch, W, precision=hp) + n * b - n * mean) * inv
    db = -gi * sum_xhat * v / n

    # dh = (gi*dy) @ W^T - row_const - (h @ M + const): the xhat-carried
    # correction is affine in h because xhat is affine in h @ W.
    s = gi * v / n                                               # (C,)
    M = jnp.matmul(W * (inv * s)[None, :], W.T, precision=hp)    # (Cin,Cin)
    row_const = jnp.matmul(gi * u / n + (b - mean) * inv * s, W.T,
                           precision=hp)                         # (Cin,)
    dh_prev = ((dyd * gi.astype(dtype)) @ W.T.astype(dtype)
               - h_prev @ M.astype(dtype)
               - row_const).astype(f32)
    return dW, db, v, u, dh_prev


def _bwd(eps, dtype, res, cts):
    dpooled, _ = cts          # stats cotangent ignored (state update)
    hs, layers, stats, pooled = res
    x_shape, x_dtype = hs[0].shape, hs[0].dtype
    # Layer inputs in the compute dtype (hs[0] is the uncast x).
    hs = [hs[0].astype(dtype)] + list(hs[1:])
    L = len(layers)
    f32 = jnp.float32

    # Recompute the top layer. The max-pool subgradient SELECTS on the
    # f32 pre-cast activations: selecting on the compute-dtype values
    # would create large tie groups at bf16 (coarse buckets), and tie
    # structure is then compilation-dependent — a separately-compiled
    # recompute (the Pallas backward) forms different groups than the
    # forward and the gradients drift. On f32 values, ties only occur
    # for genuinely duplicate rows, identically in every recompute.
    # (The torch reference routes pool gradients to a single argmax —
    # utils_my-style F.max_pool backward — so concentrating rather than
    # dtype-bucket-splitting is also the closer-to-reference choice.)
    lp = layers[L - 1]
    mean, var = stats[L - 1]
    h_prev = hs[L - 1]
    p = h_prev @ lp.kernel.astype(dtype) + lp.bias.astype(dtype)
    mul = jax.lax.rsqrt(var + eps) * lp.scale
    shift = lp.shift - mean * mul
    z = p.astype(f32) * mul + shift                  # f32 pre-cast y
    h_topf = jnp.maximum(z, 0.0)
    mx = jnp.max(h_topf, axis=-2, keepdims=True)
    eq = (h_topf == mx)
    ties = jnp.sum(eq.astype(f32), axis=-2, keepdims=True)
    dh = eq.astype(f32) * (dpooled.astype(f32)[..., None, :] / ties)
    dy = (dh * (z > 0)).astype(dtype)


    dlayers = [None] * L
    dx = None
    for li in range(L - 1, -1, -1):
        lp = layers[li]
        mean, var = stats[li]
        dW, db, dgamma, dbeta, dh_prev = _layer_bwd(
            dy, hs[li], lp, mean, var, eps, dtype)
        dlayers[li] = SALayerParams(
            kernel=dW.astype(lp.kernel.dtype),
            bias=db.astype(lp.bias.dtype),
            scale=dgamma.astype(lp.scale.dtype),
            shift=dbeta.astype(lp.shift.dtype))
        if li > 0:
            # Stored activations give the exact mask: h > 0 <=> y > 0.
            dy = (dh_prev * (hs[li] > 0)).astype(dtype)
        else:
            dx = dh_prev
    return (dx.astype(x_dtype), tuple(dlayers))


sa_train_analytic.defvjp(_fwd, _bwd)
