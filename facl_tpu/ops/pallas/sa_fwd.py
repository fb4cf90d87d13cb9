"""Full-Pallas set-abstraction stage: Pallas forward + 2-sweep Pallas
backward (``sa_impl="hybrid2"``).

Round-2 device profiling showed the hybrid path (XLA forward + Pallas
backward, ops/pallas/sa_bwd.py) wins its backward (11.8 ms vs autodiff
14.5) but loses the margin again on the forward: XLA inserts
default-layout copies for the p1/p2 residuals consumed by the Pallas
sweeps and fusion-clones the f32 top-layer affine (+3.4 ms). This module
removes that tax by producing the residuals *from Pallas* in the exact
layout the backward reads, and fuses the BatchNorm statistics reductions
into the matmul sweeps (semantics: the train-mode Dense->BN->ReLU x3 +
K-maxpool of the reference encoder, cn3d_model_conbag.py:43-88).

Four row-tile sweeps, one per BatchNorm barrier:

* Sweep 1: ``p1 = x @ W1 + b1`` written to HBM once (it is the backward's
  residual anyway) while accumulating ``sum(p1)`` / ``sum(p1^2)`` in f32.
* Sweep 2: ``h1`` recomputed in-VMEM from p1 with the folded layer-1
  affine, ``p2 = h1 @ W2 + b2`` written + its moment sums.
* Sweep 3: layer-3 statistics WITHOUT materializing the wide
  (rows, 256) pre-activation: accumulate ``Gram(h2)`` and ``colsum(h2)``
  (64x64 MXU tiles) and solve the moments in XLA via the covariance
  identity (models/sa_stage.py::covar_moments) — mean3 = mu_h2 W3 + b3,
  E[p3^2] = diag(W3^T Gram W3)/n + b3(2 mean3 - b3). The round-1 covar
  pathology was XLA *autodiff* through the Gram; here the backward is
  the hand-written 2-sweep kernel, so autodiff never sees it.
* Sweep 4: recompute ``p3`` tile-by-tile (cheaper than storing 1.3 GB),
  apply the folded layer-3 affine, ReLU, and the K-max-pool in-VMEM;
  only the (rows/K, 256) pooled tensor reaches HBM.

Forward values match the reference op sequence up to f32 reduction order
in the batch moments (tile-partial sums vs XLA's reduction tree) and the
covariance-identity round-off for layer 3 — tested at allclose rather
than the bit-equality the shared-XLA-forward hybrid satisfies. At f32
the forward matmuls run at HIGHEST MXU precision (matching the strict
parity mode of the reference path); the backward sweeps keep the default
precision — a fully-HIGHEST backward was measured at 997 clips/s vs
1658 with this split (the bf16x6 expansion also overflows scoped VMEM
at the 2048-row tile), and gradients carry no parity contract.

Input cotangent contract: ZERO, as for ``sa_train_hybrid`` — the
training step treats grouped neighborhoods as data.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from facl_tpu.ops.fused_sa import SALayerParams
from facl_tpu.ops.pallas.sa_bwd import (
    _fold_affine,
    _h_from_p,
    sa_backward_pallas,
)

Array = jax.Array
f32 = jnp.float32


def _make_layer_sweep(dtype, affine_input: bool, precision):
    """Sweep 1/2: (tile of x or p_prev) -> p_next tile + moment sums.
    ``affine_input`` selects whether the input tile is a stored
    pre-activation (recompute h via the folded affine + ReLU) or the raw
    network input (cast only)."""

    def kernel(w_ref, b_ref, mul_ref, shift_ref, in_ref,
               p_ref, s_ref, ss_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            s_ref[...] = jnp.zeros_like(s_ref)
            ss_ref[...] = jnp.zeros_like(ss_ref)

        if affine_input:
            h = _h_from_p(in_ref[...], mul_ref[0], shift_ref[0], dtype)
        else:
            h = in_ref[...].astype(dtype)
        d = jax.lax.dot_general(
            h, w_ref[...].astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=precision)
        p = d.astype(dtype) + b_ref[0].astype(dtype)[None, :]
        p_ref[...] = p
        pf = p.astype(f32)
        s_ref[0, :] += jnp.sum(pf, axis=0)
        ss_ref[0, :] += jnp.sum(pf * pf, axis=0)

    return kernel


def _make_gram_sweep(dtype, precision):
    """Sweep 3: p2 tile -> Gram(h2), colsum(h2) accumulators."""

    def kernel(mul_ref, shift_ref, p_ref, g_ref, c_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            g_ref[...] = jnp.zeros_like(g_ref)
            c_ref[...] = jnp.zeros_like(c_ref)

        h = _h_from_p(p_ref[...], mul_ref[0], shift_ref[0], dtype)
        g_ref[...] += jax.lax.dot_general(
            h, h, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=precision)
        c_ref[0, :] += jnp.sum(h.astype(f32), axis=0)

    return kernel


def _make_pool_sweep(dtype, pool: int, precision):
    """Sweep 4: p2 tile -> pooled tile (recompute p3 in-VMEM, folded
    layer-3 affine, ReLU, max over each ``pool``-row group)."""

    def kernel(w_ref, b_ref, mul2_ref, shift2_ref, mul3_ref, shift3_ref,
               p_ref, out_ref):
        h2 = _h_from_p(p_ref[...], mul2_ref[0], shift2_ref[0], dtype)
        d = jax.lax.dot_general(
            h2, w_ref[...].astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=precision)
        p3 = d.astype(dtype) + b_ref[0].astype(dtype)[None, :]
        y = (p3.astype(f32) * mul3_ref[0][None, :]
             + shift3_ref[0][None, :]).astype(dtype)
        h3 = jnp.maximum(y, jnp.zeros_like(y))
        T, C = h3.shape
        out_ref[...] = jnp.max(h3.reshape(T // pool, pool, C), axis=1)

    return kernel


def _finalize(s, ss, n):
    mean = s[0] / n
    # The E[x^2] - E[x]^2 identity can round NEGATIVE for (near-)constant
    # channels; past -eps that is rsqrt(negative) = NaN (hit by degenerate
    # all-zero synthetic videos, round-4 verify drive). Clamp at 0, like
    # torch's direct E[(x-mean)^2] formulation is by construction.
    var = jnp.maximum(ss[0] / n - mean * mean, 0.0)
    return mean, var


def sa_forward_pallas(xf: Array, layers, pool: int, eps: float, dtype,
                      interpret: bool = False):
    """The 4-sweep forward. xf: (R, C0) flattened rows in compute dtype;
    ``pool`` consecutive rows share one output row. Returns
    (pooled (R//pool, C3), stats, p1, p2)."""
    R, C0 = xf.shape
    lp1, lp2, lp3 = layers
    C1, C2, C3 = (lp.kernel.shape[1] for lp in layers)
    n = R
    # Strict f32 parity keeps full matmul precision, mirroring the
    # reference path's HIGHEST on the MXU (models/sa_stage.py); bf16
    # uses the default (inputs are already bf16).
    precision = (jax.lax.Precision.HIGHEST
                 if jnp.dtype(dtype) == jnp.float32 else None)

    # The narrow (64-lane) sweeps are grid-overhead-bound at small
    # tiles (R/T = 1280 grid steps at T=2048); bigger tiles amortize.
    # f32 mode halves them (doubled operand bytes + HIGHEST staging,
    # 16 MB scoped-VMEM limit); the pool sweep's (T, 256) f32 p3
    # recompute needs its own smaller tile.
    bf16 = jnp.dtype(dtype) != jnp.float32
    Tl = 8192 if bf16 else 4096          # layer + gram sweeps
    Tp = 4096 if bf16 else 2048          # pool sweep
    while R % Tl:
        Tl //= 2
    while Tp > pool and (R % Tp or Tp % pool):
        Tp //= 2
    if Tp < pool or R % Tp or Tp % pool:
        Tp = pool            # R = (R // pool) * pool always divides

    def row2(a):
        return jnp.asarray(a, f32).reshape(1, -1)

    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda t: (0,) * len(shape), memory_space=pltpu.VMEM)
    tile_spec = lambda rows, c: pl.BlockSpec(
        (rows, c), lambda t: (t, 0), memory_space=pltpu.VMEM)

    zero = row2(jnp.zeros((max(C0, 1),), f32))

    def layer_sweep(inp, cin, cout, lp, mul, shift, affine_input):
        return pl.pallas_call(
            _make_layer_sweep(dtype, affine_input, precision),
            grid=(R // Tl,),
            in_specs=[
                const_spec((cin, cout)), const_spec((1, cout)),
                const_spec((1, cin)), const_spec((1, cin)),
                tile_spec(Tl, cin),
            ],
            out_specs=(tile_spec(Tl, cout), const_spec((1, cout)),
                       const_spec((1, cout))),
            out_shape=(jax.ShapeDtypeStruct((R, cout), dtype),
                       jax.ShapeDtypeStruct((1, cout), f32),
                       jax.ShapeDtypeStruct((1, cout), f32)),
            interpret=interpret,
        )(lp.kernel, row2(lp.bias), mul, shift, inp)

    # Sweep 1: x -> p1 + moments. (mul/shift unused: zero rows.)
    p1, s1, ss1 = layer_sweep(xf, C0, C1, lp1, zero[:, :C0], zero[:, :C0],
                              affine_input=False)
    mean1, var1 = _finalize(s1, ss1, n)
    mul1, shift1 = _fold_affine(lp1, mean1, var1, eps)

    # Sweep 2: p1 -> p2 + moments.
    p2, s2, ss2 = layer_sweep(p1, C1, C2, lp2, row2(mul1), row2(shift1),
                              affine_input=True)
    mean2, var2 = _finalize(s2, ss2, n)
    mul2, shift2 = _fold_affine(lp2, mean2, var2, eps)

    # Sweep 3: Gram/colsum of h2 -> layer-3 moments by the covariance
    # identity (no (R, C3) tensor exists yet).
    G2, ch2 = pl.pallas_call(
        _make_gram_sweep(dtype, precision),
        grid=(R // Tl,),
        in_specs=[const_spec((1, C2)), const_spec((1, C2)),
                  tile_spec(Tl, C2)],
        out_specs=(const_spec((C2, C2)), const_spec((1, C2))),
        out_shape=(jax.ShapeDtypeStruct((C2, C2), f32),
                   jax.ShapeDtypeStruct((1, C2), f32)),
        interpret=interpret,
    )(row2(mul2), row2(shift2), p2)
    w3f = lp3.kernel.astype(f32)
    b3f = lp3.bias.astype(f32)
    # HIGHEST: tiny f32 dots with O(n) Gram entries; TPU DEFAULT rounds
    # them through bf16 (sa_bwd._layer_terms docstring).
    hp = jax.lax.Precision.HIGHEST
    mean3 = jnp.matmul(ch2[0], w3f, precision=hp) / n + b3f
    e2 = (jnp.einsum("ic,ic->c", jnp.matmul(G2, w3f, precision=hp), w3f,
                     precision=hp) / n
          + b3f * (2.0 * mean3 - b3f))
    var3 = jnp.maximum(e2 - mean3 * mean3, 0.0)  # see _finalize
    mul3, shift3 = _fold_affine(lp3, mean3, var3, eps)

    # Sweep 4: p2 -> pooled.
    pooled = pl.pallas_call(
        _make_pool_sweep(dtype, pool, precision),
        grid=(R // Tp,),
        in_specs=[
            const_spec((C2, C3)), const_spec((1, C3)),
            const_spec((1, C2)), const_spec((1, C2)),
            const_spec((1, C3)), const_spec((1, C3)),
            tile_spec(Tp, C2),
        ],
        out_specs=tile_spec(Tp // pool, C3),
        out_shape=jax.ShapeDtypeStruct((R // pool, C3), dtype),
        interpret=interpret,
    )(lp3.kernel, row2(lp3.bias), row2(mul2), row2(shift2),
      row2(mul3), row2(shift3), p2)

    stats = [(mean1, var1), (mean2, var2), (mean3, var3)]
    return pooled, stats, p1, p2


def _pf_impl(x, layers, eps, dtype, interpret):
    *lead, K, C0 = x.shape
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    xf = x.astype(dtype).reshape(rows, C0)
    pooled, stats, p1, p2 = sa_forward_pallas(
        xf, layers, K, eps, dtype, interpret)
    return pooled.reshape(*lead, -1), stats, xf, p1, p2


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def sa_train_pfwd(x: Array, layers: Tuple[SALayerParams, ...],
                  eps: float = 1e-5, dtype=jnp.float32,
                  interpret: bool = False):
    """Pallas forward + 2-sweep Pallas backward. x: (..., K, C0);
    requires exactly 3 layers. Input cotangent is ZERO by contract."""
    assert len(layers) == 3, "hybrid2 is specialized to L=3"
    pooled, stats, _, _, _ = _pf_impl(x, tuple(layers), eps, dtype,
                                      interpret)
    return pooled, stats


def _pf_fwd(x, layers, eps, dtype, interpret):
    layers = tuple(layers)
    pooled, stats, _, p1, p2 = _pf_impl(x, layers, eps, dtype, interpret)
    return (pooled, stats), (x, p1, p2, layers, stats)


def _pf_bwd(eps, dtype, interpret, res, cts):
    dpooled, _ = cts          # stats cotangent ignored (state update)
    x, p1, p2, layers, stats = res
    C0 = x.shape[-1]
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    C3 = dpooled.shape[-1]
    dlayers = sa_backward_pallas(
        x.astype(dtype).reshape(rows, C0), p1, p2, layers, stats,
        dpooled.reshape(-1, C3), eps, dtype, interpret=interpret)
    return jnp.zeros(x.shape, x.dtype), tuple(dlayers)


sa_train_pfwd.defvjp(_pf_fwd, _pf_bwd)
