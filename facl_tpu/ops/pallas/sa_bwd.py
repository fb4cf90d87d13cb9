"""Pallas 2-sweep backward for the set-abstraction stage.

Forward stays the XLA reference path (near its traffic roofline,
device-profiled); the backward replaces XLA autodiff's ~14.5 ms with two
Pallas sweeps plus small-matrix XLA algebra, built on the analytic
identities of facl_tpu.ops.analytic_sa:

* The residuals are the PRE-ACTIVATIONS p1, p2 — which the forward
  already materializes for the BatchNorm statistics barriers, so saving
  them costs nothing (saving h1/h2 instead forces XLA to materialize
  the ReLU outputs it would otherwise fuse into the next matmul —
  measured +5 ms of forward relu/convert). Hidden activations are
  recomputed in-kernel from p with the per-layer folded affines.
* Sweep 1 recomputes the top layer tile-by-tile in VMEM (the (rows, 256)
  tensors p3/y3/h3/dy3 never reach HBM) and accumulates the only
  dy3-dependent globals — u3 = sum(dy3), A3 = dy3^T @ h2 — plus the
  h2-only moments (Gram, colsum) the layer-3 algebra needs.
* Layer-3 algebra (v3, M3, rc3, dW3, ...) is solved in XLA from those
  few small matrices.
* Sweep 2 recomputes dy3 (cheaper than storing it), forms dh2/dy2
  exactly (layer-3 globals now known) and accumulates u2, A2 = dy2^T h1
  — plus every layer-1 quantity: the dy2-dependent expansion pieces
  acc1 = sum(m1*q2), P1 = (m1*q2)^T x with q2 = (gi2*dy2) @ W2^T, and
  the h/x-only moments (G1, ch1, Gx, cx, TM1 = m1^T h1, cnt1,
  T1x = m1^T x, U1[:, :, i] = (m1*x_i)^T h1). Layer 1 then follows in
  closed form: its third-order coupling tensor U1 is (C1, C1, C0) with
  the 4-wide input — while the same expansion one level up would need a
  64^3 moment (infeasible; hence exactly two sweeps).

Pool-tie semantics: the max is selected on the kernel's own f32
pre-cast activations (see analytic_sa._bwd — identical rule), split
evenly among exact ties. At bf16 compute, tie GROUPS are
value-quantization noise and compilation-dependent; gradients agree
with the JAX analytic path statistically (golden-tested at relF < 5%,
cos > 0.998) and exactly at f32.

Input cotangent contract: dx is returned as ZEROS — the training step
never differentiates w.r.t. the grouped points (they are data); use the
pure-JAX analytic path when dx is needed.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from facl_tpu.ops.fused_sa import SALayerParams

Array = jax.Array


def _fold_affine(lp: SALayerParams, mean, var, eps):
    """y = p*mul + shift (f32 per-channel) for one layer."""
    mul = jax.lax.rsqrt(var + eps) * lp.scale
    shift = lp.shift - mean * mul
    return mul, shift


def _h_from_p(p, mul, shift, dtype):
    """Recompute h = relu((p*mul + shift).astype(dtype)) — the exact
    forward elementwise chain, from the stored pre-activation."""
    y = (p.astype(jnp.float32) * mul[None, :] + shift[None, :]).astype(dtype)
    return jnp.maximum(y, jnp.zeros_like(y))


def _dy_top(h2_t, w3, b3, mul3, shift3, dpooled_t, pool, dtype):
    """Recompute the top layer for one (T, C2) tile; return dy3 (T, C3)
    f32. Max selection on the f32 pre-cast activations (module
    docstring)."""
    T = h2_t.shape[0]
    d = jax.lax.dot_general(
        h2_t.astype(dtype), w3.astype(dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    p = d.astype(dtype) + b3.astype(dtype)[None, :]
    z = p.astype(jnp.float32) * mul3[None, :] + shift3[None, :]
    h3f = jnp.maximum(z, 0.0)
    C = h3f.shape[1]
    g = T // pool
    h3g = h3f.reshape(g, pool, C)
    mx = jnp.max(h3g, axis=1, keepdims=True)
    eq = (h3g == mx)
    ties = jnp.sum(eq.astype(jnp.float32), axis=1, keepdims=True)
    dh3 = eq.astype(jnp.float32) * (
        dpooled_t.astype(jnp.float32)[:, None, :] / ties)
    m3 = (z > 0.0).reshape(g, pool, C)
    return (dh3 * m3).reshape(T, C)


def _acc0(out_ref, a, b):
    """out += a^T b contracting rows (both (T, .) in compute dtype)."""
    out_ref[...] += jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _make_sweep1_kernel(pool, dtype):
    def kernel(w3_ref, b3_ref, mul3_ref, shift3_ref, mul2_ref, shift2_ref,
               gi3_ref, w3t_ref,
               p2_ref, dpooled_ref,
               out_ref, q3_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        h2 = _h_from_p(p2_ref[...], mul2_ref[0], shift2_ref[0], dtype)
        dy3 = _dy_top(h2, w3_ref[...], b3_ref[0],
                      mul3_ref[0], shift3_ref[0],
                      dpooled_ref[...], pool, dtype)
        dy3d = dy3.astype(dtype)
        # All the small accumulations ride ONE packed matmul: separate
        # (64|256, T) x (T, 64) products run the MXU at <=50% PE
        # utilization and the row-sums the VPU; stacking left operands
        # [dy3 | h2] against right [h2 | ones] computes A3, u3, G2, ch2
        # together at full M and the sums as the ones column.
        T = h2.shape[0]
        ones = jnp.ones((T, 1), dtype)
        left = jnp.concatenate([dy3d, h2], axis=1)
        right = jnp.concatenate([h2, ones], axis=1)
        _acc0(out_ref, left, right)
        # Cache q3 = (gi3*dy3) @ W3^T for sweep 2 — (R, C2) bf16 is far
        # cheaper to stream than recomputing the 256-wide top layer a
        # second time. Cast chain matches analytic_sa (matmul result
        # rounded to the compute dtype).
        q3_ref[...] = jax.lax.dot_general(
            dy3d * gi3_ref[0].astype(dtype)[None, :],
            w3t_ref[...].astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype)

    return kernel


def _make_sweep2_kernel(pool, dtype, c0):
    def kernel(m3c_ref, rc3_ref, gi2_ref, w2t_ref,
               mul1_ref, shift1_ref, mul2_ref, shift2_ref,
               x_ref, p1_ref, p2_ref, q3_ref,
               out_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        f32 = jnp.float32
        h1 = _h_from_p(p1_ref[...], mul1_ref[0], shift1_ref[0], dtype)
        h2 = _h_from_p(p2_ref[...], mul2_ref[0], shift2_ref[0], dtype)
        # dh2 = q3 - h2 @ M3 - rc3 (q3 cached by sweep 1; analytic_sa's
        # cast chain — each matmul result rounded to the compute dtype).
        dh2 = (q3_ref[...].astype(f32)
               - jax.lax.dot_general(
                   h2, m3c_ref[...].astype(dtype),
                   dimension_numbers=(((1,), (0,)), ((), ())),
                   preferred_element_type=f32).astype(dtype).astype(f32)
               - rc3_ref[0][None, :])
        dy2 = jnp.where(h2.astype(f32) > 0.0, dh2, 0.0)
        dy2d = dy2.astype(dtype)

        # Layer-1 expansion pieces: q2 = (gi2*dy2) @ W2^T, masked by m1.
        q2 = jax.lax.dot_general(
            dy2d * gi2_ref[0].astype(dtype)[None, :],
            w2t_ref[...].astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(dtype)
        m1f = (h1.astype(f32) > 0.0)
        mqd = jnp.where(m1f, q2, jnp.zeros_like(q2))
        x_t = x_ref[...].astype(dtype)
        m1 = m1f.astype(dtype)

        # Every accumulated reduction of this sweep rides ONE packed
        # matmul. Fragmented, the (64, T) x (T, 64) products run the MXU
        # at 25% PE utilization, the x-sided ones ((T, 64) x (T, 4)) at
        # ~3%, and the row-sums burn VPU cycles; stacked
        #   left  = [dy2 | m1 | m1*q2 | m1*x_i ... | x | h1]   (T, Lw)
        #   right = [h1 | x | ones]                            (T, Rw)
        # one (Lw, T) x (T, Rw) product yields A2/u2, TM1/T1x/cnt1,
        # P1/acc1, the U1 blocks, Gx/cx and G1/ch1 at full M utilization
        # (unpacked in sa_backward_pallas; cross-block products are
        # discarded). 0/1 masks are exact in bf16 and all counts < 2^24
        # accumulate in f32, so cnt1 stays exact.
        T = h1.shape[0]
        ones = jnp.ones((T, 1), dtype)
        left = jnp.concatenate(
            [dy2d, m1, mqd] + [m1 * x_t[:, i:i + 1] for i in range(c0)]
            + [x_t, h1], axis=1)
        right = jnp.concatenate([h1, x_t, ones], axis=1)
        _acc0(out_ref, left, right)

    return kernel


def _layer_terms(A, u, lp, mean, var, G, ch, n, eps):
    """Closed-form per-layer grads + propagation matrices from the two
    dy-dependent globals (A = dy^T h_prev, u = sum dy) and h-only
    reductions (G = Gram(h_prev), ch = colsum(h_prev)). Mirrors
    analytic_sa._layer_bwd's algebra.

    Every contraction here is a tiny (<=256-wide) f32 matrix with
    entries O(n) — but on TPU the DEFAULT matmul precision rounds f32
    dots through bf16 passes (~3e-3 relative), which is the whole
    moment/grad signal. HIGHEST is forced; the cost is nothing next to
    the row sweeps (device-measured r4: the gap pair3-vs-reference f32
    forward error dropped 6.6e-3 -> ulp-level with this and the
    sa_forward_pair finalize fixed)."""
    f32 = jnp.float32
    hp = jax.lax.Precision.HIGHEST
    W = lp.kernel.astype(f32)
    b = lp.bias.astype(f32)
    gamma = lp.scale.astype(f32)
    inv = jax.lax.rsqrt(var + eps)
    gi = gamma * inv
    v = inv * (jnp.einsum("cj,jc->c", A, W, precision=hp)
               + u * (b - mean))
    HX = (jnp.matmul(G, W, precision=hp)
          + ch[:, None] * (b - mean)[None, :]) * inv[None, :]
    dW = gi[None, :] * (A.T - ch[:, None] * (u / n)[None, :]
                        - HX * (v / n)[None, :])
    sum_xhat = (jnp.matmul(ch, W, precision=hp) + n * b - n * mean) * inv
    db = -gi * sum_xhat * v / n
    s = gi * v / n
    M = jnp.matmul(W * (inv * s)[None, :], W.T, precision=hp)
    rc = jnp.matmul(gi * u / n + (b - mean) * inv * s, W.T, precision=hp)
    return dict(v=v, dW=dW, db=db, dgamma=v, dbeta=u, M=M, rc=rc, gi=gi)


def sa_backward_pallas(x, p1, p2, layers, stats, dpooled,
                       eps, dtype, interpret=False):
    """The 2-sweep backward. x (R, C0) input rows (compute dtype),
    p1/p2 (R, C) stored pre-activations, dpooled (R//pool, C3).
    Returns a tuple of SALayerParams cotangents."""
    f32 = jnp.float32
    R, C0 = x.shape
    C1, C2 = p1.shape[1], p2.shape[1]
    Rg, C3 = dpooled.shape
    pool = R // Rg
    n = R
    lp1, lp2, lp3 = layers
    (mean1, var1), (mean2, var2), (mean3, var3) = stats
    mul1, shift1 = _fold_affine(lp1, mean1, var1, eps)
    mul2, shift2 = _fold_affine(lp2, mean2, var2, eps)
    mul3, shift3 = _fold_affine(lp3, mean3, var3, eps)
    gi2 = lp2.scale.astype(f32) * jax.lax.rsqrt(var2 + eps)

    T = 2048        # device-tuned: 1024 measured ~5% slower end-to-end
    while R % T:
        T //= 2
    grid = (R // T,)
    tg = T // pool

    def row2(a):
        return jnp.asarray(a, f32).reshape(1, -1)

    w3 = lp3.kernel

    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda t: (0,) * len(shape), memory_space=pltpu.VMEM)
    tile_spec = lambda rows, c: pl.BlockSpec(
        (rows, c), lambda t: (t, 0), memory_space=pltpu.VMEM)

    def outs(*shapes):
        return (tuple(const_spec(s) for s in shapes),
                tuple(jax.ShapeDtypeStruct(s, f32) for s in shapes))

    gi3 = lp3.scale.astype(f32) * jax.lax.rsqrt(var3 + eps)
    # Packed sweep-1 output: left = [dy3 | h2], right = [h2 | ones].
    o_specs = (const_spec((C3 + C2, C2 + 1)), tile_spec(T, C2))
    o_shapes = (jax.ShapeDtypeStruct((C3 + C2, C2 + 1), f32),
                jax.ShapeDtypeStruct((R, C2), p2.dtype))
    out1, q3 = pl.pallas_call(
        _make_sweep1_kernel(pool, dtype),
        grid=grid,
        in_specs=[
            const_spec(w3.shape), const_spec((1, C3)), const_spec((1, C3)),
            const_spec((1, C3)), const_spec((1, C2)), const_spec((1, C2)),
            const_spec((1, C3)), const_spec((C3, C2)),
            tile_spec(T, C2), tile_spec(tg, C3),
        ],
        out_specs=o_specs, out_shape=o_shapes,
        interpret=interpret,
    )(w3, row2(lp3.bias), row2(mul3), row2(shift3), row2(mul2),
      row2(shift2), row2(gi3), jnp.swapaxes(w3, 0, 1).astype(f32),
      p2, dpooled)
    A3, u3 = out1[:C3, :C2], out1[:C3, C2]
    G2, ch2 = out1[C3:, :C2], out1[C3:, C2]

    t3 = _layer_terms(A3, u3, lp3, mean3, var3, G2, ch2, n, eps)

    # Packed sweep-2 output: left = [dy2 | m1 | m1*q2 | m1*x_i... | x |
    # h1], right = [h1 | x | ones] (see the kernel comment).
    Lw = C2 + (3 + C0) * C1 + C0
    Rw = C1 + C0 + 1
    out2, = pl.pallas_call(
        _make_sweep2_kernel(pool, dtype, C0),
        grid=grid,
        in_specs=[
            const_spec((C2, C2)),
            const_spec((1, C2)), const_spec((1, C2)),
            const_spec((C2, C1)),
            const_spec((1, C1)), const_spec((1, C1)),
            const_spec((1, C2)), const_spec((1, C2)),
            tile_spec(T, C0), tile_spec(T, C1), tile_spec(T, C2),
            tile_spec(T, C2),
        ],
        out_specs=(const_spec((Lw, Rw)),),
        out_shape=(jax.ShapeDtypeStruct((Lw, Rw), f32),),
        interpret=interpret,
    )(t3["M"], row2(t3["rc"]),
      row2(gi2), jnp.swapaxes(lp2.kernel, 0, 1).astype(f32),
      row2(mul1), row2(shift1), row2(mul2), row2(shift2),
      x, p1, p2, q3)
    ch, cx_col, c1s = slice(0, C1), slice(C1, C1 + C0), C1 + C0
    r = 0
    A2, u2 = out2[r:r + C2, ch], out2[r:r + C2, c1s]; r += C2
    TM1 = out2[r:r + C1, ch]
    T1x, cnt1 = out2[r:r + C1, cx_col], out2[r:r + C1, c1s]; r += C1
    P1, acc1 = out2[r:r + C1, cx_col], out2[r:r + C1, c1s]; r += C1
    # U1[c, j, i] = sum_r m1[r, c] x[r, i] h1[r, j] — the i-th stacked
    # (C1, C1) block is (m1*x_i)^T h1.
    U1 = jnp.stack([out2[r + i * C1: r + (i + 1) * C1, ch]
                    for i in range(C0)], axis=-1)    # (C1, C1, C0)
    r += C0 * C1
    Gx, cx = out2[r:r + C0, cx_col], out2[r:r + C0, c1s]; r += C0
    G1, ch1 = out2[r:r + C1, ch], out2[r:r + C1, c1s]

    t2 = _layer_terms(A2, u2, lp2, mean2, var2, G1, ch1, n, eps)

    # Layer 1 in closed form: dy1 = m1 * (q2 - h1 @ M2 - rc2).
    M2, rc2 = t2["M"], t2["rc"]
    hp = jax.lax.Precision.HIGHEST
    u1 = acc1 - jnp.einsum("cj,jc->c", TM1, M2, precision=hp) - cnt1 * rc2
    A1 = (P1 - jnp.einsum("jc,cji->ci", M2, U1, precision=hp)
          - rc2[:, None] * T1x)
    t1 = _layer_terms(A1, u1, lp1, mean1, var1, Gx, cx, n, eps)

    def as_grad(lp, t):
        return SALayerParams(
            kernel=t["dW"].astype(lp.kernel.dtype),
            bias=t["db"].astype(lp.bias.dtype),
            scale=t["dgamma"].astype(lp.scale.dtype),
            shift=t["dbeta"].astype(lp.shift.dtype))

    return (as_grad(lp1, t1), as_grad(lp2, t2), as_grad(lp3, t3))


def _forward_ps(x, layers, eps, dtype):
    """The exact _reference_4d train-mode op sequence, returning the
    pre-activations p1, p2 as residuals (materialized by the stats
    barriers anyway)."""
    h = x.astype(dtype)
    axes = tuple(range(h.ndim - 1))
    stats = []
    ps = []
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
            ps.append(p)
    pooled = jnp.max(h, axis=-2)
    return pooled, stats, ps


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def sa_train_hybrid(x: Array, layers: Tuple[SALayerParams, ...],
                    eps: float = 1e-5, dtype=jnp.float32,
                    interpret: bool = False):
    """XLA forward (exact reference op sequence) + the 2-sweep Pallas
    backward. x: (..., K, C0); requires exactly 3 layers (the sweep
    structure is depth-specific). Input cotangent is ZERO by contract —
    the neighborhoods are data in the training step; use
    sa_train_analytic when dx is needed."""
    assert len(layers) == 3, "hybrid backward is specialized to L=3"
    pooled, stats, _ = _forward_ps(x, tuple(layers), eps, dtype)
    return pooled, stats


def _h_fwd(x, layers, eps, dtype, interpret):
    layers = tuple(layers)
    pooled, stats, ps = _forward_ps(x, layers, eps, dtype)
    return (pooled, stats), (x, ps, layers, stats)


def _h_bwd(eps, dtype, interpret, res, cts):
    dpooled, _ = cts          # stats cotangent ignored (state update)
    x, ps, layers, stats = res
    p1, p2 = ps
    C0 = x.shape[-1]
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    C3 = dpooled.shape[-1]
    dlayers = sa_backward_pallas(
        x.astype(dtype).reshape(rows, C0),
        p1.reshape(rows, -1), p2.reshape(rows, -1),
        layers, stats, dpooled.reshape(-1, C3),
        eps, dtype, interpret=interpret)
    return jnp.zeros(x.shape, x.dtype), tuple(dlayers)


sa_train_hybrid.defvjp(_h_fwd, _h_bwd)
