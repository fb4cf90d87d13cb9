"""Paired-row (full-lane-width) set-abstraction stage: ``sa_impl="pair"``.

The SA trunk is 64 channels wide, but the TPU vector unit is 8x128
lanes and the MXU a 128x128 systolic array: every elementwise op on a
(rows, 64) tile runs at 50% lane utilization (Mosaic pads the last dim
to the native 128-lane tile), the (T,64)x(64,64) layer matmul feeds the
MXU at 25% PE utilization, and ops against the 4-wide input at ~3%.

This module runs the whole hybrid2 pipeline (ops/pallas/sa_fwd.py +
sa_bwd.py — semantics: the train-mode Dense->BN->ReLU x3 + K-maxpool of
the reference encoder, cn3d_model_conbag.py:43-88) in a *paired-row
layout*: original rows r and r + R/2 ride side-by-side as one
(R/2, 2C) array, and every weight matrix becomes its 2x2 block-diagonal
``[[W, 0], [0, W]]``. Per-element results are EXACTLY the original
values — the off-diagonal zeros contribute exact zeros to the f32 MXU
accumulation — while every elementwise op runs at full 128-lane width
and the layer matmuls at full MXU occupancy ((T/2,128)x(128,128) does
2x the nominal FLOPs of (T,64)x(64,64) but 4x the useful work per
cycle).

Layout invariants:

* Pairing is (r, r + R/2), so a paired row tile is two block-index maps
  into the SAME rows array (no interleave shuffle anywhere).
* ``pool`` consecutive rows share one output row, and R/2 is a multiple
  of ``pool`` whenever the pooled-row count P is even — so a pool group
  lives entirely in one half: paired pooling is the ordinary
  (T//pool, pool, 2C) max, producing pooled rows [g | g + P/2] side by
  side, un-paired by one cheap XLA concat (and the cotangent re-paired
  by its transpose).
* BatchNorm moments accumulate as (1, 2C) lane sums and are folded
  (left + right) on the host — a reduction-order change vs the
  unpaired sweeps, within the same allclose parity bar as hybrid2's
  tile-partial sums.
* The p2 residual is written and re-read in paired layout; p1 is never
  materialized (the backward recomputes it from x, _p1_from_xp); only
  x, pooled, and dpooled cross the pairing boundary.

The forward is TWO Pallas sweeps (+ one cheap XLA pass): layer-1 BN
moments come from the covariance identity on Gram(x)/colsum(x) — XLA
computes them over the C0=4-wide input before any sweep — so layers 1
and 2 run as ONE fused sweep (x -> p2 + p2 moments, p1 consumed
in-VMEM and one fewer BN barrier); the merged Gram+pool sweep emits
the Gram(h2)/colsum(h2) accumulators AND the raw-p3 pool candidates
(max/min + first-index residuals) in one pass over p2, with the
layer-3 affine applied in XLA once its moments finalize
(_make_gram_pool_sweep — exact, by monotone-commutation with the
pool). The x-touching sweeps need paired variants (the input halves
arrive as two operands, and the non-slim backward's layer-1 coupling
blocks (m1*x_i)^T h1 need each half's x column broadcast over its own
64 lanes); the backward sweeps are padding-tight rewrites (see each
kernel's docstring).

Two backward modes (``slim``, exposed as ``sa_impl="pair3"``):

* slim=False — the TPU-verified 2-sweep backward: sweep 2 carries the
  layer-1 third-order moment blocks (m1*x_i)^T h1 so the dy1
  contraction can be reassembled on the host after the layer-2
  propagation terms M2/rc2 are known.
* slim=True — a 3-sweep rewrite: sweep 2 drops the coupling blocks
  (512 of its 896 left lanes plus their broadcast-multiply build);
  once its A2/u2 accumulators fix M2/rc2 on the host, a cheap sweep 3
  forms dy1 = m1*(q2 - h1 M2 - rc2) directly and contracts it with x,
  and the dy-independent input Gram/colsum ride along in forward
  sweep 1.

Input cotangent contract: ZERO, like hybrid/hybrid2 — grouped
neighborhoods are data in the training step.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from facl_tpu.ops.fused_sa import SALayerParams
from facl_tpu.ops.pallas.sa_bwd import (
    _acc0,
    _fold_affine,
    _h_from_p,
    _layer_terms,
)
from facl_tpu.ops.pallas.sa_fwd import _finalize

Array = jax.Array
f32 = jnp.float32


def _pair2(v):
    """(C,) per-channel vector -> (1, 2C) f32 row [v | v]."""
    v = jnp.asarray(v, f32).reshape(-1)
    return jnp.concatenate([v, v]).reshape(1, -1)


def _blkdiag(w):
    """(a, b) -> (2a, 2b) f32 block-diagonal [[w, 0], [0, w]]."""
    w = jnp.asarray(w, f32)
    a, b = w.shape
    z = jnp.zeros_like(w)
    return jnp.concatenate(
        [jnp.concatenate([w, z], axis=1),
         jnp.concatenate([z, w], axis=1)], axis=0)


def _fold2(block, a, b):
    """Sum the two on-diagonal (a, b) sub-blocks of a (2a, 2b) paired
    accumulator block (the off-diagonal cross products are discarded)."""
    return block[:a, :b] + block[a:, b:]


def _foldlanes(v, c):
    """(1, 2c) paired lane accumulator -> (1, c) left + right halves."""
    return v[:, :c] + v[:, c:]


def _make_pair_layer12_kernel(dtype, precision, cf: bool):
    """Fused forward sweep 1+2: paired input tile -> p1 AND p2 tiles in
    one pass, plus p2's moment sums. ``cf`` selects channels-first
    (1, C0, T) blocks — the fused select+gather kernel's native layout —
    contracted over the channel (sublane) axis directly, so no XLA
    transpose of the (rows, C) input ever materializes.

    The fusion is possible because the layer-1 folded affine
    (mul1/shift1) is already known when the sweep launches: the layer-1
    BN moments come from the covariance identity on Gram(x)/colsum(x),
    computed by XLA in one pass over the C0=4-wide input (~1% of one
    residual's bytes) BEFORE the sweep — see sa_forward_pair. Compared
    to the round-2 two-sweep forward this removes one full HBM read of
    the p1 residual and one BN launch barrier. Round 4: p1 is not
    written to HBM AT ALL — the backward sweeps recompute it from the x
    tiles they already stream (_p1_from_xp: an 8-deep contraction,
    ~1% of the trunk MACs vs the ~670 MB/step its write+read cost)."""

    def kernel(w1_ref, b1_ref, mul1_ref, shift1_ref, w2_ref, b2_ref,
               lo_ref, hi_ref, p2_ref, s_ref, ss_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            s_ref[...] = jnp.zeros_like(s_ref)
            ss_ref[...] = jnp.zeros_like(ss_ref)

        if cf:
            # (2C0, T) stacked halves; contract sublanes against the
            # block-diagonal weight's rows — (T, 2C1) comes out directly.
            xcf = jnp.concatenate([lo_ref[0], hi_ref[0]],
                                  axis=0).astype(dtype)
            d = jax.lax.dot_general(
                xcf, w1_ref[...].astype(dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32, precision=precision)
        else:
            xp = jnp.concatenate([lo_ref[...], hi_ref[...]],
                                 axis=1).astype(dtype)
            d = jax.lax.dot_general(
                xp, w1_ref[...].astype(dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=precision)
        p1 = d.astype(dtype) + b1_ref[0].astype(dtype)[None, :]
        h1 = _h_from_p(p1, mul1_ref[0], shift1_ref[0], dtype)
        d2 = jax.lax.dot_general(
            h1, w2_ref[...].astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=precision)
        p2 = d2.astype(dtype) + b2_ref[0].astype(dtype)[None, :]
        p2_ref[...] = p2
        pf = p2.astype(f32)
        s_ref[0, :] += jnp.sum(pf, axis=0)
        ss_ref[0, :] += jnp.sum(pf * pf, axis=0)

    return kernel


def _make_gram_pool_sweep(dtype, pool: int, precision):
    """Merged forward sweep 3 (round 4): ONE pass over the p2 residual
    produces BOTH the layer-3 moment inputs (Gram(h2)/colsum(h2)
    accumulators) and the pool candidates — per (pool group, channel)
    the max AND min of the raw paired ``p3 = h2 @ W3 + b3`` with their
    first-row in-group indices. Replaces rounds 2-3's separate Gram
    sweep + pool sweep: one fewer full HBM read of p2p and one fewer BN
    launch barrier.

    The layer-3 folded affine is NOT needed in-kernel: the pooled
    activation is max over relu(bf16(p3_f32*mul3 + shift3)), a
    per-channel monotone chain in p3 — nondecreasing when mul3 >= 0,
    nonincreasing when mul3 < 0 — and a max commutes EXACTLY with a
    monotone f even under rounding (f(x_max) >= f(x_i) elementwise). So
    XLA selects max or min per channel once mean3/var3 finalize from
    the Gram accumulators and applies the affine to one row per group
    (sa_forward_pair), bit-identical to the in-kernel form for
    mul3 != 0.

    The index residual feeds backward sweep 1's dy3 rebuild (one
    compare per element instead of recomputing the wide top layer).
    Routing is winner-take-all (first max row) — the reference's own
    semantics (torch max_pool backward routes to the argmax,
    cn3d_model_conbag.py:80); the ReLU-dead sentinel (``pool`` when the
    group's activation never exceeds 0) is applied in XLA where zstar
    is known. For ties caused by duplicated input rows (ball-query
    centroid padding makes these common) every accumulated
    weight-gradient bilinear form is exactly invariant to how dpooled
    is distributed among the tied rows, since their h/x/mask values are
    identical; the tie SET on p3 equals the tie set on z for any
    mul3 != 0 (the affine is injective per channel)."""

    def kernel(w_ref, b_ref, mul2_ref, shift2_ref, p_ref,
               g_ref, c_ref, mx_ref, mn_ref, imx_ref, imn_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            g_ref[...] = jnp.zeros_like(g_ref)
            c_ref[...] = jnp.zeros_like(c_ref)

        h2 = _h_from_p(p_ref[...], mul2_ref[0], shift2_ref[0], dtype)
        g_ref[...] += jax.lax.dot_general(
            h2, h2, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=precision)
        c_ref[0, :] += jnp.sum(h2.astype(f32), axis=0)
        d = jax.lax.dot_general(
            h2, w_ref[...].astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=precision)
        p3 = d.astype(dtype) + b_ref[0].astype(dtype)[None, :]
        T, C = p3.shape
        g = T // pool
        # Extrema + in-group first-index residuals. All in f32 with
        # keepdims broadcasting — the exact op pattern of the r2/r3 pool
        # sweep (Mosaic rejects bf16 vector compares and relayouts of
        # squeezed-axis broadcasts); the f32 upcast of bf16 p3 is exact,
        # so bf16(max of upcasts) == max of the bf16 values.
        pgf = p3.astype(f32).reshape(g, pool, C)
        mxf = jnp.max(pgf, axis=1, keepdims=True)
        mnf = jnp.min(pgf, axis=1, keepdims=True)
        mx_ref[...] = mxf[:, 0, :].astype(dtype)
        mn_ref[...] = mnf[:, 0, :].astype(dtype)
        io = jax.lax.broadcasted_iota(jnp.int32, (g, pool, C),
                                      1).astype(f32)
        imx_ref[...] = jnp.min(jnp.where(pgf == mxf, io, float(pool)),
                               axis=1).astype(dtype)
        imn_ref[...] = jnp.min(jnp.where(pgf == mnf, io, float(pool)),
                               axis=1).astype(dtype)

    return kernel


def _make_sweep1_pair_kernel(pool, dtype):
    """Backward sweep 1, paired and padding-free: dy3 is rebuilt from
    the forward's argmax residual (one compare per element — the wide
    top layer is never recomputed), the only accumulated matmul is
    A3 = dy3^T h2 with the right operand exactly 2*C2 lanes — the
    unpaired kernel's packed [dy3 | h2] x [h2 | ones] form pays for its
    paired ones column with a 129 -> 256 lane pad (1.7x the MACs) —
    u3 = sum(dy3) rides a VPU lane accumulator, and Gram(h2) /
    colsum(h2) are NOT recomputed at all: the forward's sweep-3
    accumulators are reused as residuals."""

    def kernel(mul2_ref, shift2_ref, gi3_ref, w3t_ref,
               p2_ref, dpooled_ref, idx_ref,
               a_ref, u_ref, q3_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            a_ref[...] = jnp.zeros_like(a_ref)
            u_ref[...] = jnp.zeros_like(u_ref)

        h2 = _h_from_p(p2_ref[...], mul2_ref[0], shift2_ref[0], dtype)
        T = h2.shape[0]
        g = T // pool
        C = dpooled_ref.shape[1]
        iof = jax.lax.broadcasted_iota(jnp.int32, (g, pool, C),
                                       1).astype(f32)
        sel = iof == idx_ref[...].astype(f32).reshape(g, 1, C)
        dy3 = jnp.where(
            sel, dpooled_ref[...].astype(f32).reshape(g, 1, C),
            0.0).reshape(T, C)
        dy3d = dy3.astype(dtype)
        _acc0(a_ref, dy3d, h2)
        u_ref[0, :] += jnp.sum(dy3, axis=0)
        # Cache q3 = (gi3*dy3) @ W3^T for sweep 2 (sa_bwd sweep-1 note:
        # streaming (R, C2) bf16 beats recomputing the wide top layer).
        q3_ref[...] = jax.lax.dot_general(
            dy3d * gi3_ref[0].astype(dtype)[None, :],
            w3t_ref[...].astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(dtype)

    return kernel


def _xp_from_halves(lo_ref, hi_ref, c0, cf, dtype):
    """Paired (T, 2C0) x tile from the two half operands. Channels-first
    halves arrive as (1, C0, T) blocks and are transposed in-VMEM via a
    tiny identity matmul (8x8) — Mosaic has no cheap vector transpose,
    but an 8-deep MXU contraction is free next to the real matmuls."""
    if cf:
        xcf = jnp.concatenate([lo_ref[0], hi_ref[0]],
                              axis=0).astype(dtype)
        cc = 2 * c0
        eye = (jax.lax.broadcasted_iota(jnp.int32, (cc, cc), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (cc, cc), 1)
               ).astype(dtype)
        return jax.lax.dot_general(
            xcf, eye, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32).astype(dtype)
    return jnp.concatenate([lo_ref[...], hi_ref[...]],
                           axis=1).astype(dtype)


def _p1_from_xp(xp, w1_ref, b1_ref, dtype, precision):
    """Recompute the paired layer-1 pre-activation from the x tile. The
    p1 residual is not stored (round 4): this contraction is only
    2*C0 = 8 deep — ~1% of the trunk MACs — versus the ~670 MB/step its
    HBM write+read cost at the reference workload. Same op/cast chain
    as the forward sweep (f32 MXU accumulate at the same precision,
    cast to compute dtype, add the cast bias), so the recomputed h1 and
    its ReLU mask match the forward's to the last ulp in the row-major
    layout (channels-first forward contracts the (2C0, T) block's
    sublanes directly — same 8 products, same f32 accumulation)."""
    d = jax.lax.dot_general(
        xp, w1_ref[...].astype(dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32, precision=precision)
    return d.astype(dtype) + b1_ref[0].astype(dtype)[None, :]


def _make_sweep2_pair_kernel(pool, dtype, c0, c1, cf: bool = False,
                             precision=None):
    """Backward sweep 2 in paired layout — sa_bwd._make_sweep2_kernel
    with (a) the input halves arriving as two operands and (b) each
    half's x column broadcast over its own c1 lanes in the layer-1
    coupling blocks. ``cf`` takes channels-first (1, C0, T) halves and
    transposes them in-VMEM via a tiny identity matmul (8x8).

    The accumulations split into TWO packed matmuls instead of sa_bwd's
    one: paired, the single [.. | x | ones] right operand is 2*C0+2*C1+1
    = 137 lanes -> a 256-lane pad that nearly doubles the sweep's MACs.
    Split by right operand, each side is padding-tight:
      main: [dy2 | m1 | m1*x_i ... | h1] x [h1]        (2C2+2C1(C0+2), 2C1)
      aux:  [dy2 | m1 | m1*q2 | x | h1] x [x | ones]   (.., 2C0+1 -> 128)
    yielding A2/TM1/U1/G1 (main) and u2/T1x/cnt1/P1/acc1/Gx/cx/ch1
    (aux); cross-block products are discarded at unpack."""

    def kernel(m3c_ref, rc3_ref, gi2_ref, w2t_ref,
               mul1_ref, shift1_ref, mul2_ref, shift2_ref,
               w1_ref, b1_ref,
               lo_ref, hi_ref, p2_ref, q3_ref,
               outm_ref, outa_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            outm_ref[...] = jnp.zeros_like(outm_ref)
            outa_ref[...] = jnp.zeros_like(outa_ref)

        xp = _xp_from_halves(lo_ref, hi_ref, c0, cf, dtype)
        p1 = _p1_from_xp(xp, w1_ref, b1_ref, dtype, precision)
        h1 = _h_from_p(p1, mul1_ref[0], shift1_ref[0], dtype)
        h2 = _h_from_p(p2_ref[...], mul2_ref[0], shift2_ref[0], dtype)
        dh2 = (q3_ref[...].astype(f32)
               - jax.lax.dot_general(
                   h2, m3c_ref[...].astype(dtype),
                   dimension_numbers=(((1,), (0,)), ((), ())),
                   preferred_element_type=f32).astype(dtype).astype(f32)
               - rc3_ref[0][None, :])
        dy2 = jnp.where(h2.astype(f32) > 0.0, dh2, 0.0)
        dy2d = dy2.astype(dtype)

        q2 = jax.lax.dot_general(
            dy2d * gi2_ref[0].astype(dtype)[None, :],
            w2t_ref[...].astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(dtype)
        m1f = (h1.astype(f32) > 0.0)
        mqd = jnp.where(m1f, q2, jnp.zeros_like(q2))
        m1 = m1f.astype(dtype)

        # Paired left/right stacks (module docstring): per original
        # input channel i, the left half's lanes see x_left[:, i] and
        # the right half's x_right[:, i].
        T = h1.shape[0]
        xi_blocks = [
            m1 * jnp.concatenate(
                [jnp.broadcast_to(xp[:, i:i + 1], (T, c1)),
                 jnp.broadcast_to(xp[:, c0 + i:c0 + i + 1], (T, c1))],
                axis=1)
            for i in range(c0)
        ]
        ones = jnp.ones((T, 1), dtype)
        leftm = jnp.concatenate([dy2d, m1] + xi_blocks + [h1], axis=1)
        _acc0(outm_ref, leftm, h1)
        lefta = jnp.concatenate([dy2d, m1, mqd, xp, h1], axis=1)
        _acc0(outa_ref, lefta, jnp.concatenate([xp, ones], axis=1))

    return kernel


def _make_sweep2_slim_kernel(dtype, c0, cf: bool = False,
                             precision=None):
    """Backward sweep 2, slim: recompute h1 (from the x tile — p1 is
    not stored, see _p1_from_xp) and h2, form dy2 from the cached q3,
    accumulate ONE padding-tight packed matmul [dy2 | h1]^T h1 (the A2
    and G1 = Gram(h1) blocks) with u2/ch1 as VPU lane sums, and write
    the mq = m1*q2 residual for sweep 3.

    The unpaired kernel's layer-1 coupling blocks (m1*x_i)^T h1 — 512
    of its 896 left lanes plus their broadcast-multiply build — are
    gone: they existed only because the layer-2 propagation terms
    M2/rc2 aren't known mid-sweep, so the dy1 contraction had to be
    left in third-order-moment form. Sweep 3 forms dy1 directly
    instead; the dy-independent Gram(x)/colsum(x) ride in forward
    sweep 1."""

    def kernel(m3c_ref, rc3_ref, gi2_ref, w2t_ref,
               mul1_ref, shift1_ref, mul2_ref, shift2_ref,
               w1_ref, b1_ref,
               lo_ref, hi_ref, p2_ref, q3_ref,
               out_ref, sums_ref, mq_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
            sums_ref[...] = jnp.zeros_like(sums_ref)

        xp = _xp_from_halves(lo_ref, hi_ref, c0, cf, dtype)
        p1 = _p1_from_xp(xp, w1_ref, b1_ref, dtype, precision)
        h1 = _h_from_p(p1, mul1_ref[0], shift1_ref[0], dtype)
        h2 = _h_from_p(p2_ref[...], mul2_ref[0], shift2_ref[0], dtype)
        dh2 = (q3_ref[...].astype(f32)
               - jax.lax.dot_general(
                   h2, m3c_ref[...].astype(dtype),
                   dimension_numbers=(((1,), (0,)), ((), ())),
                   preferred_element_type=f32).astype(dtype).astype(f32)
               - rc3_ref[0][None, :])
        dy2 = jnp.where(h2.astype(f32) > 0.0, dh2, 0.0)
        dy2d = dy2.astype(dtype)

        q2 = jax.lax.dot_general(
            dy2d * gi2_ref[0].astype(dtype)[None, :],
            w2t_ref[...].astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(dtype)
        mq_ref[...] = jnp.where(h1.astype(f32) > 0.0, q2,
                                jnp.zeros_like(q2))

        c2 = dy2.shape[1]
        _acc0(out_ref, jnp.concatenate([dy2d, h1], axis=1), h1)
        sums_ref[0, :c2] += jnp.sum(dy2, axis=0)
        sums_ref[0, c2:] += jnp.sum(h1.astype(f32), axis=0)

    return kernel


def _make_sweep3_pair_kernel(dtype, c0, cf: bool = False,
                             precision=None):
    """Backward sweep 3: with M2/rc2 fixed by sweep 2's accumulators,
    dy1 = m1 * (q2 - h1 @ M2 - rc2) is one matmul + compare away from
    the residuals (mq = m1*q2 from sweep 2, h1 recomputed from the x
    tile — p1 is not stored, see _p1_from_xp), and the whole layer-1
    dy-contraction is the padding-tight
    dy1^T [x | ones] -> packed [A1 | u1] (2C1, 2C0+1)."""

    def kernel(m2c_ref, rc2_ref, mul1_ref, shift1_ref,
               w1_ref, b1_ref, lo_ref, hi_ref, mq_ref, out_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        xp = _xp_from_halves(lo_ref, hi_ref, c0, cf, dtype)
        p1 = _p1_from_xp(xp, w1_ref, b1_ref, dtype, precision)
        h1 = _h_from_p(p1, mul1_ref[0], shift1_ref[0], dtype)
        corr = (jax.lax.dot_general(
            h1, m2c_ref[...].astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(dtype).astype(f32)
            + rc2_ref[0][None, :])
        # mq is zero wherever h1 <= 0, so masking the correction masks dy1.
        dy1 = jnp.where(h1.astype(f32) > 0.0,
                        mq_ref[...].astype(f32) - corr, 0.0)
        dy1d = dy1.astype(dtype)

        T = xp.shape[0]
        xp1 = jnp.concatenate([xp, jnp.ones((T, 1), dtype)], axis=1)
        _acc0(out_ref, dy1d, xp1)

    return kernel


def _pick_tiles(Rh, pool, bf16, N=0):
    """Paired-row tile sizes (half the hybrid2 row counts: each paired
    row is two original rows). ``N`` (channels-first mode): the
    x-touching sweeps read (1, C0, tile) blocks of a (B, C0, N) array,
    so their tiles must also divide N (which divides Rh).

    SA_PAIR_TL / SA_PAIR_TP / SA_PAIR_TB override the starting sizes
    (trace-time read; tuning knob for device sweeps — the measured
    defaults below win on v5e)."""
    Tl = int(os.environ.get("SA_PAIR_TL",       # fwd layer+gram sweeps
                            4096 if bf16 else 2048))
    Tp = int(os.environ.get("SA_PAIR_TP",       # fwd pool sweep
                            2048 if bf16 else 1024))
    Tb = int(os.environ.get("SA_PAIR_TB", 2048))   # bwd sweeps
    while Rh % Tl or (N and N % Tl):
        Tl //= 2
    while Tp > pool and (Rh % Tp or Tp % pool):
        Tp //= 2
    if Tp < pool or Rh % Tp or Tp % pool:
        Tp = pool
    while Tb and (Rh % Tb or Tb % pool or (N and N % Tb)):
        Tb //= 2
    if not Tb:
        Tb = pool
    return Tl, Tp, Tb


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda t: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _tile_spec(rows, c, offset_blocks=0):
    return pl.BlockSpec((rows, c), lambda t: (t + offset_blocks, 0),
                        memory_space=pltpu.VMEM)


def _x_specs(x, C0, tile, Rh):
    """The lo/hi half-blocks of the network input for an x-touching
    sweep whose grid step t covers paired rows [t*tile, (t+1)*tile).

    rows mode   — x (R, C0):       (tile, C0) row blocks.
    cf mode     — x (B, C0, N):    (1, C0, tile) channel-major blocks
                  (the fused select+gather kernel's native layout); the
                  paired-row index t maps to batch row t*tile // N,
                  column block (t*tile % N) // tile."""
    if x.ndim == 2:
        nb = Rh // tile
        return [_tile_spec(tile, C0), _tile_spec(tile, C0,
                                                 offset_blocks=nb)]
    Bh = x.shape[0] // 2
    q = x.shape[2] // tile
    lo = pl.BlockSpec((1, C0, tile), lambda t: (t // q, 0, t % q),
                      memory_space=pltpu.VMEM)
    hi = pl.BlockSpec((1, C0, tile), lambda t: (t // q + Bh, 0, t % q),
                      memory_space=pltpu.VMEM)
    return [lo, hi]


def sa_forward_pair(xf: Array, layers, pool: int, eps: float, dtype,
                    interpret: bool = False, slim: bool = False,
                    axis_name=None):
    """2-sweep paired forward (fused layer-1+2 sweep, merged Gram+pool
    sweep; layer-1 BN moments via the XLA Gram(x) covariance identity,
    layer-3 pool finalized in XLA from raw-p3 max/min candidates —
    see _make_gram_pool_sweep).
    xf: (R, C0) flattened rows OR (B, C0, N) channels-first (compute
    dtype), R/2 a multiple of ``pool``. Returns
    (pooled (R//pool, C3), stats, p2p (R/2, 2C2),
    gram2 = (Gram(h2) (C2, C2), colsum(h2) (C2,)) — folded Gram-sweep
    accumulators, saved as residuals so backward sweep 1 never
    recomputes them, idxp, gramx). p1 is never materialized in HBM
    (round 4) — the backward recomputes it from x. ``slim`` returns
    gramx = (Gram(x), colsum(x)) for the 3-sweep backward (the same
    XLA pass that feeds the layer-1 moments); otherwise gramx is None.

    ``axis_name``: when running per-shard inside ``shard_map``
    (make_sharded_pair), the BatchNorm moment accumulators and the
    Gram residuals are psum'd over this mesh axis so every shard sees
    the GLOBAL statistics (the multi-chip analogue of the reference's
    whole-batch BN, cn3d_model_conbag.py:43-88); row-shaped outputs
    stay per-shard."""
    cf = xf.ndim == 3
    if cf:
        Bv, C0, N = xf.shape
        R = Bv * N
    else:
        R, C0 = xf.shape
        N = 0
    Rh = R // 2
    lp1, lp2, lp3 = layers
    C1, C2, C3 = (lp.kernel.shape[1] for lp in layers)
    n = R if axis_name is None else R * jax.lax.psum(1, axis_name)

    def _g(v):
        """Shard-local accumulator -> global (psum over the mesh axis)."""
        return v if axis_name is None else jax.lax.psum(v, axis_name)

    precision = (jax.lax.Precision.HIGHEST
                 if jnp.dtype(dtype) == jnp.float32 else None)
    bf16 = jnp.dtype(dtype) != jnp.float32
    Tl, Tp, _ = _pick_tiles(Rh, pool, bf16, N)

    # Layer-1 BN moments by the covariance identity on Gram(x)/colsum(x)
    # — one XLA pass over the C0=4-wide input (~1% of one residual's
    # bytes), exactly the identity layer 3 uses on Gram(h2). Knowing
    # mul1/shift1 up front lets sweeps 1 and 2 fuse into ONE Pallas pass
    # (no HBM re-read of p1p between them, one fewer BN barrier); the
    # same Gx/cx double as the slim backward's gramx residual.
    if cf:
        Gx = jnp.einsum("bcn,bdn->cd", xf, xf,
                        preferred_element_type=f32, precision=precision)
        cx = jnp.sum(xf.astype(f32), axis=(0, 2))
    else:
        Gx = jnp.einsum("nc,nd->cd", xf, xf,
                        preferred_element_type=f32, precision=precision)
        cx = jnp.sum(xf.astype(f32), axis=0)
    Gx, cx = _g(Gx), _g(cx)
    gramx = (Gx, cx) if slim else None
    # HIGHEST unconditionally: these are tiny (C0/C2-wide) f32 dots with
    # O(n)-sized Gram entries, and TPU DEFAULT rounds f32 matmuls through
    # bf16 passes — a ~3e-3 relative error on the variance itself
    # (device-measured r4; sa_bwd._layer_terms docstring).
    hp = jax.lax.Precision.HIGHEST
    w1f = lp1.kernel.astype(f32)
    b1f = lp1.bias.astype(f32)
    mean1 = jnp.matmul(cx, w1f, precision=hp) / n + b1f
    e1 = (jnp.einsum("ic,ic->c", jnp.matmul(Gx, w1f, precision=hp), w1f,
                     precision=hp) / n
          + b1f * (2.0 * mean1 - b1f))
    var1 = jnp.maximum(e1 - mean1 * mean1, 0.0)  # see sa_fwd._finalize
    mul1, shift1 = _fold_affine(lp1, mean1, var1, eps)

    # Fused sweep 1+2: x (lo/hi halves) -> paired p2 + p2 moments (p1
    # never reaches HBM — the backward recomputes it, _p1_from_xp).
    nb = Rh // Tl
    p2p, s2, ss2 = pl.pallas_call(
        _make_pair_layer12_kernel(dtype, precision, cf),
        grid=(nb,),
        in_specs=[
            _const_spec((2 * C0, 2 * C1)), _const_spec((1, 2 * C1)),
            _const_spec((1, 2 * C1)), _const_spec((1, 2 * C1)),
            _const_spec((2 * C1, 2 * C2)), _const_spec((1, 2 * C2)),
        ] + _x_specs(xf, C0, Tl, Rh),
        out_specs=(_tile_spec(Tl, 2 * C2),
                   _const_spec((1, 2 * C2)), _const_spec((1, 2 * C2))),
        out_shape=(jax.ShapeDtypeStruct((Rh, 2 * C2), dtype),
                   jax.ShapeDtypeStruct((1, 2 * C2), f32),
                   jax.ShapeDtypeStruct((1, 2 * C2), f32)),
        interpret=interpret,
    )(_blkdiag(lp1.kernel), _pair2(lp1.bias), _pair2(mul1),
      _pair2(shift1), _blkdiag(lp2.kernel), _pair2(lp2.bias), xf, xf)
    mean2, var2 = _finalize(_g(_foldlanes(s2, C2)),
                            _g(_foldlanes(ss2, C2)), n)
    mul2, shift2 = _fold_affine(lp2, mean2, var2, eps)

    # Merged sweep 3 (round 4): one pass over p2p yields the Gram(h2)/
    # colsum(h2) accumulators AND the raw-p3 pool candidates (max/min +
    # indices) — the layer-3 affine is applied afterwards in XLA, which
    # is exact because pooling commutes with the per-channel monotone
    # affine+cast+ReLU chain (_make_gram_pool_sweep docstring).
    gp = Rh // pool
    Gp, chp, maxp, minp, imx, imn = pl.pallas_call(
        _make_gram_pool_sweep(dtype, pool, precision),
        grid=(Rh // Tp,),
        in_specs=[
            _const_spec((2 * C2, 2 * C3)), _const_spec((1, 2 * C3)),
            _const_spec((1, 2 * C2)), _const_spec((1, 2 * C2)),
            _tile_spec(Tp, 2 * C2),
        ],
        out_specs=(_const_spec((2 * C2, 2 * C2)),
                   _const_spec((1, 2 * C2)),
                   _tile_spec(Tp // pool, 2 * C3),
                   _tile_spec(Tp // pool, 2 * C3),
                   _tile_spec(Tp // pool, 2 * C3),
                   _tile_spec(Tp // pool, 2 * C3)),
        out_shape=(jax.ShapeDtypeStruct((2 * C2, 2 * C2), f32),
                   jax.ShapeDtypeStruct((1, 2 * C2), f32),
                   jax.ShapeDtypeStruct((gp, 2 * C3), dtype),
                   jax.ShapeDtypeStruct((gp, 2 * C3), dtype),
                   jax.ShapeDtypeStruct((gp, 2 * C3), dtype),
                   jax.ShapeDtypeStruct((gp, 2 * C3), dtype)),
        interpret=interpret,
    )(_blkdiag(lp3.kernel), _pair2(lp3.bias), _pair2(mul2),
      _pair2(shift2), p2p)
    G2 = _g(_fold2(Gp, C2, C2))
    ch2 = _g(_foldlanes(chp, C2)[0])
    w3f = lp3.kernel.astype(f32)
    b3f = lp3.bias.astype(f32)
    mean3 = jnp.matmul(ch2, w3f, precision=hp) / n + b3f
    e2 = (jnp.einsum("ic,ic->c", jnp.matmul(G2, w3f, precision=hp), w3f,
                     precision=hp) / n
          + b3f * (2.0 * mean3 - b3f))
    var3 = jnp.maximum(e2 - mean3 * mean3, 0.0)  # see sa_fwd._finalize
    mul3, shift3 = _fold_affine(lp3, mean3, var3, eps)

    # Finalize the pool in XLA on the (Rh/pool, 2C3) candidates: pick
    # max (mul3 >= 0) or min per channel, one affine per group row.
    mul3p, shift3p = _pair2(mul3), _pair2(shift3)
    sel = mul3p >= 0.0
    zstar = (jnp.where(sel, maxp.astype(f32), minp.astype(f32))
             * mul3p + shift3p)
    pooled_p = jnp.maximum(zstar.astype(dtype),
                           jnp.zeros((), dtype))
    idxp = jnp.where(zstar > 0.0,
                     jnp.where(sel, imx, imn).astype(f32),
                     float(pool)).astype(dtype)
    pooled = jnp.concatenate([pooled_p[:, :C3], pooled_p[:, C3:]], axis=0)

    stats = [(mean1, var1), (mean2, var2), (mean3, var3)]
    return pooled, stats, p2p, (G2, ch2), idxp, gramx


def sa_backward_pair(xf, p2p, gram2, idxp, gramx, layers, stats,
                     dpooled, eps, dtype, interpret=False,
                     slim=False, axis_name=None):
    """Paired backward. xf (R, C0) rows OR (B, C0, N) channels-first
    (compute dtype), p2p the paired layer-2 residual (p1 is recomputed
    from xf in-kernel, _p1_from_xp),
    gram2 = (Gram(h2), colsum(h2)) from the forward's sweep 3,
    idxp the forward's paired pool-argmax residual,
    gramx = (Gram(x), colsum(x)) from the forward's sweep 1 (slim
    mode; None otherwise), dpooled (R//pool, C3). Returns the
    SALayerParams cotangent tuple (same closed-form layer algebra as
    sa_bwd.sa_backward_pallas, paired accumulator blocks folded).

    slim=False: 2 sweeps — sweep 2 carries the layer-1 third-order
    moment blocks and layer 1's terms are reassembled on the host.
    slim=True: 3 sweeps — layer 1's dy-contraction is formed directly
    in sweep 3 instead of via third-order moments.

    ``axis_name``: per-shard mode (make_sharded_pair) — every
    dy-contraction accumulator is psum'd over the mesh axis before the
    layer algebra, so the returned cotangents are the GLOBAL gradients
    (identical on every shard)."""
    cf = xf.ndim == 3
    if cf:
        Bv, C0, N = xf.shape
        R = Bv * N
    else:
        R, C0 = xf.shape
        N = 0
    Rh = R // 2
    C1, C2 = layers[0].kernel.shape[1], p2p.shape[1] // 2
    P, C3 = dpooled.shape
    pool = R // P
    n = R if axis_name is None else R * jax.lax.psum(1, axis_name)
    # The in-kernel p1 recompute must match the forward's precision
    # (HIGHEST in f32 strict mode) so the recomputed ReLU masks agree;
    # every other backward dot keeps the default (docs/DESIGN.md §3).
    p1_precision = (jax.lax.Precision.HIGHEST
                    if jnp.dtype(dtype) == jnp.float32 else None)

    def _g(v):
        """Shard-local accumulator -> global (psum over the mesh axis)."""
        return v if axis_name is None else jax.lax.psum(v, axis_name)
    lp1, lp2, lp3 = layers
    (mean1, var1), (mean2, var2), (mean3, var3) = stats
    mul1, shift1 = _fold_affine(lp1, mean1, var1, eps)
    mul2, shift2 = _fold_affine(lp2, mean2, var2, eps)
    gi2 = lp2.scale.astype(f32) * jax.lax.rsqrt(var2 + eps)
    gi3 = lp3.scale.astype(f32) * jax.lax.rsqrt(var3 + eps)

    bf16 = jnp.dtype(dtype) != jnp.float32
    _, _, Tb = _pick_tiles(Rh, pool, bf16, N)
    grid = (Rh // Tb,)
    tg = Tb // pool

    # Re-pair the pooled cotangent: paired pooled row g = [g | g + P/2].
    dpp = jnp.concatenate([dpooled[:P // 2], dpooled[P // 2:]], axis=1)

    # Sweep 1 (paired kernel): dy3 from the argmax residual, A3 =
    # dy3^T h2 (padding-free matmul), u3 a VPU lane sum; G2/ch2 arrive
    # from the forward's sweep 3.
    a3p, u3p, q3p = pl.pallas_call(
        _make_sweep1_pair_kernel(pool, dtype),
        grid=grid,
        in_specs=[
            _const_spec((1, 2 * C2)), _const_spec((1, 2 * C2)),
            _const_spec((1, 2 * C3)), _const_spec((2 * C3, 2 * C2)),
            _tile_spec(Tb, 2 * C2), _tile_spec(tg, 2 * C3),
            _tile_spec(tg, 2 * C3),
        ],
        out_specs=(_const_spec((2 * C3, 2 * C2)),
                   _const_spec((1, 2 * C3)),
                   _tile_spec(Tb, 2 * C2)),
        out_shape=(jax.ShapeDtypeStruct((2 * C3, 2 * C2), f32),
                   jax.ShapeDtypeStruct((1, 2 * C3), f32),
                   jax.ShapeDtypeStruct((Rh, 2 * C2), p2p.dtype)),
        interpret=interpret,
    )(_pair2(mul2), _pair2(shift2), _pair2(gi3),
      _blkdiag(jnp.swapaxes(lp3.kernel, 0, 1)), p2p, dpp, idxp)
    A3 = _g(_fold2(a3p, C3, C2))
    u3 = _g(_foldlanes(u3p, C3)[0])
    G2, ch2 = gram2              # already global (forward psums them)

    t3 = _layer_terms(A3, u3, lp3, mean3, var3, G2, ch2, n, eps)

    if slim:
        # Sweep 2 (slim): [dy2 | h1] x h1 -> packed [A2 / G1], u2/ch1
        # lane sums, and the mq = m1*q2 residual for sweep 3.
        Lm = 2 * C2 + 2 * C1
        out2, sums2, mqp = pl.pallas_call(
            _make_sweep2_slim_kernel(dtype, C0, cf, p1_precision),
            grid=grid,
            in_specs=[
                _const_spec((2 * C2, 2 * C2)),
                _const_spec((1, 2 * C2)), _const_spec((1, 2 * C2)),
                _const_spec((2 * C2, 2 * C1)),
                _const_spec((1, 2 * C1)), _const_spec((1, 2 * C1)),
                _const_spec((1, 2 * C2)), _const_spec((1, 2 * C2)),
                _const_spec((2 * C0, 2 * C1)), _const_spec((1, 2 * C1)),
            ] + _x_specs(xf, C0, Tb, Rh) + [
                _tile_spec(Tb, 2 * C2), _tile_spec(Tb, 2 * C2),
            ],
            out_specs=(_const_spec((Lm, 2 * C1)),
                       _const_spec((1, 2 * C2 + 2 * C1)),
                       _tile_spec(Tb, 2 * C1)),
            out_shape=(jax.ShapeDtypeStruct((Lm, 2 * C1), f32),
                       jax.ShapeDtypeStruct((1, 2 * C2 + 2 * C1), f32),
                       jax.ShapeDtypeStruct((Rh, 2 * C1), p2p.dtype)),
            interpret=interpret,
        )(_blkdiag(t3["M"]), _pair2(t3["rc"]), _pair2(gi2),
          _blkdiag(jnp.swapaxes(lp2.kernel, 0, 1)),
          _pair2(mul1), _pair2(shift1), _pair2(mul2), _pair2(shift2),
          _blkdiag(lp1.kernel), _pair2(lp1.bias),
          xf, xf, p2p, q3p)

        A2 = _g(_fold2(out2[:2 * C2], C2, C1))
        G1 = _g(_fold2(out2[2 * C2:], C1, C1))
        u2 = _g(_foldlanes(sums2[:, :2 * C2], C2)[0])
        ch1 = _g(_foldlanes(sums2[:, 2 * C2:], C1)[0])

        t2 = _layer_terms(A2, u2, lp2, mean2, var2, G1, ch1, n, eps)

        # Sweep 3: dy1 = m1*(q2 - h1 M2 - rc2) directly, packed
        # dy1^T [x | ones] -> [A1 | u1].
        out3 = pl.pallas_call(
            _make_sweep3_pair_kernel(dtype, C0, cf, p1_precision),
            grid=grid,
            in_specs=[
                _const_spec((2 * C1, 2 * C1)), _const_spec((1, 2 * C1)),
                _const_spec((1, 2 * C1)), _const_spec((1, 2 * C1)),
                _const_spec((2 * C0, 2 * C1)), _const_spec((1, 2 * C1)),
            ] + _x_specs(xf, C0, Tb, Rh) + [
                _tile_spec(Tb, 2 * C1),
            ],
            out_specs=_const_spec((2 * C1, 2 * C0 + 1)),
            out_shape=jax.ShapeDtypeStruct((2 * C1, 2 * C0 + 1), f32),
            interpret=interpret,
        )(_blkdiag(t2["M"]), _pair2(t2["rc"]), _pair2(mul1),
          _pair2(shift1), _blkdiag(lp1.kernel), _pair2(lp1.bias),
          xf, xf, mqp)

        A1 = _g(out3[:C1, :C0] + out3[C1:2 * C1, C0:2 * C0])
        u1 = _g(out3[:C1, 2 * C0] + out3[C1:2 * C1, 2 * C0])
        Gx, cx = gramx           # already global (forward psums them)
        t1 = _layer_terms(A1, u1, lp1, mean1, var1, Gx, cx, n, eps)
    else:
        # Sweep 2 (paired kernel), two padding-tight accumulations
        # (kernel docstring): main = [dy2 | m1 | m1*x_i... | h1] x [h1],
        # aux = [dy2 | m1 | m1*q2 | x | h1] x [x | ones].
        Lm = 2 * C2 + (2 + C0) * 2 * C1
        La = 2 * C2 + 3 * 2 * C1 + 2 * C0       # dy2, m1, mqd, x, h1
        Ra = 2 * C0 + 1
        outm, outa = pl.pallas_call(
            _make_sweep2_pair_kernel(pool, dtype, C0, C1, cf,
                                     p1_precision),
            grid=grid,
            in_specs=[
                _const_spec((2 * C2, 2 * C2)),
                _const_spec((1, 2 * C2)), _const_spec((1, 2 * C2)),
                _const_spec((2 * C2, 2 * C1)),
                _const_spec((1, 2 * C1)), _const_spec((1, 2 * C1)),
                _const_spec((1, 2 * C2)), _const_spec((1, 2 * C2)),
                _const_spec((2 * C0, 2 * C1)), _const_spec((1, 2 * C1)),
            ] + _x_specs(xf, C0, Tb, Rh) + [
                _tile_spec(Tb, 2 * C2), _tile_spec(Tb, 2 * C2),
            ],
            out_specs=(_const_spec((Lm, 2 * C1)), _const_spec((La, Ra))),
            out_shape=(jax.ShapeDtypeStruct((Lm, 2 * C1), f32),
                       jax.ShapeDtypeStruct((La, Ra), f32)),
            interpret=interpret,
        )(_blkdiag(t3["M"]), _pair2(t3["rc"]), _pair2(gi2),
          _blkdiag(jnp.swapaxes(lp2.kernel, 0, 1)),
          _pair2(mul1), _pair2(shift1), _pair2(mul2), _pair2(shift2),
          _blkdiag(lp1.kernel), _pair2(lp1.bias),
          xf, xf, p2p, q3p)

        outm, outa = _g(outm), _g(outa)
        hL, hR = slice(0, C1), slice(C1, 2 * C1)
        xL, xR, one = slice(0, C0), slice(C0, 2 * C0), 2 * C0

        def blk(out, r0, a):
            return out[r0:r0 + a], out[r0 + a:r0 + 2 * a]

        # main: row blocks [dy2 | m1 | m1*x_i... | h1], columns h1.
        rm = 0
        lo, hi = blk(outm, rm, C2)
        A2 = lo[:, hL] + hi[:, hR]
        rm += 2 * C2
        lo, hi = blk(outm, rm, C1)
        TM1 = lo[:, hL] + hi[:, hR]
        rm += 2 * C1
        U1 = jnp.stack(
            [blk(outm, rm + i * 2 * C1, C1)[0][:, hL]
             + blk(outm, rm + i * 2 * C1, C1)[1][:, hR]
             for i in range(C0)], axis=-1)           # (C1, C1, C0)
        rm += C0 * 2 * C1
        lo, hi = blk(outm, rm, C1)
        G1 = lo[:, hL] + hi[:, hR]

        # aux: row blocks [dy2 | m1 | m1*q2 | x | h1], cols [x | ones].
        ra = 0
        lo, hi = blk(outa, ra, C2)
        u2 = lo[:, one] + hi[:, one]
        ra += 2 * C2
        lo, hi = blk(outa, ra, C1)
        T1x = lo[:, xL] + hi[:, xR]
        cnt1 = lo[:, one] + hi[:, one]
        ra += 2 * C1
        lo, hi = blk(outa, ra, C1)
        P1 = lo[:, xL] + hi[:, xR]
        acc1 = lo[:, one] + hi[:, one]
        ra += 2 * C1
        lo, hi = blk(outa, ra, C0)
        Gx = lo[:, xL] + hi[:, xR]
        cx = lo[:, one] + hi[:, one]
        ra += 2 * C0
        lo, hi = blk(outa, ra, C1)
        ch1 = lo[:, one] + hi[:, one]

        t2 = _layer_terms(A2, u2, lp2, mean2, var2, G1, ch1, n, eps)

        M2, rc2 = t2["M"], t2["rc"]
        hp = jax.lax.Precision.HIGHEST
        u1 = (acc1 - jnp.einsum("cj,jc->c", TM1, M2, precision=hp)
              - cnt1 * rc2)
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


def _xf_of(x, cf, dtype):
    """Flatten the network input to the sweeps' row space: (Bv, C0, S*K)
    channels-first, or (rows, C0) for any channels-last layout."""
    if cf:
        Bv, C0, S, K = x.shape
        return x.astype(dtype).reshape(Bv, C0, S * K)
    C0 = x.shape[-1]
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    return x.astype(dtype).reshape(rows, C0)


def _pair_impl(x, layers, eps, dtype, interpret, slim, axis_name=None):
    *lead, K, C0 = x.shape
    xf = _xf_of(x, False, dtype)
    pooled, stats, p2p, gram2, idxp, gramx = sa_forward_pair(
        xf, layers, K, eps, dtype, interpret, slim, axis_name)
    return (pooled.reshape(*lead, -1), stats, xf, p2p, gram2, idxp,
            gramx)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def sa_train_pair(x: Array, layers: Tuple[SALayerParams, ...],
                  eps: float = 1e-5, dtype=jnp.float32,
                  interpret: bool = False, slim: bool = False):
    """Paired-layout Pallas forward + backward. x: (..., K, C0);
    requires 3 layers and an even pooled-row count (so each pool group
    lives in one half). ``slim`` selects the 3-sweep backward (module
    docstring). Input cotangent is ZERO by contract."""
    assert len(layers) == 3, "pair impl is specialized to L=3"
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    assert (rows // x.shape[-2]) % 2 == 0, \
        "pair impl needs an even pooled-row count"
    pooled, stats = _pair_impl(x, tuple(layers), eps, dtype,
                               interpret, slim)[:2]
    return pooled, stats


def _pr_fwd(x, layers, eps, dtype, interpret, slim):
    layers = tuple(layers)
    pooled, stats, _, p2p, gram2, idxp, gramx = _pair_impl(
        x, layers, eps, dtype, interpret, slim)
    return (pooled, stats), (x, p2p, gram2, idxp, gramx, layers,
                             stats)


def _pr_bwd(eps, dtype, interpret, slim, res, cts):
    dpooled, _ = cts          # stats cotangent ignored (state update)
    x, p2p, gram2, idxp, gramx, layers, stats = res
    C3 = dpooled.shape[-1]
    dlayers = sa_backward_pair(
        _xf_of(x, False, dtype), p2p, gram2, idxp, gramx,
        layers, stats, dpooled.reshape(-1, C3), eps, dtype,
        interpret=interpret, slim=slim)
    return jnp.zeros(x.shape, x.dtype), tuple(dlayers)


sa_train_pair.defvjp(_pr_fwd, _pr_bwd)


def _pair_cf_impl(x_cf, layers, eps, dtype, interpret, slim,
                  axis_name=None):
    Bv, C0, S, K = x_cf.shape
    x3 = _xf_of(x_cf, True, dtype)
    pooled, stats, p2p, gram2, idxp, gramx = sa_forward_pair(
        x3, layers, K, eps, dtype, interpret, slim, axis_name)
    return (pooled.reshape(Bv, S, -1), stats, x3, p2p, gram2, idxp,
            gramx)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def sa_train_pair_cf(x_cf: Array, layers: Tuple[SALayerParams, ...],
                     eps: float = 1e-5, dtype=jnp.float32,
                     interpret: bool = False, slim: bool = False):
    """Channels-first paired entry: x_cf (B, C0, S, K) — the fused
    select+gather kernel's native layout, consumed without any XLA
    transpose (the x-touching sweeps read (1, C0, tile) blocks and
    contract/transpose in-VMEM). Max-pools over K. Requires 3 layers
    and an even B (pairing is b <-> b + B/2). ``slim`` selects the
    3-sweep backward (module docstring). Input cotangent is ZERO by
    contract."""
    assert len(layers) == 3, "pair impl is specialized to L=3"
    assert x_cf.shape[0] % 2 == 0, \
        "pair-cf impl needs an even batch row count"
    pooled, stats = _pair_cf_impl(x_cf, tuple(layers), eps,
                                  dtype, interpret, slim)[:2]
    return pooled, stats


def _prcf_fwd(x_cf, layers, eps, dtype, interpret, slim):
    layers = tuple(layers)
    pooled, stats, _, p2p, gram2, idxp, gramx = _pair_cf_impl(
        x_cf, layers, eps, dtype, interpret, slim)
    return (pooled, stats), (x_cf, p2p, gram2, idxp, gramx, layers,
                             stats)


def _prcf_bwd(eps, dtype, interpret, slim, res, cts):
    dpooled, _ = cts          # stats cotangent ignored (state update)
    x_cf, p2p, gram2, idxp, gramx, layers, stats = res
    C3 = dpooled.shape[-1]
    dlayers = sa_backward_pair(
        _xf_of(x_cf, True, dtype), p2p, gram2,
        idxp, gramx, layers, stats, dpooled.reshape(-1, C3), eps, dtype,
        interpret=interpret, slim=slim)
    return jnp.zeros(x_cf.shape, x_cf.dtype), tuple(dlayers)


sa_train_pair_cf.defvjp(_prcf_fwd, _prcf_bwd)


def make_sharded_pair(mesh, axis_name: str, eps: float, dtype,
                      slim: bool, cf: bool, interpret: bool = False):
    """Multi-chip pair stage: per-shard Pallas sweeps under
    ``jax.shard_map`` with GLOBAL BatchNorm statistics via psum over
    ``axis_name`` — the TPU-native analogue of whole-batch BN under
    data parallelism (reference semantics: the train-mode BN of
    cn3d_model_conbag.py:43-88; its dead multi-device path:
    concat_all_gather, :559-570). A pallas_call is a single-device
    program, so under GSPMD the SA stage previously had to fall back
    to the XLA reference path on any mesh; this keeps the paired-row
    kernels on every chip.

    Both shard_map calls live INSIDE a custom_vjp, so autodiff never
    differentiates through shard_map: the backward shard_map psums the
    dy-contraction accumulators before the layer algebra and every
    shard emits the identical global cotangent (out_spec P()) — no
    transpose machinery, no fudge factors.

    Returns ``f(x, layers) -> (pooled, stats)``; x is (GB, S, K, C)
    rows or (B, C, S, K) channels-first (``cf``), sharded over dim 0
    on ``axis_name``; per-shard pairing needs an even per-shard
    pooled-row count. The input cotangent is ZERO by contract."""
    from jax.sharding import PartitionSpec as P

    shard = P(axis_name)
    rep = P()
    impl = _pair_cf_impl if cf else _pair_impl
    nsh = mesh.shape[axis_name]

    def _fwd_shard(x, layers):
        pooled, stats, _, p2p, gram2, idxp, gramx = impl(
            x, tuple(layers), eps, dtype, interpret, slim, axis_name)
        return pooled, stats, p2p, gram2, idxp, gramx

    fwd_sm = jax.shard_map(
        # check_vma=False: pallas_call inside shard_map cannot declare
        # varying-mesh-axes metadata (same as make_grouping_fn).
        _fwd_shard, mesh=mesh,
        in_specs=(shard, rep),
        out_specs=(shard, rep, shard, rep, shard, rep),
        check_vma=False)

    def _bwd_shard(x, p2p, gram2, idxp, gramx, layers, stats,
                   dpooled):
        C3 = dpooled.shape[-1]
        return sa_backward_pair(
            _xf_of(x, cf, dtype), p2p, gram2, idxp, gramx, layers,
            stats, dpooled.reshape(-1, C3), eps, dtype,
            interpret=interpret, slim=slim, axis_name=axis_name)

    bwd_sm = jax.shard_map(
        _bwd_shard, mesh=mesh,
        in_specs=(shard, shard, rep, shard, rep, rep, rep,
                  shard),
        out_specs=rep,
        check_vma=False)

    def _check(x):
        assert x.shape[0] % nsh == 0, \
            f"pair-sharded: dim 0 ({x.shape[0]}) must divide over " \
            f"{nsh} '{axis_name}' shards"
        if cf:
            assert (x.shape[0] // nsh) % 2 == 0, \
                "pair-sharded cf: per-shard batch row count must be even"
        else:
            rows = 1
            for d in x.shape[:-1]:
                rows *= d
            assert (rows // x.shape[-2] // nsh) % 2 == 0, \
                "pair-sharded: per-shard pooled-row count must be even"

    @jax.custom_vjp
    def f(x, layers):
        assert len(layers) == 3, "pair impl is specialized to L=3"
        _check(x)
        return fwd_sm(x, tuple(layers))[:2]

    def f_fwd(x, layers):
        layers = tuple(layers)
        _check(x)
        pooled, stats, p2p, gram2, idxp, gramx = fwd_sm(x, layers)
        return (pooled, stats), (x, p2p, gram2, idxp, gramx,
                                 layers, stats)

    def f_bwd(res, cts):
        dpooled, _ = cts      # stats cotangent ignored (state update)
        x, p2p, gram2, idxp, gramx, layers, stats = res
        dlayers = bwd_sm(x, p2p, gram2, idxp, gramx, layers,
                         stats, dpooled)
        return jnp.zeros(x.shape, x.dtype), tuple(dlayers)

    f.defvjp(f_fwd, f_bwd)
    return f
