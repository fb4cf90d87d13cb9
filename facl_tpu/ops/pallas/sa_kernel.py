"""Pallas TPU kernels for the fused set-abstraction stage.

Semantics are defined by facl_tpu.ops.fused_sa.sa_train_reference:
[Dense -> BatchNorm(train) -> ReLU] x L then max over ``pool_size``
neighbors. The flax/XLA path materializes every (R, C_l) intermediate in
HBM — for the reference workload that is ~2 GB per direction and dominates
the training step. These kernels recompute activations tile-by-tile in
VMEM instead, so HBM traffic is just the (R, C0) input, the pooled output,
and per-channel statistics.

Structure (one ``pallas_call`` per global-reduction barrier; the TPU grid
is sequential per core, so constant-index output blocks accumulate):

forward:  L stats sweeps (sweep l computes layers 0..l-1 with known stats
          and accumulates layer l's sum / sum-of-squares) + 1 output sweep.
backward: L+1 sweeps mirroring BN's global terms top-down — sweep j
          accumulates layer (L-j)'s  sum(dy) / sum(dy*xhat)  and the
          parameter grads discovered on the way, the final sweep emits dX.

Max-pool backward reproduces JAX's tie semantics exactly: the incoming
gradient is split evenly among all elements equal to the max.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from facl_tpu.ops.fused_sa import SALayerParams

Array = jax.Array
_HI = jax.lax.Precision.HIGHEST


def _dot(a, b, dtype):
    return jax.lax.dot_general(
        a.astype(dtype), b.astype(dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _preact(h, W, b, dtype):
    """Dense pre-activation with the reference's exact cast chain: the dot
    accumulates in f32, is rounded to the compute dtype, the bias adds in
    the compute dtype, and BN consumes the f32 upcast."""
    d = _dot(h, W[...], dtype)
    pd = d.astype(dtype) + b[...][0].astype(dtype)
    return pd.astype(jnp.float32)


def _layer_forward(h, refs, li, stats_ref, eps, dtype):
    """One Dense+BN(train)+ReLU with known stats. h: (T, Cin) dtype.
    Returns (a (T, Cout) dtype, xhat (dtype), mask (f32-compared bool)).

    Full-tensor elementwise math stays in f32: the TPU VPU is f32-native
    (bf16 elementwise upcasts internally and measured *slower*); the
    per-channel BN affines are folded (xhat = p*A+B, y = p*A'+B') to
    minimize op count.
    """
    W, b, g, be = refs[li]
    c = W.shape[1]
    d = _dot(h, W[...], dtype)
    pf = (d.astype(dtype) + b[...][0].astype(dtype)).astype(jnp.float32)
    mean = stats_ref[li, 0, :c]
    inv = stats_ref[li, 1, :c]
    gam = g[...][0].astype(jnp.float32)
    # xhat = p*inv - mean*inv;  y = p*(inv*gam) - mean*inv*gam + beta.
    b_x = -mean * inv
    a_y = inv * gam
    b_y = be[...][0].astype(jnp.float32) - mean * a_y
    xhat = pf * inv[None, :] + b_x[None, :]
    y = pf * a_y[None, :] + b_y[None, :]
    yd = y.astype(dtype)
    a = jnp.maximum(yd, jnp.zeros_like(yd))
    # Compare in f32: the v5e VPU rejects bf16 comparisons in Mosaic.
    mask = (yd.astype(jnp.float32) > 0.0)
    return a, None, xhat, mask


def _prefix(x_ref, refs, stats_ref, upto, eps, dtype):
    """Forward through layers 0..upto-1 (exclusive); returns the running
    activation plus per-layer (a, xhat, mask) lists for backward reuse."""
    h = x_ref[...].astype(dtype)
    acts, xhats, masks = [h], [], []
    for li in range(upto):
        a, p, xhat, mask = _layer_forward(h, refs, li, stats_ref, eps, dtype)
        h = a
        acts.append(a)
        xhats.append(xhat)
        masks.append(mask)
    return h, acts, xhats, masks


def _param_refs(args, L):
    """Group the flat (W, b, g, be) * L ref list."""
    return [tuple(args[4 * i:4 * i + 4]) for i in range(L)]


def _make_stats_kernel(L, li, eps, dtype):
    """Sweep accumulating layer ``li``'s pre-activation sum/sumsq."""
    def kernel(*args):
        x_ref = args[0]
        refs = _param_refs(args[1:1 + 4 * L], L)
        stats_ref = args[1 + 4 * L]
        out_ref = args[-1]                       # (2, C_li) accumulator

        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        h, _, _, _ = _prefix(x_ref, refs, stats_ref, li, eps, dtype)
        W, b, _, _ = refs[li]
        p = _preact(h, W, b, dtype)
        out_ref[0, :] += jnp.sum(p, axis=0)
        out_ref[1, :] += jnp.sum(p * p, axis=0)

    return kernel


def _make_output_kernel(L, pool, eps, dtype):
    def kernel(*args):
        x_ref = args[0]
        refs = _param_refs(args[1:1 + 4 * L], L)
        stats_ref = args[1 + 4 * L]
        out_ref = args[-1]                       # (T // pool, C_L)
        h, _, _, _ = _prefix(x_ref, refs, stats_ref, L, eps, dtype)
        T, C = h.shape
        out_ref[...] = jnp.max(h.reshape(T // pool, pool, C),
                               axis=1).astype(out_ref.dtype)

    return kernel


def _grid_call(kernel, x, flat_params, stats, out_shapes, out_specs,
               tile, extra_inputs=(), extra_specs=(), interpret=False):
    R = x.shape[0]
    grid = (R // tile,)
    const = lambda t: tuple([0] * 2)
    in_specs = [pl.BlockSpec((tile, x.shape[1]), lambda t: (t, 0),
                             memory_space=pltpu.VMEM)]
    for p in flat_params:
        nd = len(p.shape)
        in_specs.append(pl.BlockSpec(
            p.shape, (lambda t: (0, 0)) if nd == 2 else (lambda t: (0, 0, 0)),
            memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(stats.shape, lambda t: (0, 0, 0),
                                 memory_space=pltpu.VMEM))
    in_specs.extend(extra_specs)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(x, *flat_params, stats, *extra_inputs)


def _flatten_params(layers: Sequence[SALayerParams]):
    flat = []
    for lp in layers:
        flat += [lp.kernel, lp.bias.reshape(1, -1),
                 lp.scale.reshape(1, -1), lp.shift.reshape(1, -1)]
    return flat


def _pick_tile(R: int, pool: int, cmax: int) -> int:
    tile = 2048 if cmax <= 256 else 1024
    tile = max(pool, (tile // pool) * pool)
    while R % tile:
        tile -= pool
    return max(tile, pool)


# ---------------------------------------------------------------------------
# Single-call variants: the whole forward (or backward) as ONE pallas_call
# with a phase-major grid. The TPU grid executes sequentially per core, so
# VMEM scratch carries the per-layer statistics across phases and each
# phase's global reduction is finalized at the first tile of the next
# phase. Two custom calls per SA stage instead of eight — minimal
# disruption to XLA's fusion islands.
# ---------------------------------------------------------------------------


def _make_unified_fwd_kernel(L, pool, eps, dtype, rows, widths, cmax):
    def kernel(*args):
        x_ref = args[0]
        refs = _param_refs(args[1:1 + 4 * L], L)
        pooled_ref = args[1 + 4 * L]
        stats_out = args[2 + 4 * L]              # (L, 3, cmax): mean/inv/var
        stats_s = args[3 + 4 * L]                # scratch (L, 2, cmax)
        sums_s = args[4 + 4 * L]                 # scratch (L, 2, cmax)

        p = pl.program_id(0)
        t = pl.program_id(1)
        nt = pl.num_programs(1)

        @pl.when((p == 0) & (t == 0))
        def _():
            sums_s[...] = jnp.zeros_like(sums_s)
            stats_s[...] = jnp.zeros_like(stats_s)

        # Finalize layer (li)'s stats at the first tile of phase li+1.
        for li in range(L):
            @pl.when((p == li + 1) & (t == 0))
            def _(li=li):
                mean = sums_s[li, 0, :] / rows
                var = jnp.maximum(
                    sums_s[li, 1, :] / rows - mean * mean, 0.0)
                stats_s[li, 0, :] = mean
                stats_s[li, 1, :] = jax.lax.rsqrt(var + eps)

        for li in range(L):
            @pl.when(p == li)
            def _(li=li):
                h, _, _, _ = _prefix(x_ref, refs, stats_s, li, eps, dtype)
                W, b, _, _ = refs[li]
                pre = _preact(h, W, b, dtype)
                c = widths[li]
                sums_s[li, 0, :c] += jnp.sum(pre, axis=0)
                sums_s[li, 1, :c] += jnp.sum(pre * pre, axis=0)

        @pl.when(p == L)
        def _():
            h, _, _, _ = _prefix(x_ref, refs, stats_s, L, eps, dtype)
            T, C = h.shape
            pooled_ref[...] = jnp.max(
                h.reshape(T // pool, pool, C), axis=1
            ).astype(pooled_ref.dtype)

            @pl.when(t == nt - 1)
            def _():
                for li in range(L):
                    mean = sums_s[li, 0, :] / rows
                    var = jnp.maximum(
                        sums_s[li, 1, :] / rows - mean * mean, 0.0)
                    stats_out[li, 0, :] = mean
                    stats_out[li, 1, :] = stats_s[li, 1, :]
                    stats_out[li, 2, :] = var

    return kernel


def sa_train_forward_unified(
    x: Array,
    layers: Tuple[SALayerParams, ...],
    pool_size: int,
    eps: float = 1e-5,
    compute_dtype=jnp.float32,
    interpret: bool = False,
):
    """Single-pallas_call forward. Returns (pooled, [(mean, var)],
    stats_packed (L, 2, cmax) with [mean, inv] rows)."""
    L = len(layers)
    R, C0 = x.shape
    widths = [lp.kernel.shape[1] for lp in layers]
    cmax = max(widths)
    tile = _pick_tile(R, pool_size, cmax)
    flat = _flatten_params(layers)
    x = x.astype(jnp.float32) if compute_dtype == jnp.float32 else x

    in_specs = [pl.BlockSpec((tile, C0), lambda p, t: (t, 0),
                             memory_space=pltpu.VMEM)]
    for prm in flat:
        in_specs.append(pl.BlockSpec(
            prm.shape, (lambda p, t: (0, 0)),
            memory_space=pltpu.VMEM))
    out_shapes = (
        jax.ShapeDtypeStruct((R // pool_size, widths[-1]), jnp.float32),
        jax.ShapeDtypeStruct((L, 3, cmax), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((tile // pool_size, widths[-1]),
                     lambda p, t: (t, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((L, 3, cmax), lambda p, t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    )

    pooled, stats3 = pl.pallas_call(
        _make_unified_fwd_kernel(
            L, pool_size, eps, compute_dtype, R, widths, cmax),
        grid=(L + 1, R // tile),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((L, 2, cmax), jnp.float32),
                        pltpu.VMEM((L, 2, cmax), jnp.float32)],
        interpret=interpret,
    )(x, *flat)

    stats = [(stats3[li, 0, :widths[li]], stats3[li, 2, :widths[li]])
             for li in range(L)]
    packed = stats3[:, :2, :]
    return pooled, stats, packed


def sa_train_forward_pallas(
    x: Array,
    layers: Tuple[SALayerParams, ...],
    pool_size: int,
    eps: float = 1e-5,
    compute_dtype=jnp.float32,
    interpret: bool = False,
):
    """Forward: returns (pooled, [(mean, var)] per layer, stats_packed)."""
    L = len(layers)
    R, C0 = x.shape
    widths = [lp.kernel.shape[1] for lp in layers]
    cmax = max(widths)
    tile = _pick_tile(R, pool_size, cmax)
    flat = _flatten_params(layers)
    x = x.astype(jnp.float32) if compute_dtype == jnp.float32 else x

    # stats_packed[l] = (mean, inv_std) rows padded to cmax.
    stats = jnp.zeros((L, 2, cmax), jnp.float32)
    means, vars_ = [], []
    for li in range(L):
        c = widths[li]
        sums = _grid_call(
            _make_stats_kernel(L, li, eps, compute_dtype),
            x, flat, stats,
            jax.ShapeDtypeStruct((2, c), jnp.float32),
            pl.BlockSpec((2, c), lambda t: (0, 0), memory_space=pltpu.VMEM),
            tile, interpret=interpret)
        mean = sums[0] / R
        var = jnp.maximum(sums[1] / R - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + eps)
        means.append(mean)
        vars_.append(var)
        pad = cmax - c
        row = jnp.stack([jnp.pad(mean, (0, pad)), jnp.pad(inv, (0, pad))])
        stats = stats.at[li].set(row)

    pooled = _grid_call(
        _make_output_kernel(L, pool_size, eps, compute_dtype),
        x, flat, stats,
        jax.ShapeDtypeStruct((R // pool_size, widths[-1]), jnp.float32),
        pl.BlockSpec((tile // pool_size, widths[-1]), lambda t: (t, 0),
                     memory_space=pltpu.VMEM),
        tile, interpret=interpret)
    return pooled, list(zip(means, vars_)), stats


def _make_unified_bwd_kernel(L, pool, eps, dtype, rows, widths, cmax,
                             need_dx, c0):
    def kernel(*args):
        x_ref = args[0]
        refs = _param_refs(args[1:1 + 4 * L], L)
        stats_ref = args[1 + 4 * L]
        dout_ref = args[2 + 4 * L]
        outs = list(args[3 + 4 * L:])
        bsums_s = outs.pop()                       # scratch (L, 2, cmax)
        bsums_out = outs.pop()                     # (L, 2, cmax) output
        if need_dx:
            dx_out = outs[0]
            dw_outs = outs[1:1 + L]
            db_outs = outs[1 + L:1 + 2 * L]
        else:
            dw_outs = outs[0:L]
            db_outs = outs[L:2 * L]

        p = pl.program_id(0)
        t = pl.program_id(1)
        nt = pl.num_programs(1)

        @pl.when((p == 0) & (t == 0))
        def _():
            bsums_s[...] = jnp.zeros_like(bsums_s)
            for o in list(dw_outs) + list(db_outs):
                o[...] = jnp.zeros_like(o)

        # Phase j in 0..L-1 accumulates layer (L-1-j)'s BN sums; phase L
        # emits parameter grads (+ dX).
        for j in range(L):
            li = L - 1 - j

            @pl.when(p == j)
            def _(li=li):
                h, acts, xhats, masks = _prefix(x_ref, refs, stats_ref, L,
                                                eps, dtype)
                da_top = _pool_grad(acts[L],
                                    dout_ref[...].astype(jnp.float32), pool)
                _, da = _backprop_to(refs, stats_ref, bsums_s, acts, xhats,
                                     masks, da_top, li + 1, L, rows, dtype)
                dy = da * masks[li].astype(dtype)
                c = widths[li]
                bsums_s[li, 0, :c] += jnp.sum(dy, axis=0,
                                              dtype=jnp.float32)
                bsums_s[li, 1, :c] += jnp.sum(dy * xhats[li], axis=0,
                                              dtype=jnp.float32)

        @pl.when(p == L)
        def _():
            h, acts, xhats, masks = _prefix(x_ref, refs, stats_ref, L, eps,
                                            dtype)
            da_top = _pool_grad(acts[L], dout_ref[...].astype(jnp.float32),
                                pool)
            captured, _ = _backprop_to(refs, stats_ref, bsums_s, acts,
                                       xhats, masks, da_top, 0, L, rows,
                                       dtype)
            for l_idx, dp in captured:
                dw_outs[l_idx][...] += jax.lax.dot_general(
                    acts[l_idx].astype(jnp.float32), dp,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                db_outs[l_idx][0, :] += jnp.sum(dp, axis=0,
                                                dtype=jnp.float32)
            if need_dx:
                dp0 = [dp for l_idx, dp in captured if l_idx == 0][0]
                W0 = refs[0][0]
                dx_out[...] = _dot(dp0, jnp.swapaxes(W0[...], 0, 1),
                                   jnp.float32)

            @pl.when(t == nt - 1)
            def _():
                bsums_out[...] = bsums_s[...]

    return kernel


def sa_train_backward_unified(
    x: Array,
    layers: Tuple[SALayerParams, ...],
    stats_packed: Array,
    dout: Array,
    pool_size: int,
    eps: float = 1e-5,
    compute_dtype=jnp.float32,
    interpret: bool = False,
    need_dx: bool = True,
):
    """Single-pallas_call backward. Same contract as
    sa_train_backward_pallas."""
    L = len(layers)
    R, C0 = x.shape
    widths = [lp.kernel.shape[1] for lp in layers]
    cmax = max(widths)
    tile = _pick_tile(R, pool_size, cmax)
    if R % (tile // 2) == 0 and (tile // 2) % pool_size == 0:
        tile //= 2
    flat = _flatten_params(layers)
    x = x.astype(jnp.float32) if compute_dtype == jnp.float32 else x

    in_specs = [pl.BlockSpec((tile, C0), lambda p, t: (t, 0),
                             memory_space=pltpu.VMEM)]
    for prm in flat:
        in_specs.append(pl.BlockSpec(prm.shape, (lambda p, t: (0, 0)),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(stats_packed.shape,
                                 lambda p, t: (0, 0, 0),
                                 memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((tile // pool_size, widths[-1]),
                                 lambda p, t: (t, 0),
                                 memory_space=pltpu.VMEM))

    out_shapes = []
    out_specs = []
    if need_dx:
        out_shapes.append(jax.ShapeDtypeStruct((R, C0), jnp.float32))
        out_specs.append(pl.BlockSpec((tile, C0), lambda p, t: (t, 0),
                                      memory_space=pltpu.VMEM))
    for li in range(L):
        cin = layers[li].kernel.shape[0]
        out_shapes.append(jax.ShapeDtypeStruct((cin, widths[li]),
                                               jnp.float32))
        out_specs.append(pl.BlockSpec((cin, widths[li]),
                                      lambda p, t: (0, 0),
                                      memory_space=pltpu.VMEM))
    for li in range(L):
        out_shapes.append(jax.ShapeDtypeStruct((1, widths[li]), jnp.float32))
        out_specs.append(pl.BlockSpec((1, widths[li]), lambda p, t: (0, 0),
                                      memory_space=pltpu.VMEM))
    out_shapes.append(jax.ShapeDtypeStruct((L, 2, cmax), jnp.float32))
    out_specs.append(pl.BlockSpec((L, 2, cmax), lambda p, t: (0, 0, 0),
                                  memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        _make_unified_bwd_kernel(L, pool_size, eps, compute_dtype, R,
                                 widths, cmax, need_dx, C0),
        grid=(L + 1, R // tile),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=[pltpu.VMEM((L, 2, cmax), jnp.float32)],
        interpret=interpret,
    )(x, *flat, stats_packed, dout)

    outs = list(outs)
    bsums = outs.pop()
    if need_dx:
        dx = outs[0]
        dws = outs[1:1 + L]
        dbs = [o[0] for o in outs[1 + L:1 + 2 * L]]
    else:
        dx = None
        dws = outs[0:L]
        dbs = [o[0] for o in outs[L:2 * L]]
    grads = []
    for li in range(L):
        c = widths[li]
        grads.append((dws[li], dbs[li], bsums[li, 1, :c], bsums[li, 0, :c]))
    return dx, grads


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _pool_grad(a_last, dout, pool):
    """JAX-exact max-pool backward: even split among ties.

    Bool comparisons are kept 2-D (Mosaic mis-lays-out 3-D i1 vectors);
    only f32 tensors take the 3-D reshape for the group reductions.
    """
    T, C = a_last.shape
    G = T // pool

    def up(v):  # (G, C) -> (T, C) group-wise broadcast
        return jnp.broadcast_to(v[:, None, :], (G, pool, C)).reshape(T, C)

    af = a_last.astype(jnp.float32)
    mx = jnp.max(af.reshape(G, pool, C), axis=1)             # (G, C)
    ties = (af == up(mx)).astype(jnp.float32)                # 2-D compare
    cnt = jnp.sum(ties.reshape(G, pool, C), axis=1)
    return ties * up(dout) / up(cnt)


def _backprop_to(refs, stats_ref, bsums_ref, acts, xhats, masks, da_top,
                 upto, L, R, dtype):
    """Propagate gradient from layer L-1's activation down to layer
    ``upto``'s pre-activation. ``bsums_ref[l]`` holds this batch's global
    (sum dy, sum dy*xhat) for layers > upto (already accumulated).
    Returns dp at layer ``upto`` plus per-layer (dp, a_in) seen on the way.

    Full-tensor math stays in f32 (f32-native VPU; see _layer_forward);
    per-channel scalar terms are folded first.
    """
    da = da_top
    captured = []
    for li in range(L - 1, upto - 1, -1):
        W, b, g, be = refs[li]
        c = W.shape[1]
        dy = da * masks[li].astype(jnp.float32)
        s_dy = bsums_ref[li, 0, :c]
        s_dyx = bsums_ref[li, 1, :c]
        inv = stats_ref[li, 1, :c]
        gam = g[...][0].astype(jnp.float32)
        gi = gam * inv
        dp = gi[None, :] * (
            dy - (s_dy / R)[None, :] - xhats[li] * (s_dyx / R)[None, :])
        captured.append((li, dp))
        if li > 0:
            da = _dot(dp, jnp.swapaxes(W[...], 0, 1), dtype)
        else:
            da = dp  # placeholder; dX handled by caller
    return captured, da


def _make_bwd_kernel(L, li, pool, eps, dtype, emit_dx, rows,
                     need_dx=True):
    """Backward sweep for target layer ``li``:
    - recompute forward, pool grad, propagate down to layer li,
    - accumulate (sum dy, sum dy*xhat) for layer li into bsums_out,
    - accumulate dW/db for layers above li discovered during propagation
      (each dp at layer l pairs with acts[l] for dW_l).
    The last sweep (li == -1 sentinel via emit_dx) writes dX.
    """
    def kernel(*args):
        x_ref = args[0]
        refs = _param_refs(args[1:1 + 4 * L], L)
        stats_ref = args[1 + 4 * L]
        dout_ref = args[2 + 4 * L]
        bsums_ref = args[3 + 4 * L]
        outs = args[4 + 4 * L:]

        first = pl.program_id(0) == 0

        h, acts, xhats, masks = _prefix(x_ref, refs, stats_ref, L, eps,
                                        dtype)
        da_top = _pool_grad(acts[L], dout_ref[...].astype(jnp.float32),
                            pool)
        R_total = rows

        if not emit_dx:
            # Accumulate layer li's global BN sums.
            sums_out = outs[0]

            @pl.when(first)
            def _():
                sums_out[...] = jnp.zeros_like(sums_out)

            captured, da = _backprop_to(refs, stats_ref, bsums_ref, acts,
                                        xhats, masks, da_top, li + 1, L,
                                        R_total, dtype)
            dy = da * masks[li].astype(dtype)
            sums_out[0, :] += jnp.sum(dy, axis=0, dtype=jnp.float32)
            sums_out[1, :] += jnp.sum(dy * xhats[li], axis=0,
                                      dtype=jnp.float32)
        else:
            # Final sweep: full propagation to dX + parameter grads.
            if need_dx:
                dx_out = outs[0]
                dw_outs = outs[1:1 + L]
                db_outs = outs[1 + L:1 + 2 * L]
            else:
                dw_outs = outs[0:L]
                db_outs = outs[L:2 * L]

            @pl.when(first)
            def _():
                for o in list(dw_outs) + list(db_outs):
                    o[...] = jnp.zeros_like(o)

            captured, da = _backprop_to(refs, stats_ref, bsums_ref, acts,
                                        xhats, masks, da_top, 0, L,
                                        R_total, dtype)
            for l_idx, dp in captured:
                dw_outs[l_idx][...] += jax.lax.dot_general(
                    acts[l_idx].astype(jnp.float32), dp,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                db_outs[l_idx][0, :] += jnp.sum(dp, axis=0,
                                                dtype=jnp.float32)
            if need_dx:
                # dX: dp at layer 0 times W0^T.
                dp0 = [dp for l_idx, dp in captured if l_idx == 0][0]
                W0 = refs[0][0]
                dx_out[...] = _dot(dp0, jnp.swapaxes(W0[...], 0, 1),
                                   jnp.float32)

    return kernel


def sa_train_backward_pallas(
    x: Array,
    layers: Tuple[SALayerParams, ...],
    stats_packed: Array,
    dout: Array,
    pool_size: int,
    eps: float = 1e-5,
    compute_dtype=jnp.float32,
    interpret: bool = False,
    need_dx: bool = True,
):
    """Returns (dx, [per-layer (dW, db, dgamma, dbeta)]); dx is None when
    ``need_dx`` is False (saves a full (R, C0) write + matmul — the
    training step never differentiates w.r.t. the grouped points)."""
    L = len(layers)
    R, C0 = x.shape
    widths = [lp.kernel.shape[1] for lp in layers]
    cmax = max(widths)
    # The backward sweeps hold ~2x the forward's live VMEM (activations +
    # gradients per layer): halve the tile.
    tile = _pick_tile(R, pool_size, cmax)
    if R % (tile // 2) == 0 and (tile // 2) % pool_size == 0:
        tile //= 2
    flat = _flatten_params(layers)

    dout_spec = pl.BlockSpec((tile // pool_size, widths[-1]),
                             lambda t: (t, 0), memory_space=pltpu.VMEM)
    bsums = jnp.zeros((L, 2, cmax), jnp.float32)
    bsums_spec_in = pl.BlockSpec(bsums.shape, lambda t: (0, 0, 0),
                                 memory_space=pltpu.VMEM)

    # Top-down BN-sum sweeps.
    for li in range(L - 1, -1, -1):
        c = widths[li]
        sums = _grid_call(
            _make_bwd_kernel(L, li, pool_size, eps, compute_dtype, False, R),
            x, flat, stats_packed,
            jax.ShapeDtypeStruct((2, c), jnp.float32),
            pl.BlockSpec((2, c), lambda t: (0, 0), memory_space=pltpu.VMEM),
            tile,
            extra_inputs=(dout, bsums),
            extra_specs=(dout_spec, bsums_spec_in),
            interpret=interpret)
        pad = cmax - c
        bsums = bsums.at[li].set(
            jnp.stack([jnp.pad(sums[0], (0, pad)),
                       jnp.pad(sums[1], (0, pad))]))

    # Final sweep: dX + dW/db accumulation.
    out_shapes = []
    out_specs = []
    if need_dx:
        out_shapes.append(jax.ShapeDtypeStruct((R, C0), jnp.float32))
        out_specs.append(pl.BlockSpec((tile, C0), lambda t: (t, 0),
                                      memory_space=pltpu.VMEM))
    for li in range(L):
        cin = layers[li].kernel.shape[0]
        out_shapes.append(jax.ShapeDtypeStruct((cin, widths[li]),
                                               jnp.float32))
        out_specs.append(pl.BlockSpec((cin, widths[li]), lambda t: (0, 0),
                                      memory_space=pltpu.VMEM))
    for li in range(L):
        out_shapes.append(jax.ShapeDtypeStruct((1, widths[li]), jnp.float32))
        out_specs.append(pl.BlockSpec((1, widths[li]), lambda t: (0, 0),
                                      memory_space=pltpu.VMEM))

    outs = _grid_call(
        _make_bwd_kernel(L, -1, pool_size, eps, compute_dtype, True, R,
                         need_dx),
        x, flat, stats_packed,
        tuple(out_shapes), tuple(out_specs),
        tile,
        extra_inputs=(dout, bsums),
        extra_specs=(dout_spec, bsums_spec_in),
        interpret=interpret)

    if need_dx:
        dx = outs[0]
        dws = outs[1:1 + L]
        dbs = [o[0] for o in outs[1 + L:1 + 2 * L]]
    else:
        dx = None
        dws = outs[0:L]
        dbs = [o[0] for o in outs[L:2 * L]]
    grads = []
    for li in range(L):
        c = widths[li]
        # dgamma = sum(dy * xhat); dbeta = sum(dy) — already in bsums.
        grads.append((dws[li], dbs[li], bsums[li, 1, :c], bsums[li, 0, :c]))
    return dx, grads
