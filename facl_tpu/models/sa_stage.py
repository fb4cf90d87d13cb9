"""Set-abstraction stage module: [Dense->BN->ReLU]xL + max over neighbors.

Owns its parameters directly (so checkpoints are identical whichever
compute path runs) and dispatches between:
  * the pure-JAX reference math (facl_tpu.ops.fused_sa.sa_train_reference)
    — used on CPU/GPU, in eval mode, and as the parity baseline;
  * the fused Pallas kernels (sa_train_fused) on TPU in train mode — same
    semantics, ~none of the HBM intermediate traffic.

Multi-chip note: the fused kernels are single-device programs; under a
GSPMD-sharded batch use ``impl='reference'`` (XLA partitions it and keeps
BN statistics global) or wrap the call in shard_map. Single-chip training
(the benchmarked config) uses the fused path.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from facl_tpu.ops.fused_sa import (
    SALayerParams,
    sa_eval_reference,
    sa_train_fused,
    sa_train_reference,
)

Array = jax.Array


def covar_moments(h: Array, kernel: Array, bias: Array,
                  precision=None) -> Tuple[Array, Array]:
    """Batch statistics of ``p = h @ kernel + bias`` WITHOUT reducing p.

    mean_c = mu_x @ W_:c + b_c           with mu_x = E_rows[h]
    E[p^2]_c = (W^T Gram(h) W)_cc / n + b_c (2 mean_c - b_c)
    var = E[p^2] - mean^2

    The Gram matrix ``h^T h`` is a (C_in, C_in) MXU matmul over the layer
    *input* — for the wide SA layers (C_in=64 -> C_out=256 over ~2.6M
    rows) this removes the dominant HBM cost of BatchNorm training: the
    f32 convert+reduce over the (rows, C_out) pre-activation tensor, and
    (because nothing else consumes p) lets XLA fuse the whole
    normalize+ReLU epilogue into the forward matmul. Mathematically
    identical to E-over-rows of p and p^2 (same mean2 - mean^2
    cancellation exposure as the direct form); gradients flow through
    Gram/colsum instead of broadcast-reduce chains — also matmuls.
    """
    flat = h.reshape(-1, h.shape[-1])
    n = flat.shape[0]
    gram = jnp.einsum("ni,nj->ij", flat, flat,
                      preferred_element_type=jnp.float32,
                      precision=precision)                    # (C_in, C_in)
    sx = jnp.sum(flat.astype(jnp.float32), axis=0)            # (C_in,)
    wf = kernel.astype(jnp.float32)
    bf = bias.astype(jnp.float32)
    # The finalize dots are tiny f32 contractions with O(n) Gram entries;
    # TPU DEFAULT would round them through bf16 (sa_bwd._layer_terms).
    hp = jax.lax.Precision.HIGHEST
    mean = jnp.matmul(sx, wf, precision=hp) / n + bf
    e2 = jnp.einsum("ic,ic->c", jnp.matmul(gram, wf, precision=hp), wf,
                    precision=hp) / n + bf * (2.0 * mean - bf)
    # Clamped at 0: the identity rounds negative on constant channels
    # (rsqrt(var+eps) would NaN past -eps).
    var = jnp.maximum(e2 - mean * mean, 0.0)
    return mean, var


class SetAbstractionStage(nn.Module):
    widths: Sequence[int]
    bn_momentum: float = 0.9
    dtype: jnp.dtype = jnp.float32
    epsilon: float = 1e-5
    impl: str = "auto"   # auto|reference|covar|pallas|analytic|hybrid|hybrid2|pair|pair3
    # The contrastive training step never differentiates w.r.t. the grouped
    # points (they are data); skipping dX saves a full-tensor write.
    input_grad: bool = False
    # Channel-major (B, C, S, K) input (the fused select+gather kernel's
    # native layout). Consumed transpose-free by the "pair" train path;
    # every other impl (and eval mode) transposes back to channels-last
    # first — correct everywhere, fast where it matters.
    channels_first: bool = False
    # Device mesh for the "pair"/"pair3" train path: when set (and
    # >1 device), the paired-row Pallas sweeps run per-shard under
    # shard_map with GLOBAL BatchNorm statistics psum'd over
    # ``shard_axis`` (ops/pallas/sa_pair.py::make_sharded_pair) —
    # keeping the fast kernels on multi-chip meshes instead of falling
    # back to the XLA reference path.
    mesh: Any = None
    shard_axis: str = "dp"

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        """x: (..., K, C) — pooling runs over the second-to-last axis —
        or (B, C, S, K) with ``channels_first``. Returns (..., C_last)."""
        cf = self.channels_first
        if cf:
            if x.ndim != 4:
                raise ValueError("channels_first expects (B, C, S, K) "
                                 f"neighborhoods, got {x.shape}")
            if not (train and self.impl in ("pair", "pair3")):
                x = jnp.transpose(x, (0, 2, 3, 1))
                cf = False
        if cf:
            B_, C, S_, K = x.shape
            lead = [B_, S_]
        else:
            *lead, K, C = x.shape
        cin = C
        layers = []
        running = []
        for i, w in enumerate(self.widths):
            kernel = self.param(f"kernel_{i}", nn.initializers.lecun_normal(),
                                (cin, w))
            bias = self.param(f"bias_{i}", nn.initializers.zeros, (w,))
            scale = self.param(f"scale_{i}", nn.initializers.ones, (w,))
            shift = self.param(f"shift_{i}", nn.initializers.zeros, (w,))
            layers.append(SALayerParams(kernel, bias, scale, shift))
            mean = self.variable("batch_stats", f"mean_{i}",
                                 lambda: jnp.zeros((w,), jnp.float32))
            var = self.variable("batch_stats", f"var_{i}",
                                lambda: jnp.ones((w,), jnp.float32))
            running.append((mean, var))
            cin = w
        layers = tuple(layers)

        rows = 1
        for d in lead:
            rows *= d

        if train:
            use_pallas = self.impl == "pallas"
            if use_pallas:
                flat = x.reshape(rows * K, C)
                pooled, stats = sa_train_fused(
                    flat, layers, K, self.epsilon, self.dtype, False,
                    self.input_grad)
                pooled = pooled.reshape(*lead, self.widths[-1])
            elif self.impl == "analytic":
                # Same forward values as the reference path; hand-derived
                # VJP that replaces autodiff's convert+reduce chains over
                # the (rows, C) tensors with Gram-matrix algebra
                # (ops/analytic_sa.py).
                from facl_tpu.ops.analytic_sa import sa_train_analytic
                pooled, stats = sa_train_analytic(
                    x, layers, self.epsilon, jnp.dtype(self.dtype))
            elif self.impl == "hybrid":
                # XLA forward + the 2-sweep Pallas analytic backward
                # (ops/pallas/sa_bwd.py). dx contract is ZERO — valid
                # because the contrastive step treats neighborhoods as
                # data; guarded by input_grad.
                if self.input_grad:
                    raise ValueError(
                        "sa impl 'hybrid' defines a zero input cotangent;"
                        " use 'analytic' when input gradients are needed")
                from facl_tpu.ops.pallas.sa_bwd import sa_train_hybrid
                pooled, stats = sa_train_hybrid(
                    x, layers, self.epsilon, jnp.dtype(self.dtype),
                    jax.default_backend() == "cpu")
            elif self.impl == "hybrid2":
                # Full-Pallas: forward sweeps produce the p1/p2 residuals
                # in-kernel (no XLA layout copies on the Pallas operands)
                # + the same 2-sweep backward (ops/pallas/sa_fwd.py).
                # Same zero-dx contract as 'hybrid'.
                if self.input_grad:
                    raise ValueError(
                        "sa impl 'hybrid2' defines a zero input cotangent;"
                        " use 'analytic' when input gradients are needed")
                from facl_tpu.ops.pallas.sa_fwd import sa_train_pfwd
                pooled, stats = sa_train_pfwd(
                    x, layers, self.epsilon, jnp.dtype(self.dtype),
                    jax.default_backend() == "cpu")
            elif self.impl in ("pair", "pair3"):
                # hybrid2 in the paired-row (full-lane-width) layout:
                # rows r and r+R/2 ride side-by-side as (R/2, 2C) with
                # block-diagonal weights, so the 64-wide trunk uses all
                # 128 VPU lanes and the full MXU (ops/pallas/sa_pair.py).
                # 'pair3' opts into the slim 3-sweep backward (layer-1
                # dy-contraction formed directly instead of via
                # third-order moments). Same zero-dx contract as
                # 'hybrid'/'hybrid2'.
                if self.input_grad:
                    raise ValueError(
                        "sa impl 'pair' defines a zero input cotangent;"
                        " use 'analytic' when input gradients are needed")
                if self.mesh is not None and self.mesh.size > 1:
                    from facl_tpu.ops.pallas.sa_pair import \
                        make_sharded_pair
                    fn = make_sharded_pair(
                        self.mesh, self.shard_axis, self.epsilon,
                        jnp.dtype(self.dtype), self.impl == "pair3",
                        cf, jax.default_backend() == "cpu")
                    pooled, stats = fn(x, layers)
                else:
                    from facl_tpu.ops.pallas.sa_pair import (
                        sa_train_pair, sa_train_pair_cf)
                    fn = sa_train_pair_cf if cf else sa_train_pair
                    pooled, stats = fn(
                        x, layers, self.epsilon, jnp.dtype(self.dtype),
                        jax.default_backend() == "cpu",
                        self.impl == "pair3")
            else:
                # "covar" opts into Gram-matrix BN statistics: the same
                # moments, ~none of the pre-activation reduce traffic on
                # paper — but device-measured it REGRESSES the full step
                # (the gradient through the Gram/colsum path schedules
                # pathologically under XLA; round-2 matrix: reference
                # 1838 clips/s, covar timed out at <~600). "auto"
                # therefore resolves to the direct convert+reduce form,
                # which XLA fuses best.
                stats_mode = "covar" if self.impl == "covar" else "direct"
                pooled, stats = self._reference_4d(x, layers, train=True,
                                                   stats_mode=stats_mode)
            if not self.is_initializing():
                m = self.bn_momentum
                for (mean_v, var_v), (mean, var) in zip(running, stats):
                    mean_v.value = m * mean_v.value + (1 - m) * mean
                    var_v.value = m * var_v.value + (1 - m) * var
        else:
            pooled, _ = self._reference_4d(
                x, layers, train=False,
                running=[(mv.value, vv.value) for mv, vv in running])
        return pooled.astype(self.dtype)

    def _reference_4d(self, x: Array, layers, train: bool, running=None,
                      stats_mode: str = "direct"):
        """Reference path on the native (..., K, C) layout — the exact op
        sequence flax Dense+BatchNorm+ReLU used (reductions over all
        non-channel axes, normalization via promoted arithmetic), which XLA
        fuses well. Mathematically identical to
        facl_tpu.ops.fused_sa.sa_train_reference.

        ``stats_mode="covar"`` computes the SAME batch moments from the
        input Gram matrix (see :func:`covar_moments`) — equal values up to
        float round-off, far less HBM traffic."""
        h = x.astype(self.dtype)
        axes = tuple(range(h.ndim - 1))
        # Strict f32 parity mode keeps full matmul precision for moments.
        prec = (jax.lax.Precision.HIGHEST
                if self.dtype == jnp.float32 else None)
        stats = []
        for i, lp in enumerate(layers):
            p = h @ lp.kernel.astype(self.dtype) + lp.bias.astype(self.dtype)
            if train:
                if stats_mode == "covar":
                    mean, var = covar_moments(h, lp.kernel, lp.bias,
                                              precision=prec)
                else:
                    pf32 = p.astype(jnp.float32)
                    mean = jnp.mean(pf32, axis=axes)
                    mean2 = jnp.mean(jnp.square(pf32), axis=axes)
                    # Clamp: the identity rounds negative on (near-)
                    # constant channels and rsqrt(var+eps) NaNs past
                    # -eps (degenerate all-zero videos, r4 verify drive).
                    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
                stats.append((mean, var))
            else:
                mean, var = running[i]
            # Folded affine: y = p*A + B with per-channel A/B — halves the
            # full-tensor elementwise work vs ((p-mean)*inv)*gamma+beta.
            mul = jax.lax.rsqrt(var + self.epsilon) * lp.scale
            shift = lp.shift - mean * mul
            y = (p * mul + shift).astype(self.dtype)
            h = jax.nn.relu(y)
        pooled = jnp.max(h, axis=-2)
        return pooled, stats
