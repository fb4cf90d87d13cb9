"""Shared building blocks for the point encoders.

The reference's 1x1 ``Conv2d + BatchNorm2d + ReLU`` stacks
(cn3d_model_conbag.py:43-77) are, semantically, per-point Dense layers over
the channel dim — on TPU we express them as plain matmuls (MXU) over a
channels-last layout and let XLA fuse the BN/ReLU epilogues.

BatchNorm statistics are computed over every non-channel axis, i.e. over
(crops*batch, groups, neighbors) jointly, exactly like torch BatchNorm2d on
the reference's (640, C, 64, 64) tensors. Under GSPMD ``jit`` with the batch
sharded over the ``dp`` mesh axis, XLA computes these reductions over the
*global* logical batch — cross-replica BN falls out for free (the
accuracy-parity risk flagged in SURVEY §7 "Hard parts").
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class PointMLP(nn.Module):
    """Stack of [Dense -> BatchNorm -> ReLU] applied to the trailing channel
    dim of an arbitrary-rank input (the 1x1-conv shared MLP)."""
    widths: Sequence[int]
    bn_momentum: float = 0.9
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        for i, w in enumerate(self.widths):
            x = nn.Dense(w, dtype=self.dtype, name=f"dense_{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=1e-5,        # torch BatchNorm default
                dtype=self.dtype,
            )(x)
            x = nn.relu(x)
        return x


class EmbedHead(nn.Module):
    """The reference's ``netR_FC``: Linear -> BN1d -> ReLU -> Linear
    (cn3d_model_conbag.py:82-88). Shared between the per-crop (local) and
    per-video (global) paths — parameter sharing included."""
    hidden: int = 1024
    out: int = 512
    bn_momentum: float = 0.9
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=self.bn_momentum, epsilon=1e-5,
                         dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.Dense(self.out, dtype=self.dtype)(x)


def l2_normalize(x: Array, axis: int = -1, eps: float = 1e-12) -> Array:
    """torch F.normalize(p=2) semantics (clamped norm)."""
    norm = jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)
    return x / norm
