"""Linear probe head (linear_classify/fc_model.py:12-25).

L2-normalize the concatenated per-video features, then a single Linear to
class logits. Init matches the reference: weight ~ N(0, 0.01), bias zero.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from facl_tpu.models.layers import l2_normalize

Array = jax.Array


class LinearProbe(nn.Module):
    num_classes: int = 120

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = l2_normalize(x, axis=1)
        return nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.normal(stddev=0.01),
            bias_init=nn.initializers.zeros,
        )(x)
