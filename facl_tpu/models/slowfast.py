"""Two-pathway (SlowFast-style) point encoder.

Re-derivation of ``PointNet_Slow_Fast`` (cn3d_model_conbag.py:243-387): a
slow branch (grouped with K=128, widths 16/64/128 -> 128/256/512) and a fast
branch (K=64, widths 64/128/256 -> 256/512/1024) with bidirectional 1x1-conv
lateral fusion concatenated along the *group* axis (:374-375), then
independent FC heads producing two 512-d embeddings.

Not used by any reference driver, and the shipped torch pooling is
inconsistent (a (64,1) stride-1 max-pool over a 2S-row tensor leaves a
dangling axis that would crash the Linear that follows). We implement the
evident intent: pool over the full group axis to one vector per cloud.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from facl_tpu.config import ModelConfig
from facl_tpu.models.layers import EmbedHead, PointMLP

Array = jax.Array


class PointNetSlowFast(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, slow_neigh: Array, fast_neigh: Array,
                 train: bool = True) -> Tuple[Array, Array]:
        """slow_neigh: (B, S, K_slow, C); fast_neigh: (B, S, K_fast, C).
        Returns (x_fast, x_slow), each (B, embed_dim)."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        mom = cfg.bn_momentum

        h_slow = PointMLP(cfg.slow_widths1, bn_momentum=mom, dtype=dtype,
                          name="slow1")(slow_neigh.astype(dtype), train=train)
        h_fast = PointMLP(cfg.fast_widths1, bn_momentum=mom, dtype=dtype,
                          name="fast1")(fast_neigh.astype(dtype), train=train)
        h_slow = jnp.max(h_slow, axis=2)        # (B, S, 128)
        h_fast = jnp.max(h_fast, axis=2)        # (B, S, 256)

        # Lateral 1x1-conv fusion (cn3d_model_conbag.py:354-358), fused by
        # concatenation along the group axis (:374-375).
        s2f = nn.Dense(cfg.fast_widths1[-1], dtype=dtype,
                       name="slow_to_fast")(h_slow)
        f2s = nn.Dense(cfg.slow_widths1[-1], dtype=dtype,
                       name="fast_to_slow")(h_fast)
        h_slow = jnp.concatenate([h_slow, f2s], axis=1)   # (B, 2S, 128)
        h_fast = jnp.concatenate([h_fast, s2f], axis=1)   # (B, 2S, 256)

        h_slow = PointMLP(cfg.slow_widths3, bn_momentum=mom, dtype=dtype,
                          name="slow3")(h_slow, train=train)
        h_fast = PointMLP(cfg.fast_widths3, bn_momentum=mom, dtype=dtype,
                          name="fast3")(h_fast, train=train)
        h_slow = jnp.max(h_slow, axis=1)        # (B, 512)
        h_fast = jnp.max(h_fast, axis=1)        # (B, 1024)

        x_slow = EmbedHead(cfg.fc_hidden, cfg.embed_dim, bn_momentum=mom,
                           dtype=dtype, name="head_slow")(h_slow, train=train)
        x_fast = EmbedHead(cfg.fc_hidden, cfg.embed_dim, bn_momentum=mom,
                           dtype=dtype, name="head_fast")(h_fast, train=train)
        return x_fast.astype(jnp.float32), x_slow.astype(jnp.float32)
