"""Explicit collectives for shard_map-style code paths.

Under GSPMD ``jit`` none of these are needed — XLA derives them. They exist
for users who drop to ``jax.shard_map`` (e.g. custom pipelines or Pallas
collective kernels) and as the TPU-native statement of the reference's dead
torch.distributed code (``concat_all_gather``, cn3d_model_conbag.py:559-570;
commented ``all_reduce``, :397,402).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def gather_negatives(x: Array, axis_name: str) -> Array:
    """All-gather per-replica embeddings into the global negative pool —
    the working version of ``concat_all_gather``. Gradients flow to the
    local shard only (torch's all_gather has no gradient either)."""
    gathered = jax.lax.all_gather(jax.lax.stop_gradient(x), axis_name,
                                  axis=0, tiled=True)
    # Re-insert the differentiable local block at this replica's offset.
    idx = jax.lax.axis_index(axis_name) * x.shape[0]
    return jax.lax.dynamic_update_slice_in_dim(gathered, x, idx, axis=0)


def psum_grads(grads, axis_name: str):
    """Gradient all-reduce (the DDP psum)."""
    return jax.lax.pmean(grads, axis_name)


def cross_replica_mean(x: Array, axis_name: str) -> Array:
    """Cross-replica statistics reduction (for syncBN-style usage)."""
    return jax.lax.pmean(x, axis_name)
