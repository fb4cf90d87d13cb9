"""CLD (cross-level discrimination) loss with on-device k-means.

Re-derivation of ``KMeans``/``grouping``/``CLD_Loss``
(utils_my.py:152-198, duplicated in both trainers at
cn3d_train_apperance_GL.py:36-70). Gated OFF by default (``cld_if=0``,
:319), but functional.

k-means TPU-style: the reference's scatter_add centroid update becomes a
one-hot matmul (MXU) inside a ``fori_loop`` — no dynamic shapes.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from facl_tpu.losses.infonce import cross_entropy
from facl_tpu.ops.grouping import pairwise_sqdist

Array = jax.Array


@partial(jax.jit, static_argnames=("num_clusters", "num_iters"))
def kmeans(x: Array, num_clusters: int = 60,
           num_iters: int = 5) -> Tuple[Array, Array]:
    """Lloyd iterations with first-K init (utils_my.py:180-198).

    x: (N, D). Returns (labels (N,), centroids (K, D)). Empty clusters keep
    a zero sum divided by count 1 — exactly the reference's behavior.
    """
    K = num_clusters
    c0 = x[:K]

    def body(_, c):
        d = pairwise_sqdist(x, c)                      # (N, K)
        labels = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(labels, K, dtype=x.dtype)   # (N, K)
        sums = onehot.T @ x                            # (K, D)
        counts = jnp.sum(onehot, axis=0)               # (K,)
        counts = jnp.maximum(counts, 1.0)              # empty cluster -> 1
        return sums / counts[:, None]

    c = jax.lax.fori_loop(0, num_iters, body, c0)
    labels = jnp.argmin(pairwise_sqdist(x, c), axis=1)
    return labels, c


def cld_pair_loss(f1: Array, f2: Array, temp: float = 0.05,
                  num_clusters: int = 60, num_iters: int = 5) -> Array:
    """Symmetric cross-cluster CE between two feature groups
    (``grouping``, utils_my.py:164-178)."""
    l1, c1 = kmeans(f1, num_clusters, num_iters)
    l2, c2 = kmeans(f2, num_clusters, num_iters)
    loss = cross_entropy((f1 @ c2.T) / temp, l2)
    loss = loss + cross_entropy((f2 @ c1.T) / temp, l1)
    return loss / 2.0


def cld_loss(x_nor: Array, temp: float = 0.05, num_clusters: int = 60,
             num_iters: int = 5) -> Array:
    """CLD over sliding 3-crop windows (``CLD_Loss``, utils_my.py:152-161):
    for i in 0..G-5: pair (crops i..i+2) vs (crops i+1..i+3).

    x_nor: (G, B, D) normalized per-crop embeddings.
    """
    G, B, D = x_nor.shape
    flat = x_nor.reshape(G * B, D)

    def window(i):
        a = jax.lax.dynamic_slice_in_dim(flat, i * B, 3 * B, axis=0)
        b = jax.lax.dynamic_slice_in_dim(flat, (i + 1) * B, 3 * B, axis=0)
        return cld_pair_loss(a, b, temp, num_clusters, num_iters)

    losses = jax.vmap(window)(jnp.arange(G - 4))
    return jnp.sum(losses)
