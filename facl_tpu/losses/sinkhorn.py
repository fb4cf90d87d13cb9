"""Sinkhorn normalization + SwAV swap-prediction loss.

Re-derivation of ``distributed_sinkhorn``/``shoot_infs``
(cn3d_model_conbag.py:391-425) and the trainer's SwAV block
(cn3d_train_apperance_GL.py:237-263). Gated OFF by default, exactly like the
reference (``swa_if=0``), but fully functional and jit-able.

Multi-chip: the reference left its ``dist.all_reduce`` calls commented out
(:397,402). Here the row/column sums are plain jnp reductions over the
logical global array; under GSPMD jit they are global automatically. When
used inside ``shard_map`` instead, pass ``axis_name`` to reduce over the
mesh — this is the TPU-native form of those dead all_reduces.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def shoot_infs(x: Array) -> Array:
    """Replace +-inf entries by the max of the remaining entries
    (cn3d_model_conbag.py:409-425)."""
    mask = jnp.isinf(x)
    zeroed = jnp.where(mask, 0.0, x)
    m = jnp.max(zeroed)
    return jnp.where(mask, m, zeroed)


@partial(jax.jit, static_argnames=("num_iters", "axis_name"))
def sinkhorn(Q: Array, num_iters: int = 3,
             axis_name: Optional[str] = None) -> Array:
    """Sinkhorn-Knopp row/column balancing (cn3d_model_conbag.py:391-406).

    Q: (K, N) positive scores (prototypes x samples).
    Returns the (N, K) assignment matrix ``(Q / colsum).T``.
    """
    def preduce(v):
        return jax.lax.psum(v, axis_name) if axis_name else v

    Q = shoot_infs(Q)
    Q = Q / preduce(jnp.sum(Q))
    K = Q.shape[0]
    N = Q.shape[1]
    r = 1.0 / K
    c = 1.0 / N

    def safe_col(Q):
        s = jnp.sum(Q, axis=0)
        # All-zero columns (e.g. inactive queue slots) stay zero instead of
        # going NaN; the uniform column target c makes this exactly
        # equivalent to running sinkhorn without those columns.
        return jnp.where(s > 0, c / s, 0.0)[None, :]

    def body(_, Q):
        u = preduce(jnp.sum(Q, axis=1))
        u = shoot_infs(r / u)
        Q = Q * u[:, None]
        Q = Q * safe_col(Q)
        return Q

    Q = jax.lax.fori_loop(0, num_iters, body, Q)
    colsum = jnp.sum(Q, axis=0, keepdims=True)
    return (Q / jnp.where(colsum > 0, colsum, 1.0)).T


def swav_loss(
    code: Array,
    x_nor: Array,
    mapping_weight: Array,
    queue: Optional[Array],
    use_queue: bool,
    temp_code: float = 0.03,
    temp_pred: float = 0.1,
    num_iters: int = 3,
) -> Tuple[Array, Optional[Array]]:
    """SwAV swap-prediction over crops (cn3d_train_apperance_GL.py:239-263).

    Only the first G-1 crops participate (the reference iterates
    ``range(num_crop-1)``). For each crop: compute sinkhorn targets q from
    its (queue-extended) prototype scores, then predict q from every *other*
    participating crop's softmaxed code.

    Args:
      code:  (G, B, P) prototype logits per crop.
      x_nor: (G, B, D) normalized embeddings (enqueued for future steps).
      mapping_weight: (D, P) prototype matrix (to score queued embeddings).
      queue: (G-1, Q, D) or None.
      use_queue: static or traced bool — whether queued scores extend po.

    Returns (loss, new_queue).
    """
    G, B, P = code.shape
    Gm1 = G - 1
    part_codes = code[:Gm1]                                   # (G-1, B, P)

    def targets_for(crop):
        po = part_codes[crop]                                 # (B, P)
        if queue is not None:
            q_scores = queue[crop] @ mapping_weight           # (Q, P)
            q_scores = jnp.where(use_queue, q_scores,
                                 jnp.full_like(q_scores, -jnp.inf))
            po_full = jnp.concatenate([q_scores, po], axis=0)
        else:
            po_full = po
        po_full = jnp.exp(po_full / temp_code).T              # (P, Q+B)
        q = sinkhorn(po_full, num_iters)                      # (Q+B, P)
        return jax.lax.stop_gradient(q[-B:])                  # (B, P)

    q_all = jax.vmap(targets_for)(jnp.arange(Gm1))            # (G-1, B, P)
    logp = jax.nn.log_softmax(part_codes / temp_pred, axis=-1)

    # subloss[crop] = - sum_{v != crop} mean_b sum_p q[crop] * logp[v]
    ce = jnp.einsum("abp,vbp->av", q_all, logp) / B           # (G-1, G-1)
    off = 1.0 - jnp.eye(Gm1, dtype=ce.dtype)
    loss = -jnp.sum(ce * off) / Gm1

    new_queue = None
    if queue is not None:
        # Shift each crop's queue by B and prepend the fresh embeddings
        # (cn3d_train_apperance_GL.py:249-251).
        shifted = jnp.concatenate(
            [jax.lax.stop_gradient(x_nor[:Gm1]), queue[:, :-B]], axis=1)
        new_queue = shifted
    return loss, new_queue


def swav_queue_init(num_crops: int, queue_len: int, dim: int) -> Array:
    """Zero-initialized queue (G-1, Q, D), allocated when the queue starts
    (epoch >= 10 in the reference, cn3d_train_apperance_GL.py:215-220)."""
    return jnp.zeros((num_crops - 1, queue_len, dim), jnp.float32)
