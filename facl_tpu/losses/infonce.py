"""Contrastive losses: global-local InfoNCE, cross-view "circle" InfoNCE,
and the 2-view pair InfoNCE helper.

Faithful re-derivations of the reference's inline loss blocks
(cn3d_train_apperance_GL.py:265-316) / their utils_my.py copies (:53-149),
vectorized (the reference builds logits crop-by-crop in Python loops; here
each loss is a couple of einsums).

Two deliberate reference behaviors kept for accuracy parity:
  * Masked (same-video) negatives are *zeroed*, not -inf'd
    (fix_weight multiplication, cn3d_train_apperance_GL.py:192-203,276,307),
    so each masked slot still contributes exp(0)=1 to the softmax Z.
  * No temperature anywhere (T=1 implicitly).

Layout convention: per-crop embeddings are passed as ``x`` with shape
(G, B, D) — crop-major, matching the reference's (G*B, D) where crop g of
video b is row g*B+b.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

Array = jax.Array


def _ce_label0(logits: Array) -> Array:
    """Cross-entropy against label 0, mean over the batch axis (torch
    CrossEntropyLoss default reduction). logits: (..., B, 1+N)."""
    logz = jax.nn.logsumexp(logits, axis=-1)
    return jnp.mean(logz - logits[..., 0], axis=-1)


def offdiag_mask(batch: int, dtype=jnp.float32) -> Array:
    """(B, B) ones minus identity (the ``fix_weight`` block)."""
    return 1.0 - jnp.eye(batch, dtype=dtype)


def global_local_infonce(x: Array, x_global: Array) -> Array:
    """Global-local InfoNCE, ACTIVE in the reference (``global_if=1``,
    cn3d_train_apperance_GL.py:265-287).

    For each crop g: positives = <x_global[b], x[g,b]>; negatives =
    x_global @ all crop embeddings, with same-video entries zeroed. CE
    against label 0, mean over batch, summed over crops.

    x: (G, B, D) per-crop embeddings; x_global: (B, D).
    """
    G, B, D = x.shape
    pos = jnp.einsum("bd,gbd->gb", x_global, x, precision=_HI)              # (G, B)
    neg = jnp.einsum("bd,gkd->bgk", x_global, x, precision=_HI)             # (B, G, B)
    neg = neg * offdiag_mask(B, x.dtype)[:, None, :]
    neg = neg.reshape(B, G * B)                              # (B, G*B)
    # Same negative block repeated for every crop's logits (reference
    # repeats l_neg2 over crops, :278).
    logits = jnp.concatenate(
        [pos[..., None], jnp.broadcast_to(neg[None], (G, B, G * B))], axis=-1)
    return jnp.sum(_ce_label0(logits))


def circle_infonce(key: Array, x: Array) -> Array:
    """Cross-view "circle" InfoNCE, ACTIVE in the reference
    (``circle_if=1``, cn3d_train_apperance_GL.py:290-316).

    The G crops are randomly permuted; positives are the G-1 consecutive
    pairs in the shuffled chain. Every anchor's logits share one negative
    bank: the concatenation over all G-1 anchors of (anchor · every crop
    embedding), same-video entries zeroed — (G-1)*G*B negatives.

    key: PRNG key for the crop permutation (the reference uses unseeded
    np.random.shuffle, :297-298). x: (G, B, D).
    """
    G, B, D = x.shape
    perm = jax.random.permutation(key, G)
    anchors = x[perm[:-1]]                                    # (G-1, B, D)
    nexts = x[perm[1:]]                                       # (G-1, B, D)
    pos = jnp.sum(anchors * nexts, axis=-1)                   # (G-1, B)

    neg = jnp.einsum("abd,gkd->abgk", anchors, x, precision=_HI)             # (G-1,B,G,B)
    neg = neg * offdiag_mask(B, x.dtype)[None, :, None, :]
    # (B, (G-1)*G*B) shared bank: permute to batch-major then flatten the
    # (anchor, crop, video) axes (reference: permute(1,0,2).reshape, :306).
    bank = jnp.moveaxis(neg, 1, 0).reshape(B, (G - 1) * G * B)
    logits = jnp.concatenate(
        [pos[..., None],
         jnp.broadcast_to(bank[None], (G - 1, B, (G - 1) * G * B))], axis=-1)
    return jnp.sum(_ce_label0(logits))


def pair_infonce(x0: Array, x1: Array, x_all: Array) -> Tuple[Array, Array]:
    """2-view InfoNCE logits builder (``Info_NCE``, utils_my.py:200-213):
    pos = <x0, x1>; negatives = both views against all 2B embeddings with
    same-video entries zeroed. Returns (logits, labels)."""
    B = x0.shape[0]
    mask = jnp.tile(offdiag_mask(B, x0.dtype), (1, x_all.shape[0] // B))
    l_pos = jnp.sum(x0 * x1, axis=1, keepdims=True)
    l_neg0 = jnp.einsum("bd,nd->bn", x0, x_all, precision=_HI) * mask
    l_neg1 = jnp.einsum("bd,nd->bn", x1, x_all, precision=_HI) * mask
    logits = jnp.concatenate([l_pos, l_neg0, l_neg1], axis=1)
    return logits, jnp.zeros((B,), jnp.int32)


def cross_entropy(logits: Array, labels: Array) -> Array:
    """Plain CE (mean reduction) for the probe/aux paths."""
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return jnp.mean(logz - picked)
