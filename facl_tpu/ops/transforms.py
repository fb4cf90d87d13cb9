"""Point-cloud augmentation transforms as pure functions of a PRNG key.

Covers the full transform surface of the reference
(training_code/cn3D_data_set.py:697-776 and the legacy near-duplicates in
training_code/cn3d_data_load.py:16-490), collapsed to exactly one copy each
(the reference keeps 2-3 copies of most of these — SURVEY §2.10).

All functions operate on a batch ``(B, N, C)`` (xyz in channels 0:3, extra
feature channels preserved untouched unless stated) and are jit/vmap-able —
the reference's per-sample Python loops become batched einsums.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

Array = jax.Array


def _rot_y(angle: Array) -> Array:
    """Batch of y-axis rotation matrices; points are row vectors multiplied
    on the right (p @ R), matching the reference (cn3D_data_set.py:724-729)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [jnp.stack([c, z, s], -1),
         jnp.stack([o * 0, o, z], -1),
         jnp.stack([-s, z, c], -1)], axis=-2)


def jitter(key: Array, points: Array, sigma: float = 0.01,
           clip: float = 0.05) -> Array:
    """Per-point gaussian xyz jitter (cn3D_data_set.py:765-776)."""
    noise = jnp.clip(
        sigma * jax.random.normal(key, points[..., :3].shape), -clip, clip)
    return points.at[..., :3].add(noise)


def mirror_x(points: Array) -> Array:
    """Negate x (the deterministic part of reverse_transform,
    cn3D_data_set.py:708-713)."""
    return points.at[..., 0].multiply(-1.0)


def reverse_transform(key: Array, points: Array, sigma: float = 0.01,
                      clip: float = 0.05) -> Array:
    """x-mirror followed by jitter — exactly the reference's
    ``reverse_transform`` (cn3D_data_set.py:708-713), which jitters *after*
    negating x."""
    return jitter(key, mirror_x(points), sigma, clip)


def rotate_y_random(key: Array, points: Array, rotate_range: float = 0.8) -> Array:
    """Per-sample random y rotation, angle = (U-0.5)*pi*range
    (cn3D_data_set.py:734-748)."""
    B = points.shape[0]
    angle = (jax.random.uniform(key, (B,)) - 0.5) * jnp.pi * rotate_range
    R = _rot_y(angle)                                       # (B, 3, 3)
    xyz = jnp.einsum("bnd,bde->bne", points[..., :3], R, precision=_HI)
    return points.at[..., :3].set(xyz)


def rotate_y_fixed(points: Array, angle_set: float) -> Array:
    """Fixed y rotation by angle_set * pi/4 (``depth_transform``,
    cn3D_data_set.py:716-732)."""
    angle = jnp.full((points.shape[0],), angle_set * jnp.pi * 0.25)
    R = _rot_y(angle)
    xyz = jnp.einsum("bnd,bde->bne", points[..., :3], R, precision=_HI)
    return points.at[..., :3].set(xyz)


def rotate_y_uniform(key: Array, points: Array) -> Array:
    """Per-sample y rotation with angle ~ U[0, 2pi)
    (cn3d_data_load.py:398-416)."""
    B = points.shape[0]
    angle = jax.random.uniform(key, (B,)) * 2.0 * jnp.pi
    xyz = jnp.einsum("bnd,bde->bne", points[..., :3], _rot_y(angle), precision=_HI)
    return points.at[..., :3].set(xyz)


def rotate_perturbation(key: Array, points: Array, angle_sigma: float = 0.06,
                        angle_clip: float = 0.18) -> Array:
    """Small random xyz-axis rotations, R = Rz @ Ry @ Rx
    (cn3d_data_load.py:439-461)."""
    B = points.shape[0]
    ang = jnp.clip(angle_sigma * jax.random.normal(key, (B, 3)),
                   -angle_clip, angle_clip)
    cx, sx = jnp.cos(ang[:, 0]), jnp.sin(ang[:, 0])
    cy, sy = jnp.cos(ang[:, 1]), jnp.sin(ang[:, 1])
    cz, sz = jnp.cos(ang[:, 2]), jnp.sin(ang[:, 2])
    z, o = jnp.zeros(B), jnp.ones(B)
    Rx = jnp.stack([jnp.stack([o, z, z], -1),
                    jnp.stack([z, cx, -sx], -1),
                    jnp.stack([z, sx, cx], -1)], -2)
    Ry = jnp.stack([jnp.stack([cy, z, sy], -1),
                    jnp.stack([z, o, z], -1),
                    jnp.stack([-sy, z, cy], -1)], -2)
    Rz = jnp.stack([jnp.stack([cz, -sz, z], -1),
                    jnp.stack([sz, cz, z], -1),
                    jnp.stack([z, z, o], -1)], -2)
    R = jnp.einsum("bij,bjk,bkl->bil", Rz, Ry, Rx, precision=_HI)
    xyz = jnp.einsum("bnd,bde->bne", points[..., :3], R, precision=_HI)
    return points.at[..., :3].set(xyz)


def scale_random(key: Array, points: Array, low: float = 0.5,
                 high: float = 1.5) -> Array:
    """Per-sample uniform xyz scale. Default range matches ``scale_trans``
    (rand+0.5, cn3D_data_set.py:757-763); pass (0.8, 1.25) for the legacy
    ``random_scale_point_cloud`` (cn3d_data_load.py:479-490)."""
    B = points.shape[0]
    s = jax.random.uniform(key, (B, 1, 1), minval=low, maxval=high)
    return points.at[..., :3].multiply(s)


def shift_random(key: Array, points: Array, shift_range: float = 0.1) -> Array:
    """Per-sample uniform translation of every channel triple
    (cn3d_data_load.py:465-476 shifts all C columns; we shift xyz only,
    which is the intended semantics for C>3 point features)."""
    B = points.shape[0]
    t = jax.random.uniform(key, (B, 1, 3), minval=-shift_range,
                           maxval=shift_range)
    return points.at[..., :3].add(t)


def rank_transform(points: Array, rank_slope: float = -1.0) -> Array:
    """Scale xyz by a constant (``rank_transform``,
    cn3D_data_set.py:750-755 scales all channels; the intended/used variant
    cn3d_data_load.py:368-373 scales xyz only — we implement the intent)."""
    return points.at[..., :3].multiply(rank_slope)


def motion_rescale(key: Array, points: Array) -> Array:
    """Randomly rescale the motion channels by s ~ U[0.2, 0.9]
    (``real_rank_trans``, cn3d_data_load.py:376-382)."""
    B = points.shape[0]
    s = jax.random.uniform(key, (B, 1, 1), minval=0.2, maxval=0.9)
    return points.at[..., 3:].multiply(s)


def normalize_xyz(points: Array) -> Array:
    """Center xyz at the bbox midpoint and divide by the *y* extent only —
    the reference's normalization convention (generate_NTU.py:232-243,
    cn3d_data_load.py:351-365)."""
    xyz = points[..., :3]
    mx = jnp.max(xyz, axis=-2, keepdims=True)
    mn = jnp.min(xyz, axis=-2, keepdims=True)
    center = (mx + mn) / 2.0
    y_len = (mx - mn)[..., 1:2]
    return points.at[..., :3].set((xyz - center) / y_len)


def resample(key: Array, points: Array, num_out: int) -> Array:
    """Uniform random subset with replacement along the point axis
    (the ``np.random.randint(0, n, NUM_POINT)`` idiom used throughout
    cn3D_data_set.py:285-350)."""
    n = points.shape[-2]
    idx = jax.random.randint(key, (num_out,), 0, n)
    return jnp.take(points, idx, axis=-2)


def masked_resample(key: Array, points: Array, mask: Array,
                    num_out: int) -> Array:
    """Uniformly sample ``num_out`` points (with replacement) from the rows
    where ``mask`` is nonzero, with static shapes.

    Replaces the reference's boolean-index-then-randint idiom
    (``get_temporal_augment_data``, cn3D_data_set.py:654-663) which produces
    ragged intermediates. Gumbel-free approach: draw categorical indices
    over log-mask.
    """
    logits = jnp.where(mask > 0, 0.0, -jnp.inf)
    idx = jax.random.categorical(key, logits, shape=(num_out,))
    # Degenerate all-masked case: fall back to uniform over everything.
    any_valid = jnp.any(mask > 0)
    idx_fallback = jax.random.randint(key, (num_out,), 0, points.shape[-2])
    idx = jnp.where(any_valid, idx, idx_fallback)
    return jnp.take(points, idx, axis=-2)


def temporal_channel_view(key: Array, points: Array, channel: int,
                          num_out: int) -> Array:
    """Build a temporal-segment view: xyz + one motion channel, sampled from
    the points where that channel is nonzero (``get_temporal_augment_data``,
    cn3D_data_set.py:654-663)."""
    feat = jnp.concatenate(
        [points[..., :3], points[..., channel:channel + 1]], axis=-1)
    return masked_resample(key, feat, jnp.abs(feat[..., 3]) > 0, num_out)
