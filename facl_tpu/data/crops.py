"""The 10-crop augmentation factory — the heart of the contrastive data
pipeline (``get_data_train``, cn3D_data_set.py:285-350) as one pure,
jit/vmap-able function of a PRNG key.

Crop order (must match the reference exactly; the circle loss permutes over
it and the extractor concatenates in it):
  0 raw        random 512-subset of the raw 3DV points
  1 rev        random subset -> jitter -> x-mirror + jitter
  2 key1       random subset of key points -> jitter
  3 key2       random subset of key points -> jitter -> x-mirror + jitter
  4 rot1       random subset -> jitter -> random y-rotation
  5 rot2       random subset -> jitter -> random y-rotation
  6 ti1        temporal view: xyz + channel 4, sampled where nonzero
  7 ti2        temporal view: xyz + channel 7, sampled where nonzero
  8 res30      random subset of the Resolution30 points
  9 res10      random subset of the Resolution10 points

All crops carry 4 feature channels (xyz + channel 3, the global motion),
cropped from the stored 3+5-channel clouds; appearance-stream inputs are
4-channel already.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from facl_tpu.config import DataConfig
from facl_tpu.ops import transforms as T
from facl_tpu.ops.transforms import _rot_y as _rot_y_batch  # y-rot matrices

Array = jax.Array
_HI = jax.lax.Precision.HIGHEST


class ClipSources(NamedTuple):
    """Per-video stored clouds feeding the crop factory.

    points / key_points: (N, >=4); for the motion stream these are the
    (2048, 8) 3DV clouds; for appearance, flattened per-frame sets.
    temporal_source: (N, >=8) cloud providing channels 4 and 7 for the
    ti1/ti2 views (the raw 3DV cloud in both streams,
    cn3D_data_set.py:116-118/134-135).
    res30 / res10: (N, >=4) lower-temporal-resolution clouds.
    """
    points: Array
    key_points: Array
    temporal_source: Array
    res30: Array
    res10: Array


@partial(jax.jit, static_argnames=("num_points", "jitter_sigma",
                                   "jitter_clip", "rotate_range",
                                   "temporal_channels"))
def make_crops(key: Array, src: ClipSources, num_points: int = 512,
               jitter_sigma: float = 0.01, jitter_clip: float = 0.05,
               rotate_range: float = 0.8,
               temporal_channels=(4, 7)) -> Array:
    """Build the (10, num_points, 4) crop tensor for one video."""
    ks = jax.random.split(key, 16)
    p4 = src.points[:, :4]
    k4 = src.key_points[:, :4]

    def sub(k, pts):
        return T.resample(k, pts, num_points)

    def jit1(k, pts):
        return T.jitter(k, pts[None], jitter_sigma, jitter_clip)[0]

    raw = sub(ks[0], p4)

    rev = sub(ks[1], p4)
    rev = jit1(ks[2], rev)
    rev = T.reverse_transform(ks[3], rev[None], jitter_sigma, jitter_clip)[0]

    ke1 = jit1(ks[5], sub(ks[4], k4))
    ke2 = jit1(ks[7], sub(ks[6], k4))
    ke2 = T.reverse_transform(ks[8], ke2[None], jitter_sigma, jitter_clip)[0]

    ro1 = jit1(ks[10], sub(ks[9], p4))
    ro1 = T.rotate_y_random(ks[11], ro1[None], rotate_range)[0]
    ro2 = jit1(ks[13], sub(ks[12], p4))
    ro2 = T.rotate_y_random(ks[14], ro2[None], rotate_range)[0]

    tkeys = jax.random.split(ks[15], 4)
    ti1 = T.temporal_channel_view(tkeys[0], src.temporal_source,
                                  temporal_channels[0], num_points)
    ti2 = T.temporal_channel_view(tkeys[1], src.temporal_source,
                                  temporal_channels[1], num_points)

    rs1 = sub(tkeys[2], src.res30[:, :4])
    rs2 = sub(tkeys[3], src.res10[:, :4])

    return jnp.stack([raw, rev, ke1, ke2, ro1, ro2, ti1, ti2, rs1, rs2])


@partial(jax.jit, static_argnames=("jitter_sigma", "jitter_clip"))
def random_augment(key: Array, points: Array, jitter_sigma: float = 0.01,
                   jitter_clip: float = 0.05) -> Array:
    """The legacy SimCLR-style random augmentation
    (``get_random_augment``, cn3d_data_load.py:156-168): fixed-grid y
    rotation with angle_set ~ U[-1.5, 1.5], xyz scale ~ U[0.6, 1.4], 50%
    x-mirror(+jitter), then jitter. points: (B, N, C)."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    B = points.shape[0]
    angle_set = jax.random.uniform(k1, (B,), minval=-1.5, maxval=1.5)
    R = _rot_y_batch(angle_set * jnp.pi * 0.25)
    out = points.at[..., :3].set(
        jnp.einsum("bnd,bde->bne", points[..., :3], R, precision=_HI))
    scale = jax.random.uniform(k2, (B, 1, 1), minval=0.6, maxval=1.4)
    out = out.at[..., :3].multiply(scale)
    mirrored = T.reverse_transform(k3, out, jitter_sigma, jitter_clip)
    flip = jax.random.bernoulli(k5, 0.5)
    out = jnp.where(flip, mirrored, out)
    return T.jitter(k4, out, jitter_sigma, jitter_clip)


@partial(jax.jit, static_argnames=("num_points",))
def make_simclr_crops(key: Array, src: ClipSources,
                      num_points: int = 512) -> Array:
    """Two-view SimCLR crop factory (``deal_data_simclr``,
    cn3d_data_load.py:42-78): pick two of the four base views {raw, key,
    ti1, ti2} at random (with replacement) and independently
    random-augment each. Returns (2, num_points, 4) for one video."""
    ks = jax.random.split(key, 8)
    raw = T.resample(ks[0], src.points[:, :4], num_points)
    keyp = T.resample(ks[1], src.key_points[:, :4], num_points)
    ti1 = T.temporal_channel_view(ks[2], src.temporal_source, 4, num_points)
    ti2 = T.temporal_channel_view(ks[3], src.temporal_source, 7, num_points)
    base = jnp.stack([raw, keyp, ti1, ti2])               # (4, N, 4)
    pick = jax.random.randint(ks[4], (2,), 0, 4)
    v1 = random_augment(ks[5], base[pick[0]][None])[0]
    v2 = random_augment(ks[6], base[pick[1]][None])[0]
    return jnp.stack([v1, v2])


def make_crops_batch(key: Array, srcs: ClipSources,
                     cfg: DataConfig) -> Array:
    """Batched crop factory: each ClipSources field carries a leading batch
    dim. Returns (10, B, num_points, 4) — crop-major, ready for the
    training step."""
    B = srcs.points.shape[0]
    keys = jax.random.split(key, B)
    crops = jax.vmap(
        lambda k, p, kp, t, r30, r10: make_crops(
            k, ClipSources(p, kp, t, r30, r10), cfg.num_points,
            cfg.jitter_sigma, cfg.jitter_clip, cfg.rotate_range,
            tuple(cfg.temporal_channels))
    )(keys, srcs.points, srcs.key_points, srcs.temporal_source,
      srcs.res30, srcs.res10)
    return jnp.moveaxis(crops, 0, 1)        # (B,10,N,4) -> (10,B,N,4)
