"""Depth-frame preprocessing: masking, motion localization, back-projection.

Re-derivations of generate_data/generate_NTU.py:321-366 built on fixed-size
dense pixel grids (H, W) with validity masks — the TPU-native substitute for
the reference's ragged per-frame point lists (SURVEY §7 "Hard parts":
ragged -> fixed shapes).

Note on ``load_depth_from_img`` (generate_NTU.py:339-351): the shipped
border wipes ``depth_im[-1:-10,:]`` and ``[:, -1:-10]`` are empty slices
(no-ops); we reproduce the *effective* behavior (top-2 rows and left-2 cols
only) for distribution parity.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from facl_tpu.config import DatagenConfig

Array = jax.Array


@partial(jax.jit, static_argnames=("boundary_seg",))
def mask_depth(depth: Array,
               boundary_seg: Tuple[int, int, int, int] = (60, 29, 10, 10)
               ) -> Array:
    """Border + data-dependent boundary masking (generate_NTU.py:339-351).

    depth: (H, W) float32. Zeroes: top 2 rows, left 2 cols (the effective
    part of the static border wipe); then, from the nonzero extent of the
    result: the top ``seg[0]`` rows, rows >= last_nonzero_row - seg[1],
    cols < min_nonzero_col + seg[2], cols >= max_nonzero_col - seg[3].
    """
    H, W = depth.shape
    d = depth.at[0:2, :].set(0.0).at[:, 0:2].set(0.0)

    nz = d != 0
    rows = jnp.any(nz, axis=1)
    cols = jnp.any(nz, axis=0)
    ridx = jnp.arange(H)
    cidx = jnp.arange(W)
    # Empty-frame guard: fall back to full extents so nothing extra is cut.
    any_nz = jnp.any(nz)
    last_row = jnp.where(any_nz, jnp.max(jnp.where(rows, ridx, -1)), H - 1)
    min_col = jnp.where(any_nz, jnp.min(jnp.where(cols, cidx, W)), 0)
    max_col = jnp.where(any_nz, jnp.max(jnp.where(cols, cidx, -1)), W - 1)

    rmask = (ridx >= boundary_seg[0]) & (ridx < last_row - boundary_seg[1])
    cmask = (cidx >= min_col + boundary_seg[2]) & (cidx < max_col - boundary_seg[3])
    return d * rmask[:, None] * cmask[None, :]


@jax.jit
def locate_motion(prev: Array, cur: Array, low: float = 50.0,
                  high: float = 300.0) -> Array:
    """Frame differencing (generate_NTU.py:355-366): keep the *current*
    depth at pixels whose |cur - prev| lies strictly inside (low, high)."""
    diff = jnp.abs(cur - prev)
    moving = (diff > low) & (diff < high)
    return jnp.where(moving, cur, 0.0)


def backproject(depth: Array, cfg: DatagenConfig) -> Tuple[Array, Array]:
    """Pinhole back-projection (generate_NTU.py:321-335) on the dense grid.

    Returns (points (H*W, 3) camera-space xyz, valid (H*W,) bool).
    Invalid pixels carry zeros.
    """
    H, W = depth.shape
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    valid = depth > 0
    X = (xx - cfg.cx) * depth / cfg.fx
    Y = (yy - cfg.cy) * depth / cfg.fy
    pts = jnp.stack([X, Y, depth], axis=-1)
    pts = jnp.where(valid[..., None], pts, 0.0)
    return pts.reshape(H * W, 3), valid.reshape(H * W)
