"""Voxel grids -> fixed-size point sets, sampling and normalization.

Re-derivation of generate_NTU.py:196-260 with static shapes:

* candidate voxels = any channel nonzero (the reference's np.where over the
  (M, ...) grid followed by unique);
* sampling matches both reference branches exactly: if n_valid <= S keep
  every voxel once then top up with uniform random repeats; else draw S
  uniformly with replacement (generate_NTU.py:204-209);
* normalization: xyz centered at the *sampled raw* cloud's bbox midpoint and
  divided by its y-extent; motion channels min-max normalized to [-0.5, 0.5]
  using the sampled raw cloud's channel extents — the same centers/scale are
  reused for the key and appearance sets (:231-260).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _take_or_pad(key: Array, flat_ids: Array, n_valid: Array,
                 sample_num: int) -> Array:
    """Sample ``sample_num`` ids from the first ``n_valid`` entries of
    ``flat_ids``: keep-all + random extras when n_valid <= sample_num,
    otherwise uniform with replacement."""
    n = jnp.maximum(n_valid, 1)
    rand = jax.random.randint(key, (sample_num,), 0, n)
    seq = jnp.arange(sample_num)
    pick = jnp.where((seq < n_valid) & (n_valid <= sample_num), seq, rand)
    return jnp.take(flat_ids, pick)


def compact_nonzero(mask_flat: Array) -> Tuple[Array, Array]:
    """Stable-compact the indices of nonzero entries to the front.

    Returns (ids (V,) int32 with the n_valid nonzero positions first,
    n_valid). TPU-friendly: one cumsum + one scatter.
    """
    V = mask_flat.shape[0]
    m = mask_flat.astype(jnp.int32)
    n_valid = jnp.sum(m)
    rank = jnp.cumsum(m) - 1
    pos = jnp.arange(V, dtype=jnp.int32)
    # Valid entries scatter their position to their rank; invalid entries
    # scatter into a dump slot V that is sliced away.
    buf = jnp.zeros((V + 1,), jnp.int32)
    buf = buf.at[jnp.where(m > 0, rank, V)].set(pos)
    return buf[:V], n_valid


def voxels_to_points(key: Array, di: Array, sample_num: int,
                     select_mask: Array | None = None) -> Tuple[Array, Array]:
    """(M, X, Y, Z) grid -> (S, 3+M) sampled points (voxel coords + the M
    motion channels).

    select_mask: optional (X, Y, Z) bool — restrict candidates (used for the
    key set, which selects key-occupied voxels but reads the *raw* grid's
    motion values, generate_NTU.py:212-221).

    Returns (points, n_valid).
    """
    M = di.shape[0]
    gs = di.shape[1:]
    V = gs[0] * gs[1] * gs[2]
    flat = di.reshape(M, V)
    nz = jnp.any(flat != 0, axis=0)
    if select_mask is not None:
        nz = nz & select_mask.reshape(V)
    ids, n_valid = compact_nonzero(nz)
    chosen = _take_or_pad(key, ids, n_valid, sample_num)      # (S,)

    zi = chosen % gs[2]
    yi = (chosen // gs[2]) % gs[1]
    xi = chosen // (gs[1] * gs[2])
    coords = jnp.stack([xi, yi, zi], axis=-1).astype(jnp.float32)
    motion = flat[:, chosen].T                                # (S, M)
    return jnp.concatenate([coords, motion], axis=-1), n_valid


def normalization_stats(points: Array) -> Tuple[Array, Array, Array, Array]:
    """(centers (3,), y_len (), c_min (M,), c_len (M,)) from the sampled raw
    cloud (generate_NTU.py:231-241)."""
    xyz = points[:, :3]
    mx, mn = jnp.max(xyz, axis=0), jnp.min(xyz, axis=0)
    centers = (mx + mn) / 2.0
    y_len = jnp.maximum(mx[1] - mn[1], 1e-6)
    c = points[:, 3:]
    c_min = jnp.min(c, axis=0)
    c_len = jnp.maximum(jnp.max(c, axis=0) - c_min, 1e-6)
    return centers, y_len, c_min, c_len


def apply_normalization(points: Array, centers: Array, y_len: Array,
                        c_min: Array, c_len: Array) -> Array:
    """xyz -> (xyz - centers)/y_len; channels -> minmax - 0.5
    (generate_NTU.py:243-247)."""
    xyz = (points[:, :3] - centers[None, :]) / y_len
    c = (points[:, 3:] - c_min[None, :]) / c_len[None, :] - 0.5
    return jnp.concatenate([xyz, c], axis=-1)


def appearance_frame(key: Array, pts: Array, valid: Array, origin: Array,
                     voxel_size: float, di0: Array, sample_num: int) -> Array:
    """One frame's appearance point set (generate_NTU.py:49-74): all valid
    pixels' voxel-space (continuous) coordinates plus the global motion
    value sampled from channel 0 of the 3DV grid at their voxel; resampled
    to ``sample_num`` with the keep-all + random-extras rule.

    Returns (sample_num, 4) UN-normalized (caller applies the shared
    centers/y_len and channel-0 minmax, :249-260).
    """
    gs = di0.shape
    vox = (pts - origin[None, :]) / voxel_size                # continuous
    idx = jnp.floor(vox).astype(jnp.int32)
    limits = jnp.asarray(gs, jnp.int32) - 1
    idx = jnp.clip(idx, 0, limits[None, :])
    motion = di0[idx[:, 0], idx[:, 1], idx[:, 2]]
    feat = jnp.concatenate([vox, motion[:, None]], axis=-1)   # (P, 4)

    ids, n_valid = compact_nonzero(valid)
    chosen = _take_or_pad(key, ids, n_valid, sample_num)
    return jnp.take(feat, chosen, axis=0)
