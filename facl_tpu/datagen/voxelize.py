"""Temporal rank pooling over voxel grids + density denoising.

The 3DV core (generate_NTU.py:369-440): each frame is voxelized into a
binary occupancy grid; M=5 channels accumulate occupancy weighted by rank
coefficients — channel 0 over the whole clip, channels 1-4 over four
half-overlapping temporal windows of 2/5 clip length. A parallel "key" grid
accumulates the motion-located pixels with the global coefficient.

TPU-native design: fixed-capacity grid (indices clamped), per-frame scatter
via ``.at[].max`` (occupancy dedupe), rank coefficients precomputed as an
(M, F) matrix so the frame loop is a single ``fori_loop`` with masked adds.
The 3^3 density denoise (generate_NTU.py:277-296) is a valid-mode box
convolution.

Round-2 perf note: the per-frame loop (~120 scatters, ~550 ms/clip
isolated) was attacked twice and BOTH in-clip reformulations measured
slower on device, so it stays:
- one-shot sort + (13M, 5)-wide scatter-add: 1017 ms — XLA lowers wide
  scatter-adds at ~14 ns per SCALAR update;
- frame-blocked scatter-max (one (2*kb*V,) scatter per kb-frame block):
  601 ms — in-loop scatter-max runs ~3x slower per update than the same
  op standalone, and the block-coefficient einsum lowers to a while
  loop.

Round-3: two stacked wins (device measurements, full NTU shape,
60 frames x 424x512, one v5e; baseline single 561-588 ms/clip):
- CROSS-clip batching (the untried axis) — vmapping V clips through one
  jit (pipeline.generate_clips) turns each per-frame scatter into a
  batched scatter over V clips' indices: V=4 -> 344 ms/clip (1.7x);
  V=8 -> 363; V=16 -> 390. The CLI defaults to --clip-batch 4.
- Raw+key scatter merge — one stacked (2, *grid) scatter per frame
  instead of two: single 500 ms/clip, and with V=4 batching
  **337 ms/clip (~1.7x overall)**. Pushing the merge to 4 frames
  (8 planes/scatter) regresses (545 ms) — past ~2 planes the
  per-update cost grows faster than the dispatch floor amortizes,
  the same failure mode as the round-2 frame-blocked attempt.
tests/test_datagen.py's rank_pool loop-oracle + the batched==single
parity tests pin the exact semantics.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from facl_tpu.config import DatagenConfig

Array = jax.Array


def rank_coefficients(n_frame: Array, max_frames: int,
                      num_splits: int = 5) -> Array:
    """(M, F_max) coefficient matrix; column f holds each channel's rank
    weight for frame f, zero outside the channel's window or past n_frame.

    Channel 0: (2f - n + 1) over all frames (generate_NTU.py:414).
    Channel m in 1..4: windows [round(n(m-1)/5), round(n(m+1)/5)) with local
    index idx_f and length len_f, weight (2*idx_f - len_f + 1) (:417-438).
    """
    f = jnp.arange(max_frames, dtype=jnp.float32)
    n = n_frame.astype(jnp.float32)
    in_clip = f < n

    def window(lo, hi):
        idx = f - lo
        length = hi - lo
        w = 2.0 * idx - length + 1.0
        m = (f >= lo) & (f < hi) & in_clip
        return jnp.where(m, w, 0.0)

    # np.round on .5 ties rounds half-to-even; jnp.round matches numpy.
    r = lambda x: jnp.round(x)
    rows = [jnp.where(in_clip, 2.0 * f - n + 1.0, 0.0)]
    for m in range(1, num_splits):
        lo = r(n * (m - 1) / 5.0)
        hi = r(n * (m + 1) / 5.0)
        # Channel 4's window extends to n exactly (:435-437).
        if m == num_splits - 1:
            hi = n
        rows.append(window(lo, hi))
    return jnp.stack(rows, axis=0)


def voxel_indices(points: Array, valid: Array, origin: Array,
                  voxel_size: float, grid_shape: Tuple[int, int, int]
                  ) -> Tuple[Array, Array]:
    """Pixel points -> clamped integer voxel indices ((N,3) int32, valid)."""
    idx = jnp.floor((points - origin[None, :]) / voxel_size).astype(jnp.int32)
    limits = jnp.asarray(grid_shape, jnp.int32) - 1
    in_range = jnp.all((idx >= 0) & (idx <= limits[None, :]), axis=-1)
    idx = jnp.clip(idx, 0, limits[None, :])
    return idx, valid & in_range


def scatter_occupancy(idx: Array, valid: Array,
                      grid_shape: Tuple[int, int, int]) -> Array:
    """Binary occupancy grid from (N, 3) indices (dedupes via max)."""
    occ = jnp.zeros(grid_shape, jnp.float32)
    return occ.at[idx[:, 0], idx[:, 1], idx[:, 2]].max(
        valid.astype(jnp.float32))


def rank_pool(frames_pts: Array, frames_valid: Array, key_pts: Array,
              key_valid: Array, n_frame: Array, origin: Array,
              cfg: DatagenConfig) -> Tuple[Array, Array]:
    """Accumulate the M-channel 3DV grid and the 1-channel key grid.

    frames_pts: (F, P, 3) back-projected full-depth points per frame.
    key_pts:    (F, P, 3) motion-located points per frame.
    Returns (voxel_di (M, *grid), voxel_key (*grid)).
    """
    M = cfg.num_splits
    gs = cfg.grid_shape
    coef = rank_coefficients(n_frame, frames_pts.shape[0], M)   # (M, F)
    coef_key = jnp.where(jnp.arange(frames_pts.shape[0]) < n_frame,
                         2.0 * jnp.arange(frames_pts.shape[0], dtype=jnp.float32)
                         - n_frame.astype(jnp.float32) + 1.0, 0.0)

    # Scatter cost is dominated by a per-op dispatch floor (module
    # docstring), so the loop merges FM frames x 2 grids into ONE
    # stacked scatter per iteration: plane 2j is frame (i*FM+j)'s raw
    # occupancy, plane 2j+1 its key occupancy; slices of the stacked
    # result are exactly the per-frame grids, and per-frame coefficient
    # weighting happens outside the scatter, so semantics are unchanged
    # (pinned by the rank_pool loop-oracle test). Per-frame occupancy
    # dedupe is preserved because planes are disjoint scatter targets.
    # Device-measured (full NTU shape, one v5e): FM=1 (raw+key merge
    # only) 561 -> 500 ms/clip; FM=4 (8 planes/scatter) REGRESSES to
    # 545 — past ~2 planes the per-update cost grows faster than the
    # dispatch floor amortizes, the same failure mode as round 2's
    # frame-blocked attempt. FM stays 1.
    F = frames_pts.shape[0]
    FM = 1

    def body(i, carry):
        di, dk = carry
        idxs, vals = [], []
        for j in range(FM):
            f = i * FM + j
            idx, v = voxel_indices(frames_pts[f], frames_valid[f], origin,
                                   cfg.voxel_size, gs)
            kidx, kv = voxel_indices(key_pts[f], key_valid[f], origin,
                                     cfg.voxel_size, gs)
            idxs += [idx, kidx]
            vals += [v, kv]
        stacked = jnp.concatenate(idxs, axis=0)            # (FM*2*P, 3)
        vstack = jnp.concatenate(vals, axis=0)
        plane = jnp.repeat(jnp.arange(2 * FM, dtype=jnp.int32),
                           idxs[0].shape[0])
        occ = jnp.zeros((2 * FM,) + gs, jnp.float32).at[
            plane, stacked[:, 0], stacked[:, 1], stacked[:, 2]].max(
            vstack.astype(jnp.float32))
        for j in range(FM):
            f = i * FM + j
            di = di + coef[:, f][:, None, None, None] * occ[2 * j][None]
            dk = dk + coef_key[f] * occ[2 * j + 1]
        return di, dk

    di0 = jnp.zeros((M,) + gs, jnp.float32)
    dk0 = jnp.zeros(gs, jnp.float32)
    return jax.lax.fori_loop(0, F // FM, body, (di0, dk0))


@partial(jax.jit, static_argnames=("threshold",))
def denoise(grid: Array, threshold: int) -> Array:
    """3^3 neighbor-count denoise (generate_NTU.py:277-296): keep a voxel
    only if the 27-cell occupancy count (itself included) reaches
    ``threshold``; boundary voxels are always dropped (the reference only
    writes counts to the interior, so borders keep occupancy <= 1 < th).

    grid: (X, Y, Z).
    """
    occ = (grid != 0).astype(jnp.float32)
    kernel = jnp.ones((1, 1, 3, 3, 3), jnp.float32)
    counts = jax.lax.conv_general_dilated(
        occ[None, None], kernel, window_strides=(1, 1, 1), padding="VALID")
    counts = jnp.pad(counts[0, 0], 1, mode="constant")       # borders -> 0
    keep = (counts >= threshold) & (occ > 0)
    return jnp.where(keep, grid, 0.0)
