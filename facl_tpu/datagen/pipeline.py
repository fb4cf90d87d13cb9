"""End-to-end 3DV generation: depth frames -> raw / key / appearance point
sets, per clip, as one jit-compiled function plus a host driver that walks
the NTU directory tree.

Mirrors generate_NTU.main (generate_NTU.py:77-264) with the documented
intent where the reference is broken or implicit (SURVEY §3.1):
  * the shipped ``save_npy`` NameError is irrelevant here (paths are
    explicit arguments);
  * "Resolution60/30/10" differ by the temporal frame cap (K = 60/30/10) —
    the shipped loop only changes output paths, but the multi-resolution
    *views* are what training consumes (SURVEY §5.7).
"""
from __future__ import annotations

import os
import random
import zlib
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from facl_tpu.config import DatagenConfig
from facl_tpu.datagen.depth import backproject, locate_motion, mask_depth
from facl_tpu.datagen.pointize import (
    appearance_frame,
    apply_normalization,
    normalization_stats,
    voxels_to_points,
)
from facl_tpu.datagen.voxelize import denoise, rank_pool

Array = jax.Array


@partial(jax.jit, static_argnames=("cfg", "max_frames"))
def generate_clip(key: Array, frames: Array, n_frame: Array,
                  cfg: DatagenConfig, max_frames: int) -> Dict[str, Array]:
    """One clip -> its three stored artifacts.

    Args:
      key: PRNG key (drives every sampling decision).
      frames: (F_max, H, W) float32 masked-or-raw depth frames, zero-padded
        past n_frame. Masking (``mask_depth``) is applied here.
      n_frame: () int32 actual frame count (after the K cap).
      cfg, max_frames: static.

    Returns dict:
      raw:  (S, 3+M) normalized 3DV points.
      key:  (S, 3+M) normalized key (motion-located) 3DV points.
      app:  (A, S, 4) normalized appearance point sets for A chosen frames.
      n_raw/n_key: () valid-voxel counts (diagnostics).
    """
    F, H, W = frames.shape
    M = cfg.num_splits
    S = cfg.sample_num

    masked = jax.vmap(lambda d: mask_depth(d, cfg.boundary_seg))(frames)

    # Motion localization against the previous *masked* frame; frame 0
    # diffs against itself (the reference seeds prev with frame 0,
    # generate_NTU.py:140-150).
    prev = jnp.concatenate([masked[:1], masked[:-1]], axis=0)
    motion_frames = jax.vmap(
        lambda p, c: locate_motion(p, c, cfg.motion_low, cfg.motion_high)
    )(prev, masked)

    pts, valid = jax.vmap(lambda d: backproject(d, cfg))(masked)
    kpts, kvalid = jax.vmap(lambda d: backproject(d, cfg))(motion_frames)

    in_clip = (jnp.arange(F) < n_frame)[:, None]
    valid = valid & in_clip
    kvalid = kvalid & in_clip

    # Global bbox over all valid full-depth points (generate_NTU.py:169-181).
    big = jnp.float32(1e9)
    vmaskedmin = jnp.where(valid[..., None], pts, big)
    vmaskedmax = jnp.where(valid[..., None], pts, -big)
    mins = jnp.min(vmaskedmin, axis=(0, 1))
    maxs = jnp.max(vmaskedmax, axis=(0, 1))
    origin = jnp.where(mins > maxs, 0.0, mins)      # empty-clip guard

    di, dkey = rank_pool(pts, valid, kpts, kvalid, n_frame, origin, cfg)
    dkey = denoise(dkey, cfg.denoise_key_threshold)
    di = di.at[0].set(denoise(di[0], cfg.denoise_raw_threshold))

    k_raw, k_key, k_app = jax.random.split(key, 3)
    raw_pts, n_raw = voxels_to_points(k_raw, di, S)
    # Key voxels gate the selection but motion values come from the raw
    # grid (generate_NTU.py:212-221).
    key_pts, n_key = voxels_to_points(k_key, di, S,
                                      select_mask=dkey != 0)

    centers, y_len, c_min, c_len = normalization_stats(raw_pts)
    raw_n = apply_normalization(raw_pts, centers, y_len, c_min, c_len)
    key_n = apply_normalization(key_pts, centers, y_len, c_min, c_len)

    # Appearance sets: A frames, evenly spread over the clip (the reference
    # takes all frames, or 10 random when the clip is shorter than 10
    # [generate_NTU.py:49-57]; a fixed-count even spread is the static-shape
    # equivalent with the same coverage).
    A = cfg.num_appearance_frames
    fsel = jnp.clip((jnp.arange(A) * n_frame) // A, 0, F - 1)
    app_keys = jax.random.split(k_app, A)
    app = jax.vmap(
        lambda kk, fi: appearance_frame(
            kk, pts[fi], valid[fi], origin, cfg.voxel_size, di[0], S)
    )(app_keys, fsel)
    # Shared normalization: xyz by centers/y_len; the motion channel by the
    # raw cloud's channel-0 minmax (generate_NTU.py:258-260). Note the
    # appearance xyz are continuous voxel coords; raw xyz are integer voxel
    # coords — same frame as the reference.
    app_xyz = (app[..., :3] - centers[None, None, :]) / y_len
    app_m = (app[..., 3] - c_min[0]) / c_len[0] - 0.5
    app_n = jnp.concatenate([app_xyz, app_m[..., None]], axis=-1)

    return {"raw": raw_n, "key": key_n, "app": app_n,
            "n_raw": n_raw, "n_key": n_key}


@partial(jax.jit, static_argnames=("cfg", "max_frames"))
def generate_clips(keys: Array, frames: Array, n_frames: Array,
                   cfg: DatagenConfig, max_frames: int) -> Dict[str, Array]:
    """Cross-clip batched generation: ``generate_clip`` vmapped over a
    leading clip axis.

    keys (V, 2) PRNG keys, frames (V, F_max, H, W), n_frames (V,).

    Why this exists: per clip the rank-pool loop issues ~2*F voxel
    scatters whose cost is dominated by a per-op floor, not per-update
    work (voxelize.py round-2 log — both in-clip reformulations measured
    SLOWER). Batching V clips through one jit turns each of those into a
    single batched scatter over V clips' indices, amortizing the floor;
    per-clip semantics (and the per-clip PRNG keys) are unchanged, so a
    batched run writes the same artifacts as V single runs.
    """
    fn = lambda k, f, n: generate_clip(k, f, n, cfg, max_frames)
    return jax.vmap(fn)(keys, frames, n_frames)


class ClipGenerator:
    """Host-side wrapper: load PNG frames, apply the K frame cap, call the
    jit pipeline. One instance per resolution (frame cap)."""

    def __init__(self, cfg: DatagenConfig, max_frames: Optional[int] = None,
                 seed: int = 0):
        self.cfg = cfg
        self.max_frames = int(max_frames or cfg.max_frames)
        self._seed = seed
        self._py_rng = random.Random(seed)
        self._key = jax.random.PRNGKey(seed)

    def _next_key(self) -> Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def _prepare(self, frames: np.ndarray, tag: Optional[str]
                 ) -> Tuple[np.ndarray, int, Array]:
        """Host-side prep shared by single and batched paths: frame-cap
        sampling + the fixed-capacity (K, H, W) buffer + the clip key."""
        F = frames.shape[0]
        K = self.max_frames
        if tag is None:
            py_rng, key = self._py_rng, None
        else:
            h = zlib.crc32(f"{tag}:{K}".encode())
            py_rng = random.Random(f"{self._seed}:{h}")
            key = jax.random.fold_in(jax.random.PRNGKey(self._seed), h)
        if F > K:
            idx = sorted(py_rng.sample(range(F), K))
            frames = frames[idx]
            F = K
        if key is None:
            key = self._next_key()
        H, W = self.cfg.image_shape
        buf = np.zeros((K, H, W), np.float32)
        buf[:F, :frames.shape[1], :frames.shape[2]] = \
            frames[:, :H, :W].astype(np.float32)
        return buf, F, key

    def from_frames(self, frames: np.ndarray,
                    tag: Optional[str] = None) -> Dict[str, np.ndarray]:
        """frames: (F, H, W) uint16/float raw depth frames (unmasked).

        ``tag``: optional stable identity (e.g. the video name). When
        given, all randomness (frame capping, in-clip sampling) derives
        from (seed, tag) instead of the generator's sequential state, so
        sharded generation (generate_dataset shard/num_shards) produces
        the same tree as an unsharded run."""
        buf, F, key = self._prepare(frames, tag)
        out = generate_clip(key, jnp.asarray(buf),
                            jnp.asarray(F, jnp.int32), self.cfg,
                            self.max_frames)
        return {k: np.asarray(v) for k, v in out.items()}

    def from_frames_batch(self, frames_list: Sequence[np.ndarray],
                          tags: Optional[Sequence[Optional[str]]] = None,
                          pad_to: Optional[int] = None
                          ) -> List[Dict[str, np.ndarray]]:
        """Batched generation: V clips through ONE jit program
        (:func:`generate_clips`) — same per-clip artifacts as V
        ``from_frames`` calls with the same tags.

        ``pad_to``: pad the batch up to this size by repeating the last
        clip (pad outputs dropped) so a ragged tail group reuses the
        full-size compiled program instead of recompiling."""
        out, V = self.dispatch_frames_batch(frames_list, tags, pad_to)
        host = {k: np.asarray(v) for k, v in out.items()}
        return [{k: host[k][i] for k in host} for i in range(V)]

    def dispatch_frames_batch(self, frames_list, tags=None, pad_to=None
                              ) -> Tuple[Dict[str, Array], int]:
        """Async form of :meth:`from_frames_batch`: returns the (device,
        still-in-flight) output dict plus the true batch size without
        forcing materialization — JAX dispatch is asynchronous, so the
        caller can overlap the next group's host IO (PNG decode) with
        this group's device compute (generate_dataset does)."""
        if tags is None:
            tags = [None] * len(frames_list)
        preps = [self._prepare(f, t) for f, t in zip(frames_list, tags)]
        V = len(preps)
        if pad_to is not None and pad_to > V:
            preps = preps + [preps[-1]] * (pad_to - V)
        bufs = np.stack([p[0] for p in preps])
        ns = np.asarray([p[1] for p in preps], np.int32)
        keys = jnp.stack([p[2] for p in preps])
        out = generate_clips(keys, jnp.asarray(bufs), jnp.asarray(ns),
                             self.cfg, self.max_frames)
        return out, V

    def from_dir(self, png_dir: str,
                 tag: Optional[str] = None) -> Dict[str, np.ndarray]:
        return self.from_frames(load_png_frames(png_dir), tag=tag)


def load_png_frames(png_dir: str) -> np.ndarray:
    """All depth PNGs of one video dir, stacked (F, H, W) in name order."""
    import imageio.v2 as imageio

    names = sorted(os.listdir(png_dir))
    return np.stack([
        np.asarray(imageio.imread(os.path.join(png_dir, n)))
        for n in names])


def generate_dataset(data_path: str, out_root: str, cfg: DatagenConfig,
                     seed: int = 0, limit: Optional[int] = None,
                     shard: int = 0, num_shards: int = 1,
                     clip_batch: int = 1) -> int:
    """Walk <data_path>/<setup>/nturgb+d_depth_masked/<video>/ and write,
    per resolution, <out_root>/Resolution{K}/{raw,others,app}/... in the
    reference's on-disk layout (generate_NTU.py:86-112). Returns the number
    of clips written.

    ``shard``/``num_shards``: process only videos whose index (in the
    sorted walk order) is congruent to ``shard`` mod ``num_shards`` —
    generation is embarrassingly parallel per clip, so the intended
    scale-out is one process per chip/host, all writing into the same
    tree.

    ``clip_batch``: run this many clips through one jit program
    (:func:`generate_clips`) — amortizes the per-scatter dispatch floor
    that dominates single-clip generation (voxelize.py). Randomness is
    keyed per video, so the tree is identical for any clip_batch."""
    if not (0 <= shard < num_shards):
        raise ValueError(f"shard {shard} out of range for {num_shards}")

    load_frames = load_png_frames
    written = 0
    vid_idx = 0
    setups = sorted(os.listdir(data_path))
    for res in cfg.resolutions:
        gen = ClipGenerator(cfg, max_frames=res, seed=seed)
        res_dir = os.path.join(out_root, f"Resolution{res}")
        raw_dir = os.path.join(res_dir, "raw")
        key_dir = os.path.join(res_dir, "others")
        app_dir = os.path.join(res_dir, "app")
        for d in (raw_dir, key_dir, app_dir):
            os.makedirs(d, exist_ok=True)

        # Double-buffered: dispatch group i (async on device), then load
        # group i+1's PNGs while it computes, materializing + writing i
        # only when i+1 is ready to dispatch. On a real dataset this
        # overlaps the two dominant costs (PNG decode and device
        # scatter time) almost completely.
        pending: Optional[Tuple[Tuple[str, ...], Dict, int]] = None

        def drain() -> int:
            nonlocal pending
            if pending is None:
                return 0
            videos, out, V = pending
            pending = None
            host = {k: np.asarray(v) for k, v in out.items()}
            for i, video in enumerate(videos):
                np.save(os.path.join(raw_dir, video + ".npy"),
                        host["raw"][i])
                np.save(os.path.join(key_dir, video + "_key.npy"),
                        host["key"][i])
                np.save(os.path.join(app_dir, video + "_app.npy"),
                        host["app"][i])
            return len(videos)

        def flush(group) -> int:
            nonlocal pending
            if group:
                videos, dirs = zip(*group)
                frames = [load_frames(d) for d in dirs]  # overlaps pending
                done = drain()
                out, V = gen.dispatch_frames_batch(
                    frames, tags=list(videos),
                    pad_to=clip_batch if len(group) < clip_batch else None)
                pending = (videos, out, V)
                return done
            return drain()

        group: List[Tuple[str, str]] = []
        for setup in setups:
            vid_root = os.path.join(data_path, setup, "nturgb+d_depth_masked")
            if not os.path.isdir(vid_root):
                continue
            for video in sorted(os.listdir(vid_root)):
                vid_idx += 1
                if (vid_idx - 1) % num_shards != shard:
                    continue
                # `scheduled` counts written + in-flight + queued clips,
                # so the limit is exact even with a pending group.
                scheduled = written + (len(pending[0]) if pending else 0) \
                    + len(group)
                if limit and scheduled >= limit:
                    break
                group.append((video, os.path.join(vid_root, video)))
                if len(group) >= max(1, clip_batch):
                    written += flush(group)
                    group = []
        written += flush(group)   # dispatch the tail (if any)...
        written += flush([])      # ...and drain it
        if limit and written >= limit:
            return written
    return written
