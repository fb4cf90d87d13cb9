"""File-backed NTU dataset + batch loader.

Replaces ``NTU_RGBD_new`` + torch DataLoader (cn3D_data_set.py:36-843,
cn3d_train_apperance_GL.py:161-171). Per-item work is split TPU-style:
the host only loads .npy files and stacks them; all augmentation (the
10-crop factory) runs on device as a pure function of a PRNG key, so it is
deterministic given a seed — unlike the reference's unseeded NumPy
augmentation (SURVEY §5.2).

Directory layout (written by facl_tpu.datagen.generate_dataset, matching
the reference's tree, generate_NTU.py:86-112):
  <root>/Resolution60/raw/<video>.npy         (2048, 3+5) motion points
  <root>/Resolution60/others/<video>_key.npy  (2048, 3+5) key points
  <root>/Resolution60/app/<video>_app.npy     (A, 2048, 4) appearance sets
  <root>/Resolution{30,10}/...                lower temporal resolutions

Streams (cn3D_data_set.py:105-140): motion ('0') crops from raw clouds;
appearance ('1') crops from the per-frame appearance sets (flattened into
one pool — the reference's shipped appearance indexing is shape-accidental;
this is the documented intent) with temporal views still taken from the raw
3DV cloud's segment channels.
"""
from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import jax
import numpy as np

from facl_tpu.config import DataConfig
from facl_tpu.data.crops import ClipSources, make_crops_batch
from facl_tpu.data.ntu import VideoInfo, parse_name, split_videos

Array = jax.Array


class NTUPointDataset:
    """Index of generated clips + per-batch source loading."""

    def __init__(self, root: str, cfg: DataConfig, train: bool = True,
                 protocol: Optional[str] = None, split: Optional[str] = None):
        """``split`` overrides ``train`` when given: one of "train",
        "test", "validation", "train_with_validation" — the four splits the
        reference's full_train/validation/test flags select
        (cn3D_data_set.py:73-92)."""
        self.root = root
        self.cfg = cfg
        self.stream = cfg.stream
        raw_dir = os.path.join(root, "Resolution60", "raw")
        names = sorted(n[:-4] for n in os.listdir(raw_dir)
                       if n.endswith(".npy"))
        if cfg.dataset == "ntu60":
            names = [n for n in names if parse_name(n).action <= 60
                     and parse_name(n).setup <= 17]
        self.infos: List[VideoInfo] = [parse_name(n) for n in names]
        self.names = names
        split = split or ("train" if train else "test")
        if split in ("validation", "train_with_validation"):
            from facl_tpu.data.ntu import validation_split
            twv, val = validation_split(self.infos)
            self.indices = twv if split == "train_with_validation" else val
        else:
            tr, te = split_videos(self.infos, protocol or cfg.protocol,
                                  cfg.dataset)
            self.indices = tr if split == "train" else te

    def __len__(self) -> int:
        return len(self.indices)

    def _paths(self, name: str):
        r = self.root
        if self.stream == "motion":
            main = os.path.join(r, "Resolution60", "raw", name + ".npy")
            r30 = os.path.join(r, "Resolution30", "raw", name + ".npy")
            r10 = os.path.join(r, "Resolution10", "raw", name + ".npy")
        else:
            main = os.path.join(r, "Resolution60", "app", name + "_app.npy")
            r30 = os.path.join(r, "Resolution30", "app", name + "_app.npy")
            r10 = os.path.join(r, "Resolution10", "app", name + "_app.npy")
        key = os.path.join(r, "Resolution60", "others", name + "_key.npy")
        raw = os.path.join(r, "Resolution60", "raw", name + ".npy")
        return main, key, raw, r30, r10

    @staticmethod
    def _flatten_app(a: np.ndarray) -> np.ndarray:
        """(A, S, 4) appearance sets -> one (A*S, 4) pool."""
        return a.reshape(-1, a.shape[-1]) if a.ndim == 3 else a

    def load_sources(self, idx: int) -> Tuple[ClipSources, int, str]:
        """Load one video's source clouds. Returns (sources, label, name)."""
        vid = self.indices[idx]
        name = self.names[vid]
        main, key, raw, r30, r10 = self._paths(name)
        pts = self._flatten_app(np.load(main)).astype(np.float32)
        kp = np.load(key).astype(np.float32)
        rawp = np.load(raw).astype(np.float32)
        p30 = self._flatten_app(np.load(r30)).astype(np.float32)
        p10 = self._flatten_app(np.load(r10)).astype(np.float32)
        src = ClipSources(points=pts, key_points=kp, temporal_source=rawp,
                          res30=p30, res10=p10)
        return src, self.infos[vid].label, name

    def load_batch(self, idxs: Sequence[int]) -> Tuple[ClipSources,
                                                       np.ndarray, List[str]]:
        if self._use_native():
            return self._load_batch_native(idxs)
        srcs, labels, names = [], [], []
        for i in idxs:
            s, l, n = self.load_sources(i)
            srcs.append(s)
            labels.append(l)
            names.append(n)
        stacked = ClipSources(*(np.stack(f) for f in zip(*srcs)))
        return stacked, np.asarray(labels, np.int32), names

    # ---- native (C++) parallel batch loading -------------------------

    def _use_native(self) -> bool:
        from facl_tpu.data import native
        return native.native_available()

    def _load_batch_native(self, idxs: Sequence[int]
                           ) -> Tuple[ClipSources, np.ndarray, List[str]]:
        """One parallel native load for all 5 source files of every video
        in the batch (native/npy_loader.cc), replacing B*5 GIL-bound
        np.load calls."""
        from facl_tpu.data import native
        vids = [self.indices[i] for i in idxs]
        names = [self.names[v] for v in vids]
        labels = np.asarray([self.infos[v].label for v in vids], np.int32)

        path_lists = [self._paths(n) for n in names]   # B x 5
        flat_paths = [p for plist in path_lists for p in plist]
        buf, shapes = native.load_batch(flat_paths, self._max_elems(),
                                        num_threads=4)

        def take(j: int) -> np.ndarray:
            arrs = []
            for b in range(len(names)):
                shape = shapes[b * 5 + j]
                n = int(np.prod(shape))
                a = buf[b * 5 + j, :n].reshape(shape)
                if a.ndim == 3:            # appearance (A, S, 4) -> pool
                    a = a.reshape(-1, a.shape[-1])
                arrs.append(a)
            return np.stack(arrs)

        stacked = ClipSources(points=take(0), key_points=take(1),
                              temporal_source=take(2), res30=take(3),
                              res10=take(4))
        return stacked, labels, names

    def _max_elems(self) -> int:
        if not hasattr(self, "_max_elems_cache"):
            # Probe one of each file kind and take the max footprint.
            paths = self._paths(self.names[self.indices[0]])
            elems = []
            for p in paths:
                with open(p, "rb") as f:
                    version = np.lib.format.read_magic(f)
                    shape, _, _ = np.lib.format._read_array_header(f, version)
                elems.append(int(np.prod(shape)))
            self._max_elems_cache = max(elems)
        return self._max_elems_cache


def _batch_divisor(sharding) -> int:
    """Number of shards the batch axis of a yielded (G, B, ...) crop
    array splits into under ``sharding`` (mesh-size product of the spec
    entry at axis 1)."""
    spec = sharding.spec
    if len(spec) < 2 or spec[1] is None:
        return 1
    names = spec[1] if isinstance(spec[1], tuple) else (spec[1],)
    d = 1
    for nm in names:
        d *= sharding.mesh.shape[nm]
    return d


class CropLoader:
    """Iterate (10, B, N, 4) crop batches: host threads prefetch .npy
    sources, the crop factory runs on device. ``shuffle``/``drop_last``
    mirror the torch DataLoader settings (cn3d_train_apperance_GL.py:171)."""

    def __init__(self, dataset: NTUPointDataset, batch_size: int,
                 key: Array, shuffle: bool = True, drop_last: bool = True,
                 prefetch: int = 2, sharding=None):
        self.ds = dataset
        self.batch_size = batch_size
        self.key = key
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        # Optional jax.sharding.Sharding for the yielded crop batches
        # (e.g. parallel.batch_sharding(mesh, batch_axis=1)): the crops
        # leave the factory device-committed; re-laying them out here
        # keeps the train step free of GSPMD resharding inserts.
        self.sharding = sharding

    def _batch_indices(self, rng: np.random.Generator) -> List[List[int]]:
        order = np.arange(len(self.ds))
        if self.shuffle:
            rng.shuffle(order)
        B = self.batch_size
        nb = len(order) // B if self.drop_last else -(-len(order) // B)
        return [order[i * B:(i + 1) * B].tolist() for i in range(nb)
                if len(order[i * B:(i + 1) * B]) > 0]

    def epoch(self, epoch_idx: int) -> Iterator[Tuple[Array, np.ndarray,
                                                      List[str]]]:
        """Yield (crops (10,B,N,4), labels (B,), names) for one epoch."""
        ekey = jax.random.fold_in(self.key, epoch_idx)
        rng = np.random.default_rng(
            np.asarray(jax.random.key_data(ekey))[-1])
        batches = self._batch_indices(rng)

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)

        def producer():
            for idxs in batches:
                # Host .npy loads only — do NOT device_put from this
                # thread: a producer-thread transfer deadlocks against a
                # main-thread compile on the remote (axon) backend
                # (observed: both python threads parked on futexes with
                # the RPC loop idle). The transfer happens on the main
                # thread inside make_crops_batch; it is only worth
                # overlapping on hosts with a thin device link anyway.
                q.put(self.ds.load_batch(idxs))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        i = 0
        while True:
            item = q.get()
            if item is None:
                break
            srcs, labels, names = item
            if self.sharding is not None:
                # Pad ragged batches (a drop_last=False tail, or a batch
                # size that doesn't divide the mesh) up to ONE constant
                # shardable size — ceil(batch_size/div)*div — by
                # repeating clip 0. Consumers index outputs by ``names``
                # (len == true batch), so pad rows are computed and
                # discarded; the constant shape avoids a tail-batch
                # recompile (60-120 s per jit shape on remote backends).
                div = _batch_divisor(self.sharding)
                target = -(-self.batch_size // div) * div
                pad = target - len(names)
                if pad:
                    srcs = jax.tree.map(
                        lambda a: np.concatenate(
                            [a, np.repeat(a[:1], pad, axis=0)]), srcs)
            bkey = jax.random.fold_in(ekey, i)
            crops = make_crops_batch(bkey, srcs, self.ds.cfg)
            if self.sharding is not None:
                crops = jax.device_put(crops, self.sharding)
            yield crops, labels, names
            i += 1
        t.join()
