"""Checkpoint / resume.

The reference saves ``state_dict`` only, every 5 epochs, and never restores
optimizer state (cn3d_train_apperance_GL.py:340-341; resume flags parsed but
unused, :99-100). Here the full TrainState — params, BN stats, optimizer
state, step, SwAV queue — round-trips (SURVEY §5.4's prescribed fix).

Format: flax msgpack serialization, one file per checkpoint plus a small
JSON index; atomic rename so a crash mid-write never corrupts the latest.
"""
from __future__ import annotations

import json
import os
import tempfile
from typing import Optional

import jax
from flax import serialization

from facl_tpu.train.state import TrainState


def save_checkpoint(directory: str, state: TrainState, epoch: int,
                    keep: int = 20) -> str:
    os.makedirs(directory, exist_ok=True)
    state = jax.device_get(state)
    path = os.path.join(directory, f"ckpt_epoch_{epoch:05d}.msgpack")
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(serialization.to_bytes(state))
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    index = {"latest_epoch": epoch, "latest": os.path.basename(path)}
    idx_path = os.path.join(directory, "index.json")
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(index, f)
        os.replace(tmp, idx_path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    _prune(directory, keep)
    return path


def _prune(directory: str, keep: int) -> None:
    ckpts = sorted(p for p in os.listdir(directory)
                   if p.startswith("ckpt_epoch_") and p.endswith(".msgpack"))
    for p in ckpts[:-keep] if keep > 0 else []:
        os.unlink(os.path.join(directory, p))


def latest_checkpoint(directory: str) -> Optional[str]:
    idx = os.path.join(directory, "index.json")
    if not os.path.exists(idx):
        return None
    with open(idx) as f:
        name = json.load(f)["latest"]
    path = os.path.join(directory, name)
    return path if os.path.exists(path) else None


def restore_checkpoint(path: str, target: TrainState) -> TrainState:
    """Restore into a freshly-initialized ``target`` (shapes must match)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def restore_latest(directory: str, target: TrainState) -> Optional[TrainState]:
    path = latest_checkpoint(directory)
    return restore_checkpoint(path, target) if path else None


# ---------------------------------------------------------------------------
# Orbax backend (alternative format; async-capable, multi-host aware).
# ---------------------------------------------------------------------------


def save_checkpoint_orbax(directory: str, state: TrainState,
                          epoch: int) -> str:
    """Save via orbax StandardCheckpointer (directory-per-checkpoint).
    Use for multi-host runs or when async saving matters; the msgpack
    backend remains the default single-file format."""
    import orbax.checkpoint as ocp

    os.makedirs(directory, exist_ok=True)
    path = os.path.abspath(os.path.join(directory,
                                        f"orbax_epoch_{epoch:05d}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    idx_path = os.path.join(directory, "index.json")
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump({"latest_epoch": epoch,
                       "latest": os.path.basename(path),
                       "backend": "orbax"}, f)
        os.replace(tmp, idx_path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def restore_checkpoint_orbax(path: str, target: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), jax.device_get(target))
