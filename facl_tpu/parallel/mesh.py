"""Device mesh + sharding rules.

The TPU-native replacement for the reference's parallelism tier
(DataParallel wrap at cn3d_train_apperance_GL.py:176 plus the vestigial
torch.distributed collectives, cn3d_model_conbag.py:559-570 — SURVEY §2.9):

* one ``jax.sharding.Mesh`` with axes ``('dp', 'mp')``;
* batch arrays sharded over ``dp`` (data parallelism over ICI);
* params replicated (or the wide FC kernels sharded over ``mp`` when mp>1);
* everything under a single GSPMD ``jit`` — XLA inserts the psum for grad
  sync and the all-gathers for global-batch contrastive negatives and
  cross-replica BatchNorm statistics automatically.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from facl_tpu.config import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    mp = max(1, cfg.mp)
    dp = cfg.dp if cfg.dp > 0 else len(devices) // mp
    if dp * mp > len(devices):
        raise ValueError(f"mesh {dp}x{mp} needs {dp*mp} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(arr, ("dp", "mp"))


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Shard the given axis of a batch array over ``dp``."""
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = "dp"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_train_state(mesh: Mesh, state):
    """Deterministic mesh placement for a TrainState-like pytree:
    params and optimizer state under the :func:`param_sharding` rule
    (the Adam moments mirror the params, so the same shape-based rule
    shards them consistently with their kernels), batch_stats and the
    SwAV queue replicated. Without this, the first jitted step starts
    from whatever single-device layout init/restore produced and pays a
    GSPMD reshuffle on the largest tensors."""
    return state.replace(
        params=jax.device_put(state.params,
                              param_sharding(mesh, state.params)),
        opt_state=jax.device_put(state.opt_state,
                                 param_sharding(mesh, state.opt_state)),
        batch_stats=jax.device_put(state.batch_stats, replicated(mesh)),
        swav_queue=(jax.device_put(state.swav_queue, replicated(mesh))
                    if state.swav_queue is not None else None))


def param_sharding(mesh: Mesh, params) -> "jax.tree_util.PyTreeDef":
    """Sharding tree for model params: replicate everything, except shard
    the largest Dense kernels over ``mp`` when the mesh has a model axis.

    This is deliberate tensor parallelism for the 1024x1024 / 1024x512 FC
    layers — the only weights big enough to be worth sharding in this
    model family.
    """
    mp = mesh.shape["mp"]

    def rule(path, x):
        if mp > 1 and hasattr(x, "ndim") and x.ndim == 2 and x.shape[-1] >= 512:
            return NamedSharding(mesh, P(None, "mp"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)
