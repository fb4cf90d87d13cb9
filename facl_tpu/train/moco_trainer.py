"""MoCo training mode — the working form of the reference's MoCo scaffold.

The reference ships a MoCo class whose contrastive body is commented out
(cn3d_model_conbag.py:429-570; SURVEY §2 "MoCo scaffold"). This module is
that capability made operational, TPU-style: a jit step that encodes a
query view and a momentum-encoded key view (two SimCLR-style crops from
facl_tpu.data.make_simclr_crops), builds [pos | queue] InfoNCE logits, and
updates the ring-buffer queue — all functional state in MoCoTrainState.

Hyper-parameters follow the reference class defaults: dim 512, queue 9600,
momentum 0.9, temperature 1 (cn3d_model_conbag.py:434).

Mesh mode (``MoCoTrainer(..., mesh=...)``): views are dp-sharded, params
and the ring queue replicated. This is the working form of the one thing
the reference's dead DDP machinery existed for — ``concat_all_gather`` of
the key batch before the enqueue (cn3d_model_conbag.py:559-570): under
GSPMD jit the dynamic-update-slice of a dp-sharded key batch into a
replicated queue *is* that all-gather, inserted by XLA. Parity against
the single-device step is asserted by tests/test_sharding.py.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from facl_tpu.config import Config
from facl_tpu.losses.infonce import cross_entropy
from facl_tpu.models import PointNetPlus, moco, resolve_model_config
from facl_tpu.ops.grouping import group_points
from facl_tpu.train.optim import make_optimizer

Array = jax.Array


@struct.dataclass
class MoCoTrainState:
    params: dict
    batch_stats: dict
    opt_state: tuple
    moco: moco.MoCoState
    step: Array


def make_moco_step(model, optimizer, cfg: Config,
                   momentum: float = 0.9,
                   temperature: float = 1.0,
                   mesh=None) -> Callable:
    """step(state, views, key) -> (state, metrics).

    views: (2, B, N, C) — query and key crops of the same videos. Both
    views go through grouping together (one kernel launch over 2B clouds;
    with a mesh, shard_map over dp exactly like the contrastive trainer's
    grouping — facl_tpu.train.trainer.make_grouping_fn).
    """
    from facl_tpu.train.trainer import make_grouping_fn
    layout = "bcsk" if cfg.model.channels_first else "bskc"
    grouping_fn = make_grouping_fn(cfg.grouping, mesh, layout)

    def apply_encoder(params, batch_stats, neigh, cent, train):
        if train:
            (x, _, _, _), mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                neigh, cent, train=True, mutable=["batch_stats"])
            return x, mutated["batch_stats"]
        x, _, _, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            neigh, cent, train=False)
        return x, batch_stats

    def loss_fn(params, batch_stats, mstate, neigh2, cent2):
        q, new_stats = apply_encoder(params, batch_stats,
                                     neigh2[0], cent2[0], train=True)
        new_key_params = moco.momentum_update(params, mstate.key_params,
                                              momentum)
        k, _ = apply_encoder(jax.lax.stop_gradient(new_key_params),
                             batch_stats, neigh2[1], cent2[1], train=False)
        k = jax.lax.stop_gradient(k)
        logits, labels = moco.moco_logits(q, k, mstate.queue, temperature)
        loss = cross_entropy(logits, labels)
        new_mstate = moco.enqueue(
            mstate._replace(key_params=new_key_params), k)
        return loss, (new_stats, new_mstate)

    def step(state: MoCoTrainState, views: Array,
             key: Array) -> Tuple[MoCoTrainState, Dict[str, Array]]:
        # Grouping is parameter-independent (views are data), so it runs
        # once outside the grad closure.
        neigh2, cent2 = grouping_fn(views)
        (loss, (new_stats, new_mstate)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   state.moco, neigh2, cent2)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        return MoCoTrainState(
            params=new_params, batch_stats=new_stats, opt_state=new_opt,
            moco=new_mstate, step=state.step + 1), {"loss": loss}

    return jax.jit(step, donate_argnums=(0,))


def shard_moco_state(mesh, state: MoCoTrainState) -> MoCoTrainState:
    """Mesh placement for MoCo state: params/opt under the shared
    param_sharding rule, BN stats and the whole MoCoState (EMA params,
    ring queue, pointer) replicated."""
    from facl_tpu.parallel import param_sharding, replicated
    return MoCoTrainState(
        params=jax.device_put(state.params,
                              param_sharding(mesh, state.params)),
        batch_stats=jax.device_put(state.batch_stats, replicated(mesh)),
        opt_state=jax.device_put(state.opt_state,
                                 param_sharding(mesh, state.opt_state)),
        moco=jax.device_put(state.moco, replicated(mesh)),
        step=jax.device_put(state.step, replicated(mesh)),
    )


class MoCoTrainer:
    """MoCo pretraining driver over 2-view batches.

    The encoder is PointNetPlus with num_crops=1 — each encode call sees
    one view per video, so the global branch degenerates to the local one
    (only the per-crop embedding feeds the MoCo loss).

    ``mesh``: optional device mesh. Views must be fed dp-sharded over
    their batch axis (axis 1); see :func:`shard_moco_state` for state
    placement.
    """

    def __init__(self, cfg: Config, steps_per_epoch: int,
                 queue_len: int = 9600, momentum: float = 0.9,
                 temperature: float = 1.0, mesh=None):
        import dataclasses
        model_cfg = resolve_model_config(
            dataclasses.replace(cfg.model, num_crops=1), mesh=mesh)
        self.cfg = cfg.replace(model=model_cfg)
        self.mesh = mesh
        self.model = PointNetPlus(model_cfg, mesh=mesh)
        self.optimizer = make_optimizer(cfg.train.optim, steps_per_epoch)
        self.queue_len = queue_len
        self.step_fn = make_moco_step(self.model, self.optimizer, self.cfg,
                                      momentum, temperature, mesh=mesh)

    def init_state(self, rng: Array, sample_views: Array) -> MoCoTrainState:
        """sample_views: (2, B, N, C)."""
        g = self.cfg.grouping
        V, B, N, C = sample_views.shape
        flat = sample_views.reshape(V * B, N, C)
        neigh, cent = group_points(
            flat, g.num_centroids, g.knn_k, g.radius_sq, g.method,
            layout="bcsk" if self.cfg.model.channels_first else "bskc")
        variables = self.model.init(rng, neigh, cent, train=False)
        # Queue length must divide by batch (the reference asserts this).
        qlen = (self.queue_len // B) * B
        mstate = moco.init_moco_state(variables["params"],
                                      dim=self.cfg.model.embed_dim,
                                      queue_len=max(qlen, B), rng=rng)
        return MoCoTrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.optimizer.init(variables["params"]),
            moco=mstate,
            step=jnp.zeros((), jnp.int32),
        )
