"""MoCo training mode — the working form of the reference's MoCo scaffold.

The reference ships a MoCo class whose contrastive body is commented out
(cn3d_model_conbag.py:429-570; SURVEY §2 "MoCo scaffold"). This module is
that capability made operational, TPU-style: a jit step that encodes a
query view and a momentum-encoded key view (two SimCLR-style crops from
facl_tpu.data.make_simclr_crops), builds [pos | queue] InfoNCE logits, and
updates the ring-buffer queue — all functional state in MoCoTrainState.

Hyper-parameters follow the reference class defaults: dim 512, queue 9600,
momentum 0.9, temperature 1 (cn3d_model_conbag.py:434).
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from facl_tpu.config import Config
from facl_tpu.losses.infonce import cross_entropy
from facl_tpu.models import PointNetPlus, moco
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
                   temperature: float = 1.0) -> Callable:
    """step(state, views, key) -> (state, metrics).

    views: (2, B, N, C) — query and key crops of the same videos.
    """
    from facl_tpu.ops.grouping import (resolve_gather_impl,
                                       resolve_select_impl)
    g = cfg.grouping
    gather_impl = resolve_gather_impl(g)
    select_impl = resolve_select_impl(g)

    def encode(params, batch_stats, points, train):
        neigh, cent = group_points(points, g.num_centroids, g.knn_k,
                                   g.radius_sq, g.method, gather_impl, select_impl)
        if train:
            (x, _, _, _), mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                neigh, cent, train=True, mutable=["batch_stats"])
            return x, mutated["batch_stats"]
        x, _, _, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            neigh, cent, train=False)
        return x, batch_stats

    def loss_fn(params, batch_stats, mstate, views):
        q, new_stats = encode(params, batch_stats, views[0], train=True)
        new_key_params = moco.momentum_update(params, mstate.key_params,
                                              momentum)
        k, _ = encode(jax.lax.stop_gradient(new_key_params), batch_stats,
                      views[1], train=False)
        k = jax.lax.stop_gradient(k)
        logits, labels = moco.moco_logits(q, k, mstate.queue, temperature)
        loss = cross_entropy(logits, labels)
        new_mstate = moco.enqueue(
            mstate._replace(key_params=new_key_params), k)
        return loss, (new_stats, new_mstate)

    def step(state: MoCoTrainState, views: Array,
             key: Array) -> Tuple[MoCoTrainState, Dict[str, Array]]:
        (loss, (new_stats, new_mstate)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   state.moco, views)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        return MoCoTrainState(
            params=new_params, batch_stats=new_stats, opt_state=new_opt,
            moco=new_mstate, step=state.step + 1), {"loss": loss}

    return jax.jit(step, donate_argnums=(0,))


class MoCoTrainer:
    """MoCo pretraining driver over 2-view batches.

    The encoder is PointNetPlus with num_crops=1 — each encode call sees
    one view per video, so the global branch degenerates to the local one
    (only the per-crop embedding feeds the MoCo loss).
    """

    def __init__(self, cfg: Config, steps_per_epoch: int,
                 queue_len: int = 9600, momentum: float = 0.9,
                 temperature: float = 1.0):
        import dataclasses
        self.cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, num_crops=1))
        self.model = PointNetPlus(self.cfg.model)
        self.optimizer = make_optimizer(cfg.train.optim, steps_per_epoch)
        self.queue_len = queue_len
        self.step_fn = make_moco_step(self.model, self.optimizer, self.cfg,
                                      momentum, temperature)

    def init_state(self, rng: Array, sample_views: Array) -> MoCoTrainState:
        """sample_views: (2, B, N, C)."""
        g = self.cfg.grouping
        V, B, N, C = sample_views.shape
        flat = sample_views.reshape(V * B, N, C)
        neigh, cent = group_points(flat, g.num_centroids, g.knn_k,
                                   g.radius_sq, g.method)
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
