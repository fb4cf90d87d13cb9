"""Slow/fast encoder training step.

The reference defines ``PointNet_Slow_Fast`` (cn3d_model_conbag.py:243-387)
but never wires a driver for it; this module supplies a minimal working
recipe so the capability is operational: group the same clouds twice
(slow: K=128-style wide neighborhoods; fast: K=64) and align the two
pathway embeddings with the 2-view pair InfoNCE (utils_my.py:200-213) —
the natural objective given the reference's loss toolbox.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from facl_tpu.config import Config
from facl_tpu.losses.infonce import cross_entropy, pair_infonce
from facl_tpu.models import PointNetSlowFast
from facl_tpu.ops.grouping import group_points

Array = jax.Array


@struct.dataclass
class SlowFastTrainState:
    params: dict
    batch_stats: dict
    opt_state: tuple
    step: Array


def make_slowfast_step(model, optimizer, cfg: Config,
                       slow_k: int = 128, fast_k: int = 64) -> Callable:
    """step(state, points (B, N, C), key) -> (state, metrics)."""
    from facl_tpu.ops.grouping import (resolve_gather_impl,
                                       resolve_select_impl)
    g = cfg.grouping
    gather_impl = resolve_gather_impl(g)
    select_impl = resolve_select_impl(g)

    def group_two(points):
        slow_n, _ = group_points(points, g.num_centroids,
                                 min(slow_k, points.shape[1]), g.radius_sq,
                                 g.method, gather_impl, select_impl)
        fast_n, _ = group_points(points, g.num_centroids,
                                 min(fast_k, points.shape[1]), g.radius_sq,
                                 g.method, gather_impl, select_impl)
        return slow_n, fast_n

    def loss_fn(params, batch_stats, points):
        slow_n, fast_n = group_two(points)
        (x_fast, x_slow), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            slow_n, fast_n, train=True, mutable=["batch_stats"])
        x_all = jnp.concatenate([x_fast, x_slow], axis=0)
        logits, labels = pair_infonce(x_fast, x_slow, x_all)
        loss = cross_entropy(logits, labels)
        return loss, mutated["batch_stats"]

    def step(state: SlowFastTrainState, points: Array,
             key: Array) -> Tuple[SlowFastTrainState, Dict[str, Array]]:
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, points)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        return SlowFastTrainState(
            params=new_params, batch_stats=new_stats, opt_state=new_opt,
            step=state.step + 1), {"loss": loss}

    return jax.jit(step, donate_argnums=(0,))


class SlowFastTrainer:
    def __init__(self, cfg: Config, steps_per_epoch: int,
                 slow_k: int = 128, fast_k: int = 64):
        from facl_tpu.train.optim import make_optimizer
        self.cfg = cfg
        self.slow_k = slow_k
        self.fast_k = fast_k
        self.model = PointNetSlowFast(cfg.model)
        self.optimizer = make_optimizer(cfg.train.optim, steps_per_epoch)
        self.step_fn = make_slowfast_step(self.model, self.optimizer, cfg,
                                          slow_k, fast_k)

    def init_state(self, rng: Array, sample_points: Array
                   ) -> SlowFastTrainState:
        g = self.cfg.grouping
        slow_n, _ = group_points(sample_points, g.num_centroids,
                                 min(self.slow_k, sample_points.shape[1]),
                                 g.radius_sq, g.method)
        fast_n, _ = group_points(sample_points, g.num_centroids,
                                 min(self.fast_k, sample_points.shape[1]),
                                 g.radius_sq, g.method)
        variables = self.model.init(rng, slow_n, fast_n, train=False)
        return SlowFastTrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.optimizer.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )
