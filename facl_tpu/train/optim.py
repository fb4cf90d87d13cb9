"""Optimizer + LR schedule.

Adam(lr 3e-4, betas (0.5, 0.999), eps 1e-6) with step decay gamma=0.7 every
4 epochs (cn3d_train_apperance_GL.py:180-181). The reference calls
``scheduler.step(epoch)`` every *batch* (:333) — with torch's epoch-indexed
StepLR that collapses to lr = lr0 * gamma^(epoch // step_size), which is
what we implement (the documented intent; SURVEY §7).
"""
from __future__ import annotations

import optax

from facl_tpu.config import OptimConfig


def step_decay_schedule(cfg: OptimConfig, steps_per_epoch: int):
    def schedule(step):
        epoch = step // steps_per_epoch
        return cfg.learning_rate * cfg.lr_decay_gamma ** (
            epoch // cfg.lr_decay_epochs)
    return schedule


def make_optimizer(cfg: OptimConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    return optax.adam(
        learning_rate=step_decay_schedule(cfg, steps_per_epoch),
        b1=cfg.b1, b2=cfg.b2, eps=cfg.eps)
