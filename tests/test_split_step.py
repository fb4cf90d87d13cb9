"""Two-program train step (TrainConfig.split_step) ≡ the fused step.

The split step executes forward+loss and backward+Adam as two separate
jit programs, with the ``jax.vjp`` residuals crossing the seam as
explicit device buffers. Same math, two XLA modules — the unlock for
large per-chip batches on runtimes that cap one program's scratch
arena (BASELINE.md round-4 batch-scaling note; the reference has no
analogue — a torch step is op-by-op eager dispatch,
cn3d_train_apperance_GL.py:223-333).
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facl_tpu.config import (Config, GroupingConfig, LossConfig,
                             ModelConfig, OptimConfig, TrainConfig)
from facl_tpu.train import Trainer


def tiny_config(**train_kw):
    return Config(
        grouping=GroupingConfig(num_centroids=8, knn_k=8, radius_sq=10.0),
        model=ModelConfig(sa_widths=(8, 16), stage2_widths=(16, 32),
                          fc_hidden=32, embed_dim=16, num_prototypes=8,
                          num_crops=4),
        loss=LossConfig(use_swav=True, use_cld=False),
        train=TrainConfig(batch_size=8,
                          optim=OptimConfig(learning_rate=1e-3),
                          **train_kw),
    )


def _run(cfg, batches, keys):
    tr = Trainer(cfg, steps_per_epoch=10)
    state = tr.init_state(jax.random.PRNGKey(0), batches[0])
    losses = []
    ep = jnp.asarray(0, jnp.int32)
    for b, k in zip(batches, keys):
        state, metrics = tr.step_fn(state, b, k, ep)
        losses.append(float(metrics["loss"]))
    return state, losses


def test_split_step_matches_fused(rng):
    G, B, N, C = 4, 8, 32, 4
    batches = [jnp.asarray(rng.normal(size=(G, B, N, C)).astype(np.float32))
               for _ in range(3)]
    keys = [jax.random.fold_in(jax.random.PRNGKey(7), i) for i in range(3)]

    s_fused, l_fused = _run(tiny_config(), batches, keys)
    s_split, l_split = _run(tiny_config(split_step=True), batches, keys)

    # Two XLA modules fuse (and therefore round) differently than one,
    # and Adam turns epsilon-level grad differences into ~lr-scaled
    # param wiggle — the same documented bar as the sharded-vs-unsharded
    # tests (tests/test_sharding.py). Measured drift here: ~1.5e-6 rel
    # on the loss after 3 steps.
    np.testing.assert_allclose(l_split, l_fused, rtol=1e-4)
    # ±2·lr per Adam step (grad-epsilon sign flips), accumulated over
    # the 3 steps.
    lr = tiny_config().train.optim.learning_rate
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b),
                                                rtol=5e-3,
                                                atol=2 * lr * len(batches)),
        s_split.params, s_fused.params)
    # BN running stats / queue embeddings are computed on the (already
    # ±lr-wiggled) params, so they inherit the params' divergence scale.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b),
                                                rtol=5e-3, atol=1e-3),
        s_split.batch_stats, s_fused.batch_stats)
    np.testing.assert_allclose(np.asarray(s_split.swav_queue),
                               np.asarray(s_fused.swav_queue),
                               rtol=5e-3, atol=1e-3)
    assert int(s_split.step) == int(s_fused.step) == 3


def test_split_step_is_two_programs(rng):
    """The split step must NOT be one re-jitted module: fwd_step's
    outputs include the vjp residual buffers (a jax.tree_util.Partial
    pytree) that the backward program consumes."""
    from facl_tpu.train.trainer import make_train_step
    from facl_tpu.train.optim import make_optimizer
    from facl_tpu.models import resolve_model

    cfg = tiny_config(split_step=True)
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, sa_impl="reference", channels_first=False))
    model, g = resolve_model(cfg)
    opt = make_optimizer(cfg.train.optim, 10)
    step = make_train_step(model, opt, cfg, grouping=g, split=True)
    # A plain python callable composing two jits — not a jit itself.
    assert not hasattr(step, "lower")


def test_split_step_rejects_mesh():
    from facl_tpu.train.trainer import make_train_step

    class FakeMesh:
        size = 8

    cfg = tiny_config(split_step=True)
    with pytest.raises(ValueError, match="split_step"):
        make_train_step(None, None, cfg, mesh=FakeMesh(), split=True)
