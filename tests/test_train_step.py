"""Fused train-step tests: loss decreases, state updates, SwAV/CLD gates,
checkpoint round-trip."""
import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facl_tpu.config import (Config, GroupingConfig, LossConfig, ModelConfig,
                             OptimConfig, TrainConfig)
from facl_tpu.models import PointNetPlus
from facl_tpu.train import (Trainer, restore_checkpoint, save_checkpoint,
                            make_eval_step)


def tiny_config(**loss_kw):
    return Config(
        grouping=GroupingConfig(num_centroids=8, knn_k=8, radius_sq=10.0),
        model=ModelConfig(sa_widths=(8, 16), stage2_widths=(16, 32),
                          fc_hidden=32, embed_dim=16, num_prototypes=8,
                          num_crops=4),
        loss=LossConfig(**loss_kw),
        train=TrainConfig(batch_size=2, optim=OptimConfig(learning_rate=1e-3)),
    )


def make_batch(rng, G=4, B=2, N=32, C=4):
    return jnp.asarray(rng.normal(size=(G, B, N, C)).astype(np.float32))


def test_train_step_updates_and_loss_decreases(rng):
    cfg = tiny_config()
    tr = Trainer(cfg, steps_per_epoch=10)
    batch = make_batch(rng)
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(1)
    epoch = jnp.asarray(0)

    state1, m1 = tr.step_fn(state, batch, key, epoch)
    assert int(state1.step) == 1
    losses = [float(m1["loss"])]
    st = state1
    for i in range(10):
        st, m = tr.step_fn(st, batch, key, epoch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
    assert "loss_global" in m1 and "loss_circle" in m1


def test_swav_and_cld_gates(rng):
    cfg = tiny_config(use_swav=True, use_cld=True, cld_clusters=4,
                      cld_kmeans_iters=2, swav_queue_start_epoch=0)
    tr = Trainer(cfg, steps_per_epoch=10)
    batch = make_batch(rng)
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    assert state.swav_queue is not None
    state, m = tr.step_fn(state, batch, jax.random.PRNGKey(1), jnp.asarray(0))
    assert np.isfinite(float(m["loss_swav"]))
    assert np.isfinite(float(m["loss_cld"]))
    # Queue got fresh embeddings at the front.
    q = np.asarray(state.swav_queue)
    assert np.abs(q[:, :cfg.train.batch_size]).sum() > 0


def test_checkpoint_roundtrip(tmp_path, rng):
    cfg = tiny_config()
    tr = Trainer(cfg, steps_per_epoch=10)
    batch = make_batch(rng)
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    state, _ = tr.step_fn(state, batch, jax.random.PRNGKey(1), jnp.asarray(0))

    path = save_checkpoint(str(tmp_path), state, epoch=0)
    fresh = tr.init_state(jax.random.PRNGKey(42), batch)
    restored = restore_checkpoint(path, fresh)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_step_deterministic(rng):
    cfg = tiny_config()
    tr = Trainer(cfg, steps_per_epoch=10)
    batch = make_batch(rng)
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    ev = make_eval_step(tr.model, cfg)
    x1, xg1 = ev(state.variables, batch)
    x2, xg2 = ev(state.variables, batch)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    G, B = batch.shape[:2]
    assert x1.shape == (G * B, cfg.model.embed_dim)
    assert xg1.shape == (B, cfg.model.embed_dim)


def test_eval_step_layout_follows_model_not_caller_cfg(rng):
    """Regression (round-3 verify drive, TPU backend): the extract CLI
    built make_eval_step with the PRE-resolution Config
    (channels_first=None -> channels-last grouping) while the Trainer's
    model had been resolved to the channel-major pair path — the encoder
    then received transposed neighborhoods and rejected them. The eval
    step must take its grouping layout from the model's own resolved
    config, so a stale caller config is harmless."""
    import dataclasses

    cfg = tiny_config()
    # A model resolved to channel-major (the reference impl transposes
    # internally, so this runs fine on CPU).
    cfg_cf = cfg.replace(model=dataclasses.replace(
        cfg.model, sa_impl="reference", channels_first=True))
    tr = Trainer(cfg_cf, steps_per_epoch=10)
    batch = make_batch(rng)
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    # Caller holds the unresolved config (channels_first=None).
    stale = cfg.replace(model=dataclasses.replace(
        cfg.model, sa_impl="auto", channels_first=None))
    ev = make_eval_step(tr.model, stale)
    x, xg = ev(state.variables, batch)
    G, B = batch.shape[:2]
    assert x.shape == (G * B, cfg.model.embed_dim)
    # And it matches the correctly-built eval step exactly.
    ev_ok = make_eval_step(tr.model, cfg_cf)
    x2, _ = ev_ok(state.variables, batch)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))


def test_lr_schedule_matches_steplr():
    from facl_tpu.train.optim import step_decay_schedule
    cfg = OptimConfig(learning_rate=3e-4, lr_decay_epochs=4,
                      lr_decay_gamma=0.7)
    sched = step_decay_schedule(cfg, steps_per_epoch=100)
    assert float(sched(0)) == pytest.approx(3e-4)
    assert float(sched(399)) == pytest.approx(3e-4)
    assert float(sched(400)) == pytest.approx(3e-4 * 0.7)
    assert float(sched(800)) == pytest.approx(3e-4 * 0.49)


@pytest.mark.slow
def test_orbax_checkpoint_roundtrip(tmp_path, rng):
    from facl_tpu.train.checkpoint import (restore_checkpoint_orbax,
                                           save_checkpoint_orbax)
    cfg = tiny_config()
    tr = Trainer(cfg, steps_per_epoch=10)
    batch = make_batch(rng)
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    state, _ = tr.step_fn(state, batch, jax.random.PRNGKey(1), jnp.asarray(0))

    path = save_checkpoint_orbax(str(tmp_path), state, epoch=3)
    fresh = tr.init_state(jax.random.PRNGKey(9), batch)
    restored = restore_checkpoint_orbax(path, fresh)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_swav_queue_inactive_before_start_epoch(rng):
    """Before swav_queue_start_epoch the queue must not fill (the
    reference allocates it lazily at that epoch, :215-220)."""
    cfg = tiny_config(use_swav=True, swav_queue_start_epoch=5)
    tr = Trainer(cfg, steps_per_epoch=10)
    batch = make_batch(rng)
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    state, m = tr.step_fn(state, batch, jax.random.PRNGKey(1),
                          jnp.asarray(0))
    assert np.abs(np.asarray(state.swav_queue)).sum() == 0.0
    # At the start epoch it begins filling.
    state, m = tr.step_fn(state, batch, jax.random.PRNGKey(2),
                          jnp.asarray(5))
    assert np.abs(np.asarray(state.swav_queue)).sum() > 0.0
