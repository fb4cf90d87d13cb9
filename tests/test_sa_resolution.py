"""Resolution rules for sa_impl="auto" / channels_first=None
(facl_tpu.models.resolve_model_config) — VERDICT r2 item 3: the flagship
paired-row path must be the default wherever it is GSPMD-safe, with no env
vars or config JSON needed."""
import dataclasses

import jax
import jax.numpy as jnp
import pytest

from facl_tpu.config import Config, ModelConfig
from facl_tpu.models import SA_IMPLS, resolve_model_config


class _FakeMesh:
    def __init__(self, size):
        self.size = size


def test_auto_resolves_to_pair3_on_single_tpu():
    cfg = resolve_model_config(ModelConfig(), backend="tpu", n_devices=1)
    assert cfg.sa_impl == "pair3"
    assert cfg.channels_first is True


def test_auto_resolves_to_pair3_on_axon_backend():
    # The tunnel backend reports "axon", not "tpu" — it must count as TPU.
    cfg = resolve_model_config(ModelConfig(), backend="axon", n_devices=1)
    assert cfg.sa_impl == "pair3"


def test_auto_resolves_to_reference_on_cpu_gpu():
    for backend in ("cpu", "gpu"):
        cfg = resolve_model_config(ModelConfig(), backend=backend,
                                   n_devices=1)
        assert cfg.sa_impl == "reference", backend
        assert cfg.channels_first is False


def test_auto_resolves_to_reference_for_nomesh_multidevice():
    # No-mesh multi-device: GSPMD partitions the whole graph and
    # pallas_call is a single-device program.
    cfg = resolve_model_config(ModelConfig(), backend="tpu", n_devices=8)
    assert cfg.sa_impl == "reference"


def test_auto_resolves_to_pair3_with_mesh():
    # An explicit mesh runs the sharded pair path (shard_map per-shard
    # sweeps with psum'd global BN stats) — safe on any mesh size.
    cfg = resolve_model_config(ModelConfig(), mesh=_FakeMesh(8),
                               backend="tpu", n_devices=8)
    assert cfg.sa_impl == "pair3"
    assert cfg.channels_first is True


def test_explicit_impl_is_honored():
    for impl in ("reference", "hybrid2", "pair3"):
        cfg = resolve_model_config(
            dataclasses.replace(ModelConfig(), sa_impl=impl),
            backend="tpu", n_devices=1)
        assert cfg.sa_impl == impl
    # Explicit channels_first survives resolution.
    cfg = resolve_model_config(
        dataclasses.replace(ModelConfig(), sa_impl="pair",
                            channels_first=False),
        backend="tpu", n_devices=1)
    assert cfg.channels_first is False


def test_channels_first_follows_resolved_impl():
    cfg = resolve_model_config(
        dataclasses.replace(ModelConfig(), sa_impl="pair3"),
        backend="cpu", n_devices=1)
    assert cfg.channels_first is True
    cfg = resolve_model_config(
        dataclasses.replace(ModelConfig(), sa_impl="hybrid2"),
        backend="tpu", n_devices=1)
    assert cfg.channels_first is False


def test_unknown_impl_rejected():
    with pytest.raises(ValueError, match="unknown sa_impl"):
        resolve_model_config(
            dataclasses.replace(ModelConfig(), sa_impl="bogus"))


def test_default_config_is_auto():
    assert ModelConfig().sa_impl == "auto"
    assert ModelConfig().channels_first is None
    assert "auto" in SA_IMPLS


def test_config_json_roundtrip_with_auto():
    cfg = Config()
    back = Config.from_json(cfg.to_json())
    assert back.model.sa_impl == "auto"
    assert back.model.channels_first is None


def test_trainer_resolves_on_cpu(rng_np=None):
    """On this CPU test runtime, a default-config Trainer must resolve to
    the reference path and run — byte-identical behavior to the old
    default."""
    import numpy as np

    from facl_tpu.config import (GroupingConfig, OptimConfig, TrainConfig)
    from facl_tpu.train import Trainer

    cfg = Config(
        grouping=GroupingConfig(num_centroids=8, knn_k=8, radius_sq=10.0),
        model=ModelConfig(sa_widths=(8, 16), stage2_widths=(16, 32),
                          fc_hidden=32, embed_dim=16, num_prototypes=8,
                          num_crops=4),
        train=TrainConfig(batch_size=8,
                          optim=OptimConfig(learning_rate=1e-3)),
    )
    tr = Trainer(cfg, steps_per_epoch=10)
    assert tr.cfg.model.sa_impl == "reference"
    assert tr.cfg.model.channels_first is False
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.normal(size=(4, 8, 32, 4)).astype(np.float32))
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    state, metrics = tr.step_fn(state, batch, jax.random.PRNGKey(1),
                                jnp.asarray(0))
    assert np.isfinite(float(metrics["loss"]))


def test_cli_sa_impl_flag():
    """--sa-impl forces the impl and re-opens channels_first to auto."""
    import argparse

    from facl_tpu.cli.pretrain import add_common_args, build_config

    p = argparse.ArgumentParser()
    add_common_args(p)
    args = p.parse_args(["--root", "/tmp/x", "--sa-impl", "pair3"])
    cfg = build_config(args)
    assert cfg.model.sa_impl == "pair3"
    assert cfg.model.channels_first is None
    resolved = resolve_model_config(cfg.model, backend="tpu", n_devices=1)
    assert resolved.channels_first is True
