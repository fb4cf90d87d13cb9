"""Model-name wiring: every ModelConfig knob is honored.

The reference constructs PointNet_Plus_fine with sample_num_level1=32,
knn_K=128 (cn3d_model_conbag.py:141-234); here ``ModelConfig.name``
selects the variant and ``fine_*`` set its grouping geometry.
"""
import dataclasses
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facl_tpu.config import (Config, GroupingConfig, ModelConfig,
                             OptimConfig, TrainConfig)
from facl_tpu.models import resolve_model
from facl_tpu.train import Trainer


def fine_config():
    return Config(
        grouping=GroupingConfig(num_centroids=8, knn_k=8, radius_sq=10.0),
        model=ModelConfig(name="pointnet_plus_fine",
                          fine_num_centroids=4, fine_knn_k=16,
                          sa_widths=(8, 16), stage2_widths=(16, 32),
                          fc_hidden=32, embed_dim=16, num_prototypes=8,
                          num_crops=4),
        train=TrainConfig(batch_size=2, optim=OptimConfig(learning_rate=1e-3)),
    )


def test_resolve_model_fine_overrides_grouping():
    cfg = fine_config()
    model, g = resolve_model(cfg)
    assert g.num_centroids == 4 and g.knn_k == 16
    assert g.radius_sq == cfg.grouping.radius_sq     # non-geometry inherited
    # default name keeps the plain grouping
    model2, g2 = resolve_model(Config())
    assert g2 == Config().grouping


def test_resolve_model_rejects_unknown_and_slowfast():
    with pytest.raises(ValueError, match="slow_fast"):
        resolve_model(Config(model=ModelConfig(name="slow_fast")))
    with pytest.raises(ValueError, match="unknown"):
        resolve_model(Config(model=ModelConfig(name="nope")))


def test_fine_variant_trains_from_config_json(rng):
    """--config '{"model": {"name": "pointnet_plus_fine"}}' must train."""
    cfg = Config.from_json(fine_config().to_json())
    assert cfg.model.name == "pointnet_plus_fine"
    tr = Trainer(cfg, steps_per_epoch=10)
    assert tr.g_cfg.num_centroids == 4 and tr.g_cfg.knn_k == 16

    G, B, N, C = 4, 2, 32, 4
    batch = jnp.asarray(rng.normal(size=(G, B, N, C)).astype(np.float32))
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    state, m = tr.step_fn(state, batch, jax.random.PRNGKey(1),
                          jnp.asarray(0))
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 1


def test_no_unread_config_knobs():
    """Every leaf field name in the config tree must be read somewhere in
    facl_tpu/ (the round-1 verdict found four dead knobs)."""
    import pathlib
    import facl_tpu
    from facl_tpu.config import _SUBCONFIGS

    root = pathlib.Path(facl_tpu.__file__).parent
    source = "\n".join(p.read_text() for p in root.rglob("*.py"))

    def leaf_fields(cls, out):
        # config.py uses `from __future__ import annotations`, so field
        # types are strings — recurse via the _SUBCONFIGS registry.
        for f in dataclasses.fields(cls):
            if f.name in _SUBCONFIGS:
                leaf_fields(_SUBCONFIGS[f.name], out)
            else:
                out.add(f.name)
        return out

    unread = sorted(name for name in leaf_fields(Config, set())
                    if f".{name}" not in source)
    assert not unread, f"config fields read by nothing: {unread}"
