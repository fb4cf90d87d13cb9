"""Config round-trip, CLI config building, extraction feature layout, and
checkpoint housekeeping tests."""
import dataclasses
import json
import os

import numpy as np
import pytest

from facl_tpu.config import Config, GroupingConfig, LossConfig
from facl_tpu.train.extract import features_from_outputs


def test_config_json_roundtrip():
    cfg = Config(
        grouping=GroupingConfig(num_centroids=32, knn_k=16, radius_sq=0.1),
        loss=LossConfig(use_swav=True, swav_weight=0.5),
    )
    text = cfg.to_json()
    back = Config.from_json(text)
    assert back.grouping.num_centroids == 32
    assert back.grouping.radius_sq == pytest.approx(0.1)
    assert back.loss.use_swav and back.loss.swav_weight == pytest.approx(0.5)
    # Tuples survive.
    assert back.model.sa_widths == cfg.model.sa_widths
    assert isinstance(back.model.sa_widths, tuple)
    assert back.train.optim.learning_rate == cfg.train.optim.learning_rate


def test_cli_build_config():
    from facl_tpu.cli.pretrain import add_common_args, build_config
    import argparse
    p = argparse.ArgumentParser()
    add_common_args(p)
    args = p.parse_args(["--root", "/tmp/x", "--stream", "appearance",
                         "--dataset", "ntu120", "--protocol", "xsub",
                         "--batch-size", "8", "--dtype", "float32"])
    cfg = build_config(args)
    assert cfg.data.stream == "appearance"
    assert cfg.data.dataset == "ntu120"
    assert cfg.data.protocol == "xsub"
    assert cfg.train.batch_size == 8
    assert cfg.model.compute_dtype == "float32"


def test_features_from_outputs_layout(rng):
    """Per-video feature = [crop0 .. crop9, global] concatenated — the
    reference's cat + reshape(11,B,512).transpose(1,0,2) order
    (extract_apperance_feature.py:182,217-221). The eval step emits
    batch-major rows (crop g of video b at row b*G+g,
    models/pointnet.py), and the on-disk per-video layout is unchanged."""
    G, B, D = 3, 2, 4
    x = rng.normal(size=(G * B, D)).astype(np.float32)
    xg = rng.normal(size=(B, D)).astype(np.float32)
    f = features_from_outputs(x, xg, G)
    assert f.shape == (B, (G + 1) * D)
    for b in range(B):
        for g in range(G):
            np.testing.assert_array_equal(f[b, g * D:(g + 1) * D],
                                          x[b * G + g])
        np.testing.assert_array_equal(f[b, G * D:], xg[b])


def test_checkpoint_prune_and_latest(tmp_path):
    import jax.numpy as jnp
    from facl_tpu.train import TrainState, latest_checkpoint, save_checkpoint

    state = TrainState(params={"w": jnp.ones(3)}, batch_stats={},
                       opt_state=(), step=jnp.zeros((), jnp.int32))
    for e in range(6):
        save_checkpoint(str(tmp_path), state, epoch=e, keep=3)
    files = sorted(p for p in os.listdir(tmp_path) if p.endswith(".msgpack"))
    assert len(files) == 3
    assert files[-1] == "ckpt_epoch_00005.msgpack"
    assert latest_checkpoint(str(tmp_path)).endswith("ckpt_epoch_00005.msgpack")
    with open(tmp_path / "index.json") as f:
        assert json.load(f)["latest_epoch"] == 5
