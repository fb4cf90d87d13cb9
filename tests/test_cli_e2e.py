"""CLI-altitude end-to-end: pretrain (with --config and --resume), extract,
probe via their main() entry points on a tiny synthetic tree."""
import dataclasses
import json
import os

import numpy as np
import pytest

from facl_tpu.config import (Config, DatagenConfig, GroupingConfig,
                             ModelConfig)
from facl_tpu.data import write_synthetic_dataset


@pytest.fixture(scope="module")
def cli_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_tree")
    dg = DatagenConfig(grid_shape=(24, 24, 24), image_shape=(48, 64),
                       sample_num=256, num_appearance_frames=4,
                       voxel_size=80.0, resolutions=(60, 30, 10))
    names = write_synthetic_dataset(str(root), num_videos=6, seed=0,
                                    datagen_cfg=dg)
    return str(root), names


@pytest.fixture(scope="module")
def tiny_cfg_file(tmp_path_factory):
    cfg = Config(
        grouping=GroupingConfig(num_centroids=8, knn_k=8, radius_sq=10.0),
        model=ModelConfig(sa_widths=(8, 16), stage2_widths=(16, 32),
                          fc_hidden=32, embed_dim=16, num_prototypes=8),
    )
    p = tmp_path_factory.mktemp("cfg") / "tiny.json"
    p.write_text(cfg.to_json())
    return str(p)


@pytest.mark.slow
def test_pretrain_resume_extract_probe(cli_root, tiny_cfg_file, tmp_path):
    from facl_tpu.cli import extract, pretrain, probe
    root, names = cli_root
    ck = str(tmp_path / "ck")

    common = ["--root", root, "--stream", "motion", "--batch-size", "2",
              "--dtype", "float32", "--config", tiny_cfg_file]

    pretrain.main(common + ["--epochs", "1", "--out", ck])
    assert os.path.exists(os.path.join(ck, "index.json"))

    # Resume: runs epochs [1, 2) on top of the restored state.
    pretrain.main(common + ["--epochs", "2", "--out", ck, "--resume"])
    with open(os.path.join(ck, "index.json")) as f:
        assert json.load(f)["latest_epoch"] >= 1

    feat = str(tmp_path / "feat")
    extract.main(common + ["--checkpoint", ck, "--out", feat])
    files = [n for n in os.listdir(feat) if n.endswith(".npy")]
    assert len(files) == len(names)
    f0 = np.load(os.path.join(feat, files[0]))
    assert f0.shape == (11 * 16,)       # (G+1) * embed_dim

    # Probe with the same features standing in for both streams.
    probe.main(["--root", root, "--motion-features", feat,
                "--appearance-features", feat, "--epochs", "3"])


@pytest.mark.slow
def test_pretrain_extract_mesh_cli(cli_root, tmp_path):
    """--mesh end to end on the virtual 8-device CPU mesh (dp=2 so the
    tiny batch shards): pretrain one epoch with the flagship pair SA
    path per-shard under shard_map, then extract (mesh grouping +
    ragged-tail batch padding in the loader)."""
    from facl_tpu.cli import extract, pretrain
    from facl_tpu.config import MeshConfig

    root, names = cli_root
    cfg = Config(
        grouping=GroupingConfig(num_centroids=8, knn_k=8, radius_sq=10.0),
        model=ModelConfig(sa_widths=(8, 8, 16), stage2_widths=(16, 32),
                          fc_hidden=32, embed_dim=16, num_prototypes=8,
                          sa_impl="pair", channels_first=True),
        mesh=MeshConfig(dp=2, mp=1),
    )
    cfg_path = tmp_path / "mesh_cfg.json"
    cfg_path.write_text(cfg.to_json())
    ck = str(tmp_path / "ck")
    common = ["--root", root, "--stream", "motion", "--batch-size", "2",
              "--dtype", "float32", "--config", str(cfg_path), "--mesh"]

    pretrain.main(common + ["--epochs", "1", "--out", ck])
    assert os.path.exists(os.path.join(ck, "index.json"))

    feat = str(tmp_path / "feat")
    extract.main(common + ["--checkpoint", ck, "--out", feat])
    files = [n for n in os.listdir(feat) if n.endswith(".npy")]
    assert len(files) == len(names)
    f0 = np.load(os.path.join(feat, files[0]))
    assert f0.shape == (11 * 16,)


@pytest.mark.slow
def test_moco_cli(cli_root, tiny_cfg_file, tmp_path):
    from facl_tpu.cli import moco
    root, names = cli_root
    out = str(tmp_path / "moco_ck")
    moco.main(["--root", root, "--stream", "motion", "--batch-size", "2",
               "--dtype", "float32", "--config", tiny_cfg_file,
               "--epochs", "2", "--out", out, "--queue-len", "8"])
    assert os.path.exists(os.path.join(out, "index.json"))
