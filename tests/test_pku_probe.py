"""PKU-MMD transfer evaluation: dataset split + probe CLI end-to-end on
synthetic feature files (reference: dataset_of_lin.py:178-305)."""
import os

import numpy as np
import pytest

from facl_tpu.data.pku_mmd import PKUMMDFeatures, parse_pku_name


def write_pku_tree(root, n_per_camera=3, num_actions=4, dim=64, seed=0):
    rng = np.random.default_rng(seed)
    names = []
    for cam_i, cam in enumerate(("R", "M", "L")):
        for j in range(n_per_camera):
            action = (j % num_actions) + 1
            # layout matches the reference: camera letter at index 7,
            # action = last two digits before the extension.
            name = f"{cam_i:03d}{j:03d}-{cam}_A{action:02d}.npy"
            assert name[7] == cam
            # class-separable features so the probe actually learns
            f = rng.normal(size=dim).astype(np.float32)
            f[action] += 8.0
            np.save(os.path.join(root, name), f)
            names.append(name)
    return names


def test_parse_and_split(tmp_path):
    write_pku_tree(str(tmp_path))
    # camera letter at index 7, action = last two digits of the stem
    # (dataset_of_lin.py:264-272)
    info = parse_pku_name("0291-02R_A05.npy")
    assert info.camera == "R" and info.action == 5 and info.label == 4

    train = PKUMMDFeatures(str(tmp_path), train=True)
    test = PKUMMDFeatures(str(tmp_path), train=False)
    assert len(train) == 6 and len(test) == 3          # R+M train, L test
    tr_f, tr_y = train.load_all()
    assert tr_f.shape == (6, 64) and tr_y.min() >= 0


def test_probe_cli_pku(tmp_path, capsys):
    from facl_tpu.cli import probe as probe_cli

    write_pku_tree(str(tmp_path), n_per_camera=8, num_actions=3)
    probe_cli.main(["--pku", str(tmp_path), "--epochs", "40",
                    "--num-classes", "8"])
    out = capsys.readouterr().out
    assert "top1=" in out
    top1 = float(out.strip().split("top1=")[1])
    assert top1 > 50.0       # separable synthetic features


def test_probe_cli_pku_empty_dir(tmp_path):
    from facl_tpu.cli import probe as probe_cli

    with pytest.raises(SystemExit):
        probe_cli.main(["--pku", str(tmp_path)])


def test_probe_cli_requires_sources():
    from facl_tpu.cli import probe as probe_cli

    with pytest.raises(SystemExit):
        probe_cli.main(["--epochs", "1"])
