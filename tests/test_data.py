"""Data-layer tests: NTU parsing/splits, the 10-crop factory contract, and
the file-backed dataset + loader over a synthetic generated tree."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facl_tpu.config import DataConfig
from facl_tpu.data import (
    ClipSources,
    CropLoader,
    NTUPointDataset,
    make_crops,
    make_crops_batch,
    parse_name,
    split_videos,
    write_synthetic_dataset,
)


def test_parse_name():
    v = parse_name("S001C002P003R002A017.npy")
    assert (v.setup, v.camera, v.performer, v.replication, v.action) == \
        (1, 2, 3, 2, 17)
    assert v.label == 16
    assert v.name == "S001C002P003R002A017"


def test_splits_partition():
    names = [f"S{s:03d}C{c:03d}P{p:03d}R001A001"
             for s in (1, 2) for c in (1, 2, 3) for p in (1, 3, 4)]
    infos = [parse_name(n) for n in names]
    for proto in ("xsub", "xview", "xset"):
        tr, te = split_videos(infos, proto, "ntu60")
        assert sorted(tr + te) == list(range(len(infos)))
        assert len(tr) > 0 and len(te) > 0
    # xview: cameras 2,3 train.
    tr, te = split_videos(infos, "xview", "ntu60")
    assert all(infos[i].camera in (2, 3) for i in tr)
    assert all(infos[i].camera == 1 for i in te)


def _sources(rng, N=256):
    def cloud(C=8):
        p = rng.normal(size=(N, C)).astype(np.float32)
        return jnp.asarray(p)
    return ClipSources(points=cloud(), key_points=cloud(),
                       temporal_source=cloud(), res30=cloud(),
                       res10=cloud())


def test_make_crops_shape_and_order(rng):
    src = _sources(rng)
    crops = make_crops(jax.random.PRNGKey(0), src, num_points=64)
    assert crops.shape == (10, 64, 4)
    c = np.asarray(crops)
    pts = np.asarray(src.points)[:, :4]
    # Crop 0 (raw): rows are untouched members of the source cloud.
    srcset = set(map(tuple, pts.tolist()))
    assert all(tuple(r) in srcset for r in c[0].tolist())
    # Crop 1 (rev): x negated + jitter, so x of rev correlates negatively
    # with any matching source row -> check simple invariant: mean |x| is
    # preserved within jitter tolerance.
    assert abs(np.abs(c[1][:, 0]).mean() -
               np.abs(pts[:, 0]).mean()) < 0.3
    # Temporal views carry the chosen channel in slot 3 (nonzero).
    assert (np.abs(c[6][:, 3]) > 0).all()
    assert (np.abs(c[7][:, 3]) > 0).all()
    # Res crops come from their own sources.
    r30 = set(map(tuple, np.asarray(src.res30)[:, :4].tolist()))
    assert all(tuple(r) in r30 for r in c[8].tolist())


def test_make_crops_deterministic(rng):
    src = _sources(rng)
    a = make_crops(jax.random.PRNGKey(5), src, num_points=32)
    b = make_crops(jax.random.PRNGKey(5), src, num_points=32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = make_crops(jax.random.PRNGKey(6), src, num_points=32)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_make_crops_batch_layout(rng):
    B = 3
    srcs = ClipSources(*(jnp.asarray(
        rng.normal(size=(B, 128, 8)).astype(np.float32)) for _ in range(5)))
    cfg = DataConfig(num_points=32)
    out = make_crops_batch(jax.random.PRNGKey(0), srcs, cfg)
    assert out.shape == (10, B, 32, 4)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_ntu")
    names = write_synthetic_dataset(str(root), num_videos=6, seed=0)
    return str(root), names


def test_dataset_and_loader(synth_root):
    root, names = synth_root
    cfg = DataConfig(dataset="ntu60", protocol="xview", num_points=64,
                     stream="motion")
    train = NTUPointDataset(root, cfg, train=True)
    test = NTUPointDataset(root, cfg, train=False)
    assert len(train) + len(test) == len(names)

    if len(train) >= 2:
        loader = CropLoader(train, batch_size=2, key=jax.random.PRNGKey(0))
        crops, labels, bnames = next(iter(loader.epoch(0)))
        assert crops.shape == (10, 2, 64, 4)
        assert labels.shape == (2,)
        assert all(n in names for n in bnames)


def test_dataset_appearance_stream(synth_root):
    root, names = synth_root
    cfg = DataConfig(dataset="ntu60", protocol="xview", num_points=64,
                     stream="appearance")
    ds = NTUPointDataset(root, cfg, train=True)
    if len(ds) == 0:
        pytest.skip("no train videos in synthetic split")
    src, label, name = ds.load_sources(0)
    # Appearance pool: flattened (A*2048, 4); temporal source stays the
    # 8-channel raw cloud.
    assert src.points.shape[1] == 4
    assert src.temporal_source.shape[1] == 8
    crops = make_crops(jax.random.PRNGKey(0), ClipSources(
        *(jnp.asarray(f) for f in src)), num_points=64)
    assert crops.shape == (10, 64, 4)


def test_simclr_crops_and_random_augment(rng):
    from facl_tpu.data import make_simclr_crops, random_augment
    src = _sources(rng)
    out = make_simclr_crops(jax.random.PRNGKey(0), src, num_points=64)
    assert out.shape == (2, 64, 4)
    assert np.isfinite(np.asarray(out)).all()
    # random_augment: scale in [0.6,1.4] + rotation + jitter keeps y scaled.
    p = jnp.asarray(rng.normal(size=(2, 32, 4)).astype(np.float32))
    a = random_augment(jax.random.PRNGKey(1), p)
    assert a.shape == p.shape
    np.testing.assert_array_equal(np.asarray(a[..., 3]), np.asarray(p[..., 3]))


def test_pku_mmd_dataset(tmp_path, rng):
    from facl_tpu.data import PKUMMDFeatures, parse_pku_name
    # Camera letter sits at index 7 (dataset_of_lin.py:266).
    names = ["0291-01R_A05.npy", "0292-02L_A07.npy", "0293-03M_A05.npy",
             "0294-04L_A03.npy"]
    for n in names:
        np.save(tmp_path / n, rng.normal(size=(8,)).astype(np.float32))
    v = parse_pku_name("0291-01R_A05.npy")
    assert v.camera == "R" and v.action == 5 and v.label == 4
    train = PKUMMDFeatures(str(tmp_path), train=True)
    test = PKUMMDFeatures(str(tmp_path), train=False)
    assert len(train) == 2 and len(test) == 2
    f, l = train.load_all()
    assert f.shape == (2, 8) and set(l.tolist()) == {4}


def test_validation_splits(synth_root):
    root, names = synth_root
    cfg = DataConfig(dataset="ntu60", protocol="xview", num_points=64)
    tv = NTUPointDataset(root, cfg, split="train_with_validation")
    va = NTUPointDataset(root, cfg, split="validation")
    # Disjoint and drawn from the performer tables.
    assert set(tv.indices).isdisjoint(va.indices)


def test_crop_loader_deterministic_across_runs(synth_root):
    root, names = synth_root
    cfg = DataConfig(dataset="ntu60", protocol="xview", num_points=32)
    ds = NTUPointDataset(root, cfg, train=True)
    if len(ds) < 2:
        pytest.skip("not enough train videos")

    def one_epoch():
        loader = CropLoader(ds, 2, jax.random.PRNGKey(7))
        return [(np.asarray(c), list(n)) for c, _, n in loader.epoch(3)]

    a = one_epoch()
    b = one_epoch()
    assert len(a) == len(b)
    for (ca, na), (cb, nb) in zip(a, b):
        assert na == nb
        np.testing.assert_array_equal(ca, cb)
