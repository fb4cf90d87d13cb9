"""Datagen tests: rank-pool coefficients, denoise, voxel->point sampling,
masking, and the end-to-end clip pipeline on a synthetic depth sequence."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facl_tpu.config import DatagenConfig
from facl_tpu.datagen import (
    ClipGenerator,
    compact_nonzero,
    denoise,
    generate_clip,
    locate_motion,
    mask_depth,
    rank_coefficients,
    voxels_to_points,
)


def oracle_rank_coeffs(n, F, M=5):
    """Loop transcription of generate_NTU.py:411-438."""
    c = np.zeros((M, F))
    for f in range(min(n, F)):
        c[0, f] = 2 * f - n + 1
        if f < round(n * 2 / 5):
            ln = round(n * 2 / 5)
            c[1, f] = 2 * f - ln + 1
        if round(n * 1 / 5) <= f < round(n * 3 / 5):
            idx = f - round(n * 1 / 5)
            ln = round(n * 3 / 5) - round(n * 1 / 5)
            c[2, f] = 2 * idx - ln + 1
        if round(n * 2 / 5) <= f < round(n * 4 / 5):
            idx = f - round(n * 2 / 5)
            ln = round(n * 4 / 5) - round(n * 2 / 5)
            c[3, f] = 2 * idx - ln + 1
        if f >= round(n * 3 / 5):
            idx = f - round(n * 3 / 5)
            ln = n - round(n * 3 / 5)
            c[4, f] = 2 * idx - ln + 1
    return c


@pytest.mark.parametrize("n", [3, 10, 17, 60])
def test_rank_coefficients_match_oracle(n):
    got = np.asarray(rank_coefficients(jnp.asarray(n), 60, 5))
    exp = oracle_rank_coeffs(n, 60)
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_denoise_drops_sparse_keeps_dense():
    g = np.zeros((9, 9, 9), np.float32)
    g[4, 4, 4] = 3.0          # isolated voxel: 27-count = 1 -> dropped
    g[1:4, 1:4, 1:4] = 2.0    # solid 3^3 block: center has count 27
    out = np.asarray(denoise(jnp.asarray(g), 5))
    assert out[4, 4, 4] == 0.0
    assert out[2, 2, 2] == 2.0
    # Block corner (1,1,1): count = 8 >= 5 -> kept.
    assert out[1, 1, 1] == 2.0
    # Border voxels always dropped.
    g2 = np.ones((5, 5, 5), np.float32)
    out2 = np.asarray(denoise(jnp.asarray(g2), 5))
    assert out2[0].sum() == 0 and out2[:, 0].sum() == 0


def test_compact_nonzero():
    m = jnp.asarray(np.array([0, 1, 0, 0, 1, 1, 0], np.bool_))
    ids, n = compact_nonzero(m)
    assert int(n) == 3
    np.testing.assert_array_equal(np.asarray(ids[:3]), [1, 4, 5])


def test_voxels_to_points_keep_all_branch(rng):
    di = np.zeros((2, 4, 4, 4), np.float32)
    # 5 nonzero voxels (one only in channel 1: "any channel" rule).
    vox = [(0, 1, 2), (1, 1, 1), (2, 3, 0), (3, 3, 3), (2, 2, 2)]
    for i, (x, y, z) in enumerate(vox):
        ch = 1 if i == 4 else 0
        di[ch, x, y, z] = i + 1.0
    pts, n_valid = voxels_to_points(jax.random.PRNGKey(0), jnp.asarray(di), 16)
    assert int(n_valid) == 5
    got = np.asarray(pts)
    assert got.shape == (16, 5)
    coords = {tuple(map(int, r[:3])) for r in got}
    assert coords == set(vox)       # every valid voxel present (keep-all)
    # Motion features read from the full channel stack.
    for r in got:
        x, y, z = map(int, r[:3])
        np.testing.assert_allclose(r[3:], di[:, x, y, z])


def test_voxels_to_points_select_mask(rng):
    di = np.zeros((1, 4, 4, 4), np.float32)
    di[0, 1, 1, 1] = 5.0
    di[0, 2, 2, 2] = 7.0
    mask = np.zeros((4, 4, 4), bool)
    mask[2, 2, 2] = True
    pts, n = voxels_to_points(jax.random.PRNGKey(0), jnp.asarray(di), 8,
                              select_mask=jnp.asarray(mask))
    assert int(n) == 1
    got = np.asarray(pts)
    assert (got[:, :3] == [2, 2, 2]).all() and (got[:, 3] == 7.0).all()


def test_mask_depth_boundary():
    H, W = 64, 64
    d = np.zeros((H, W), np.float32)
    d[10:60, 10:50] = 1000.0
    out = np.asarray(mask_depth(jnp.asarray(d), (5, 3, 2, 2)))
    nz = np.nonzero(out)
    # Top seg[0]=5 rows zeroed (no effect here; body starts at 10), rows >=
    # last(59) - 3 = 56 zeroed, cols < 10+2 and >= 49-2 zeroed.
    assert nz[0].min() == 10 and nz[0].max() == 55
    assert nz[1].min() == 12 and nz[1].max() == 46


def test_locate_motion_band():
    prev = jnp.full((4, 4), 1000.0)
    cur = jnp.asarray(np.array(
        [[1000., 1060., 1400., 1240.],
         [1049., 1051., 999., 700.],
         [1000., 1000., 1000., 1000.],
         [1000., 1000., 1000., 1000.]], np.float32))
    out = np.asarray(locate_motion(prev, cur))
    assert out[0, 1] == 1060.0      # |60| in (50, 300)
    assert out[0, 2] == 0.0         # 400 too big
    assert out[0, 3] == 1240.0
    assert out[1, 0] == 0.0         # 49 too small
    assert out[1, 1] == 1051.0
    assert out[1, 3] == 0.0         # 300 not < 300


def small_cfg():
    return DatagenConfig(grid_shape=(24, 24, 24), image_shape=(48, 64),
                         sample_num=256, max_frames=8,
                         num_appearance_frames=4, boundary_seg=(2, 1, 1, 1),
                         voxel_size=60.0)


def synthetic_frames(F=8, H=48, W=64, seed=0):
    """A blob moving across the image with depth ~ 1000."""
    frames = np.zeros((F, H, W), np.float32)
    for f in range(F):
        x0 = 8 + 3 * f + (seed % 4)
        frames[f, 12:36, x0:x0 + 16] = 900.0 + 10.0 * f + 5.0 * seed
    return frames


def test_generate_clip_end_to_end():
    cfg = small_cfg()
    frames = synthetic_frames()
    out = generate_clip(jax.random.PRNGKey(0), jnp.asarray(frames),
                        jnp.asarray(8, jnp.int32), cfg, 8)
    raw = np.asarray(out["raw"])
    keyp = np.asarray(out["key"])
    app = np.asarray(out["app"])
    assert raw.shape == (256, 3 + 5)
    assert keyp.shape == (256, 3 + 5)
    assert app.shape == (4, 256, 4)
    assert int(out["n_raw"]) > 0
    assert np.isfinite(raw).all() and np.isfinite(app).all()
    # Normalization invariants: y spans exactly 1 on the raw cloud, motion
    # channels within [-0.5, 0.5].
    y = raw[:, 1]
    np.testing.assert_allclose(y.max() - y.min(), 1.0, atol=1e-5)
    assert raw[:, 3:].min() >= -0.5 - 1e-5
    assert raw[:, 3:].max() <= 0.5 + 1e-5
    # Key voxels are a subset of raw-grid voxels and share its motion values.
    assert np.abs(keyp[:, 3:]).max() <= 0.5 + 1e-5


def test_clip_generator_frame_cap():
    cfg = small_cfg()
    gen = ClipGenerator(cfg, max_frames=4, seed=0)
    out = gen.from_frames(synthetic_frames(F=12))
    assert out["raw"].shape == (256, 8)
    assert out["app"].shape == (4, 256, 4)


def test_generate_clips_batched_matches_single():
    """Cross-clip batched generation (generate_clips; VERDICT r2 item 6)
    writes the same artifacts as per-clip runs: the vmapped program is the
    same math per clip with the same per-clip PRNG keys."""
    import jax.numpy as jnp

    from facl_tpu.datagen import generate_clips

    cfg = small_cfg()
    V, F = 3, 8
    frames = np.stack([synthetic_frames(F=F, seed=s) for s in range(V)])
    keys = jnp.stack([jax.random.PRNGKey(s) for s in range(V)])
    ns = jnp.full((V,), F, jnp.int32)
    batched = generate_clips(keys, jnp.asarray(frames), ns, cfg, F)
    for i in range(V):
        single = generate_clip(keys[i], jnp.asarray(frames[i]),
                               jnp.asarray(F, jnp.int32), cfg, F)
        for k in ("raw", "key", "app"):
            np.testing.assert_allclose(
                np.asarray(batched[k][i]), np.asarray(single[k]),
                atol=1e-6, err_msg=f"clip {i} field {k}")
        assert int(batched["n_raw"][i]) == int(single["n_raw"])


def test_clip_generator_batch_matches_single_and_pads():
    """from_frames_batch with tags reproduces tagged from_frames exactly
    (shard-invariant randomness) incl. the pad_to tail-reuse path."""
    cfg = small_cfg()
    clips = [synthetic_frames(F=12, seed=s) for s in range(2)]
    tags = ["vidA", "vidB"]
    outs = ClipGenerator(cfg, max_frames=4, seed=0).from_frames_batch(
        clips, tags=tags, pad_to=4)
    assert len(outs) == 2
    gen = ClipGenerator(cfg, max_frames=4, seed=0)
    for clip, tag, got in zip(clips, tags, outs):
        want = gen.from_frames(clip, tag=tag)
        for k in ("raw", "key", "app"):
            np.testing.assert_allclose(got[k], want[k], atol=1e-6,
                                       err_msg=f"{tag} {k}")


@pytest.mark.slow
def test_generate_dataset_clip_batch_matches_default(tmp_path):
    """generate_dataset(clip_batch=N) writes an identical tree to the
    per-clip driver (randomness is keyed per video)."""
    imageio = pytest.importorskip("imageio.v2")
    cfg = small_cfg()
    cfg = DatagenConfig(**{**cfg.__dict__, "resolutions": (8,)})
    for vi in range(3):
        vid_dir = (tmp_path / "data" / "setup1" / "nturgb+d_depth_masked" /
                   f"S001C001P001R001A{vi + 1:03d}")
        vid_dir.mkdir(parents=True)
        for i, fr in enumerate(synthetic_frames(F=6, seed=vi)):
            imageio.imwrite(str(vid_dir / f"f{i:03d}.png"),
                            fr.astype(np.uint16))
    from facl_tpu.datagen import generate_dataset
    n1 = generate_dataset(str(tmp_path / "data"), str(tmp_path / "out1"),
                          cfg, clip_batch=1)
    n2 = generate_dataset(str(tmp_path / "data"), str(tmp_path / "out2"),
                          cfg, clip_batch=2)   # 3 videos -> one padded tail
    assert n1 == n2 == 3
    for f in sorted((tmp_path / "out1").rglob("*.npy")):
        rel = f.relative_to(tmp_path / "out1")
        np.testing.assert_allclose(
            np.load(f), np.load(tmp_path / "out2" / rel), atol=1e-6,
            err_msg=str(rel))


def test_generate_dataset_limit_exact_with_pipelining(tmp_path):
    """--limit writes exactly that many clips even with the
    double-buffered clip_batch driver (a pending in-flight group must
    count toward the limit)."""
    imageio = pytest.importorskip("imageio.v2")
    cfg = small_cfg()
    cfg = DatagenConfig(**{**cfg.__dict__, "resolutions": (8,)})
    for vi in range(5):
        vid_dir = (tmp_path / "data" / "setup1" / "nturgb+d_depth_masked" /
                   f"S001C001P001R001A{vi + 1:03d}")
        vid_dir.mkdir(parents=True)
        for i, fr in enumerate(synthetic_frames(F=6, seed=vi)):
            imageio.imwrite(str(vid_dir / f"f{i:03d}.png"),
                            fr.astype(np.uint16))
    from facl_tpu.datagen import generate_dataset
    n = generate_dataset(str(tmp_path / "data"), str(tmp_path / "out"),
                         cfg, limit=3, clip_batch=2)
    assert n == 3
    raws = list((tmp_path / "out" / "Resolution8" / "raw").glob("*.npy"))
    assert len(raws) == 3


@pytest.mark.slow
def test_generate_dataset_walks_ntu_tree(tmp_path):
    """The host driver walks <root>/<setup>/nturgb+d_depth_masked/<video>/
    and writes the reference's output layout (generate_NTU.py:86-112)."""
    imageio = pytest.importorskip("imageio.v2")
    cfg = small_cfg()
    cfg = DatagenConfig(**{**cfg.__dict__, "resolutions": (8, 4)})
    vid_dir = (tmp_path / "data" / "nturgbd_depth_masked_s001" /
               "nturgb+d_depth_masked" / "S001C001P001R001A001")
    vid_dir.mkdir(parents=True)
    frames = synthetic_frames(F=6)
    for i, fr in enumerate(frames):
        imageio.imwrite(str(vid_dir / f"f{i:03d}.png"),
                        fr.astype(np.uint16))
    from facl_tpu.datagen import generate_dataset
    n = generate_dataset(str(tmp_path / "data"), str(tmp_path / "out"), cfg)
    assert n == 2  # one video x two resolutions
    for res in (8, 4):
        base = tmp_path / "out" / f"Resolution{res}"
        assert (base / "raw" / "S001C001P001R001A001.npy").exists()
        assert (base / "others" / "S001C001P001R001A001_key.npy").exists()
        assert (base / "app" / "S001C001P001R001A001_app.npy").exists()
    raw = np.load(tmp_path / "out" / "Resolution8" / "raw" /
                  "S001C001P001R001A001.npy")
    assert raw.shape == (cfg.sample_num, 8) and np.isfinite(raw).all()


def test_rank_pool_matches_loop_oracle(rng):
    """The one-shot sort+scatter rank_pool must be BIT-IDENTICAL to the
    frame-loop formulation (per-frame occupancy dedupe, coefficient-
    weighted accumulation): the rank coefficients are integers, so f32
    sums are exact in any order."""
    import jax.numpy as jnp

    from facl_tpu.config import DatagenConfig
    from facl_tpu.datagen.voxelize import (rank_coefficients, rank_pool,
                                           voxel_indices)

    cfg = DatagenConfig(grid_shape=(16, 12, 12), voxel_size=30.0,
                        max_frames=8)
    F, P = 8, 200
    n_frame = jnp.asarray(6)
    origin = jnp.asarray([0.0, 0.0, 0.0])
    # Cluster points so voxels repeat within and across frames (the
    # dedupe path matters), with some out-of-range and invalid ones.
    pts = rng.uniform(-40, 16 * 30 + 40, size=(F, P, 3)).astype(np.float32)
    pts[:, : P // 3] = rng.uniform(0, 100, size=(F, P // 3, 3))
    valid = rng.uniform(size=(F, P)) > 0.2
    kpts = rng.uniform(0, 300, size=(F, P, 3)).astype(np.float32)
    kvalid = rng.uniform(size=(F, P)) > 0.5

    di, dk = rank_pool(jnp.asarray(pts), jnp.asarray(valid),
                       jnp.asarray(kpts), jnp.asarray(kvalid),
                       n_frame, origin, cfg)

    # NumPy loop oracle (the original formulation).
    coef = np.asarray(rank_coefficients(n_frame, F, cfg.num_splits))
    coef_key = np.where(np.arange(F) < 6, 2.0 * np.arange(F) - 6 + 1.0, 0.0)
    di_o = np.zeros((cfg.num_splits,) + cfg.grid_shape, np.float32)
    dk_o = np.zeros(cfg.grid_shape, np.float32)
    for f in range(F):
        for tgt, src_p, src_v, w in ((di_o, pts, valid, coef[:, f]),
                                     (dk_o[None], kpts, kvalid,
                                      coef_key[f:f + 1])):
            idx, v = voxel_indices(jnp.asarray(src_p[f]),
                                   jnp.asarray(src_v[f]), origin,
                                   cfg.voxel_size, cfg.grid_shape)
            idx, v = np.asarray(idx), np.asarray(v)
            occ = np.zeros(cfg.grid_shape, np.float32)
            occ[idx[v, 0], idx[v, 1], idx[v, 2]] = 1.0
            tgt += w[:, None, None, None] * occ[None]

    np.testing.assert_array_equal(np.asarray(di), di_o)
    np.testing.assert_array_equal(np.asarray(dk), dk_o)


def test_generate_dataset_sharded_matches_unsharded(tmp_path):
    """Sharded generation (one process per chip/host) must produce
    byte-identical trees to an unsharded run: per-video randomness is
    keyed by (seed, video name), not by walk order."""
    imageio = pytest.importorskip("imageio.v2")
    cfg = small_cfg()
    cfg = DatagenConfig(**{**cfg.__dict__, "resolutions": (8,)})
    for vi in range(3):
        vid_dir = (tmp_path / "data" / "setup1" / "nturgb+d_depth_masked" /
                   f"S001C001P001R001A{vi + 1:03d}")
        vid_dir.mkdir(parents=True)
        for i, fr in enumerate(synthetic_frames(F=6, seed=vi)):
            imageio.imwrite(str(vid_dir / f"f{i:03d}.png"),
                            fr.astype(np.uint16))

    from facl_tpu.datagen import generate_dataset
    n0 = generate_dataset(str(tmp_path / "data"), str(tmp_path / "full"),
                          cfg)
    n1 = generate_dataset(str(tmp_path / "data"), str(tmp_path / "sh"),
                          cfg, shard=0, num_shards=2)
    n2 = generate_dataset(str(tmp_path / "data"), str(tmp_path / "sh"),
                          cfg, shard=1, num_shards=2)
    assert n0 == 3 and n1 + n2 == 3 and n1 > 0 and n2 > 0

    import os as _os
    for sub in ("raw", "others", "app"):
        full_dir = tmp_path / "full" / "Resolution8" / sub
        sh_dir = tmp_path / "sh" / "Resolution8" / sub
        names = sorted(_os.listdir(full_dir))
        assert names == sorted(_os.listdir(sh_dir))
        for name in names:
            np.testing.assert_array_equal(
                np.load(full_dir / name), np.load(sh_dir / name),
                err_msg=name)
