"""Augmentation transform tests (cn3D_data_set.py:697-776 semantics)."""
import numpy as np
import jax
import jax.numpy as jnp

from facl_tpu.ops import transforms as T


def _pts(rng, B=2, N=32, C=4):
    return jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))


def test_jitter_bounded_and_feature_preserving(rng):
    p = _pts(rng)
    out = T.jitter(jax.random.PRNGKey(0), p, sigma=0.01, clip=0.05)
    delta = np.asarray(out - p)
    assert np.abs(delta[..., :3]).max() <= 0.05 + 1e-6
    np.testing.assert_array_equal(delta[..., 3], 0)


def test_mirror_x(rng):
    p = _pts(rng)
    out = T.mirror_x(p)
    np.testing.assert_allclose(np.asarray(out[..., 0]), -np.asarray(p[..., 0]))
    np.testing.assert_allclose(np.asarray(out[..., 1:]), np.asarray(p[..., 1:]))


def test_rotate_y_preserves_norm_and_y(rng):
    p = _pts(rng)
    out = T.rotate_y_random(jax.random.PRNGKey(1), p, rotate_range=0.8)
    np.testing.assert_allclose(np.asarray(out[..., 1]), np.asarray(p[..., 1]),
                               atol=1e-5)
    n0 = np.linalg.norm(np.asarray(p[..., :3]), axis=-1)
    n1 = np.linalg.norm(np.asarray(out[..., :3]), axis=-1)
    np.testing.assert_allclose(n0, n1, atol=1e-4)


def test_rotate_y_fixed_matches_matrix(rng):
    p = _pts(rng, B=1)
    out = T.rotate_y_fixed(p, angle_set=1.0)  # pi/4
    a = np.pi / 4
    Ry = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                   [-np.sin(a), 0, np.cos(a)]])
    exp = np.asarray(p[0, :, :3]) @ Ry
    np.testing.assert_allclose(np.asarray(out[0, :, :3]), exp, atol=1e-5)


def test_normalize_xyz_uses_y_extent(rng):
    p = _pts(rng, B=1, N=100)
    out = np.asarray(T.normalize_xyz(p))
    y = out[0, :, 1]
    # y is centered and spans exactly 1 after dividing by the y extent.
    np.testing.assert_allclose(y.max() + y.min(), 0.0, atol=1e-5)
    np.testing.assert_allclose(y.max() - y.min(), 1.0, atol=1e-5)


def test_resample_shape_and_membership(rng):
    p = _pts(rng, B=1, N=16)[0]
    out = T.resample(jax.random.PRNGKey(2), p, 64)
    assert out.shape == (64, 4)
    src = set(map(tuple, np.asarray(p).tolist()))
    assert all(tuple(r) in src for r in np.asarray(out).tolist())


def test_masked_resample_only_picks_valid(rng):
    p = _pts(rng, B=1, N=32)[0]
    mask = np.zeros(32, np.float32)
    mask[5] = mask[17] = 1.0
    out = T.masked_resample(jax.random.PRNGKey(3), p, jnp.asarray(mask), 50)
    valid = {tuple(np.asarray(p[5]).tolist()), tuple(np.asarray(p[17]).tolist())}
    assert all(tuple(r) in valid for r in np.asarray(out).tolist())


def test_temporal_channel_view(rng):
    p = np.asarray(_pts(rng, B=1, N=64, C=8)[0]).copy()
    p[:, 4] = 0.0
    p[::4, 4] = 1.5   # only every 4th point has nonzero channel 4
    out = np.asarray(T.temporal_channel_view(
        jax.random.PRNGKey(4), jnp.asarray(p), channel=4, num_out=32))
    assert out.shape == (32, 4)
    np.testing.assert_allclose(out[:, 3], 1.5)


def test_scale_and_shift_ranges(rng):
    p = _pts(rng)
    s = T.scale_random(jax.random.PRNGKey(5), p, 0.5, 1.5)
    ratio = np.asarray(s[..., :3]) / np.asarray(p[..., :3])
    assert (ratio.max() <= 1.5 + 1e-5) and (ratio.min() >= 0.5 - 1e-5)
    sh = T.shift_random(jax.random.PRNGKey(6), p, 0.1)
    d = np.asarray(sh[..., :3] - p[..., :3])
    assert np.abs(d).max() <= 0.1 + 1e-6
