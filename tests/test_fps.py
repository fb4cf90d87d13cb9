"""FPS tests (semantics of cn3D_data_set.py:675-694)."""
import numpy as np
import jax
import jax.numpy as jnp

from facl_tpu.ops.fps import farthest_point_sampling, fps_batched, fps_reorder


def numpy_fps_oracle(pc, sample_num, first):
    """Reference max-min FPS given a fixed first pick."""
    n = pc.shape[0]
    idx = np.zeros(sample_num, np.int64)
    idx[0] = first
    min_dist = np.sum((pc - pc[first]) ** 2, axis=1)
    for s in range(1, sample_num):
        idx[s] = np.argmax(min_dist)
        d = np.sum((pc - pc[idx[s]]) ** 2, axis=1)
        min_dist = np.minimum(min_dist, d)
    return idx


def test_fps_matches_oracle(rng):
    pc = rng.normal(size=(64, 3)).astype(np.float32)
    key = jax.random.PRNGKey(3)
    got = np.asarray(farthest_point_sampling(key, jnp.asarray(pc), 16))
    exp = numpy_fps_oracle(pc, 16, got[0])
    np.testing.assert_array_equal(got, exp)


def test_fps_spreads_points():
    # Four well-separated clusters: 4 samples must hit all four.
    centers = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0], [0, 0, 10]], np.float32)
    pc = np.repeat(centers, 8, axis=0) + 0.01 * np.arange(32)[:, None]
    idx = np.asarray(farthest_point_sampling(jax.random.PRNGKey(0),
                                             jnp.asarray(pc), 4))
    clusters = set((idx // 8).tolist())
    assert len(clusters) == 4


def test_fps_batched_shape(rng):
    pc = jnp.asarray(rng.normal(size=(3, 50, 3)).astype(np.float32))
    idx = fps_batched(jax.random.PRNGKey(0), pc, 10)
    assert idx.shape == (3, 10)


def test_fps_reorder_front_block_is_fps_set(rng):
    pts = jnp.asarray(rng.normal(size=(2, 40, 4)).astype(np.float32))
    key = jax.random.PRNGKey(1)
    out = fps_reorder(key, pts, 8)
    assert out.shape == pts.shape
    # Reordering is a permutation.
    for b in range(2):
        a = np.asarray(pts[b])
        o = np.asarray(out[b])
        assert sorted(map(tuple, a)) == sorted(map(tuple, o))
