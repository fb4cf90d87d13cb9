"""Fused Pallas kNN + ball-query selection (ops/pallas/select.py) vs the
XLA composite (pairwise dists -> top_k -> radius override) — semantics of
training_code/utils_my.py:255-291.

The kernel returns the same index SET per centroid (exact k-th-distance
cut with smaller-index-first tie resolution); order within the K slots is
implementation-defined, so assertions compare sets / sorted neighborhoods.
Runs in interpreter mode on the CPU backend.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from facl_tpu.ops.grouping import group_points, knn_indices, pairwise_sqdist
from facl_tpu.ops.pallas.select import select_knn_ball


def composite_idx(pts, S, K, radius_sq):
    xyz = pts[..., :3]
    sqd = pairwise_sqdist(xyz[:, :S, :], xyz)
    dists, idx = knn_indices(sqd, K)
    rows = jnp.arange(S, dtype=idx.dtype)[None, :, None]
    return np.asarray(jnp.where(dists > radius_sq, rows, idx))


def multiset(a):
    vals, counts = np.unique(a, return_counts=True)
    return dict(zip(vals.tolist(), counts.tolist()))


@pytest.mark.parametrize("radius_sq", [0.06, 0.5, 10.0])
def test_select_matches_composite_sets(rng, radius_sq):
    B, N, C, S, K = 3, 128, 4, 16, 16
    pts = jnp.asarray(
        rng.uniform(-0.5, 0.5, size=(B, N, C)).astype(np.float32))
    exp = composite_idx(pts, S, K, radius_sq)
    got = np.asarray(select_knn_ball(pts, S, K, radius_sq, interpret=True))
    assert got.shape == exp.shape
    for b in range(B):
        for s in range(S):
            # Same SET of in-radius selections; centroid-padding counts may
            # differ in position only, so compare as multisets after
            # collapsing pads (both pad with the centroid's own index s).
            assert multiset(got[b, s]) == multiset(exp[b, s]), (b, s)


def test_select_exact_ties_duplicate_points(rng):
    # Duplicate points => equal distances; the cut must stay exact and
    # deterministic (smaller index wins), and the multiset must match the
    # stable-sort oracle.
    B, N, S, K = 2, 64, 8, 12
    base = rng.uniform(-0.5, 0.5, size=(B, N // 2, 4)).astype(np.float32)
    pts_np = np.concatenate([base, base], axis=1)  # every point twice
    pts = jnp.asarray(pts_np)
    got = np.asarray(select_knn_ball(pts, S, K, 0.4, interpret=True))

    dall = np.asarray(pairwise_sqdist(pts[..., :3][:, :S], pts[..., :3]))
    for b in range(B):
        for s in range(S):
            d = dall[b, s]
            order = np.argsort(d, kind="stable")[:K]
            exp = np.where(d[order] > 0.4, s, order)
            assert multiset(got[b, s]) == multiset(exp), (b, s)


def test_select_all_out_of_radius_pads_with_centroid(rng):
    pts_np = np.zeros((1, 32, 4), np.float32)
    pts_np[0, :, :3] = rng.normal(size=(32, 3)) * 10.0
    got = np.asarray(select_knn_ball(jnp.asarray(pts_np), 4, 8, 1e-6,
                                     interpret=True))
    for s in range(4):
        # Only the centroid itself is in radius (d=0): slot for itself plus
        # 7 pads, all equal to s.
        assert (got[0, s] == s).all()


def test_group_points_select_impls_agree(rng):
    # End-to-end through group_points: pallas select + gather vs the XLA
    # composite — neighborhoods equal after sorting the K axis.
    B, N, S, K = 2, 96, 12, 16
    pts = jnp.asarray(
        rng.uniform(-0.5, 0.5, size=(B, N, 4)).astype(np.float32))
    n_x, c_x = group_points(pts, S, K, 0.2, select_impl="xla")
    n_p, c_p = group_points(pts, S, K, 0.2, select_impl="pallas")
    np.testing.assert_allclose(np.asarray(c_x), np.asarray(c_p), atol=0)
    np.testing.assert_allclose(
        np.sort(np.asarray(n_p, np.float64), axis=2),
        np.sort(np.asarray(n_x, np.float64), axis=2), atol=1e-6)


def test_group_points_select_pallas_with_pallas_gather(rng):
    # select=pallas + gather=pallas routes to the fully fused kernel.
    B, N, S, K = 1, 64, 8, 8
    pts = jnp.asarray(
        rng.uniform(-0.5, 0.5, size=(B, N, 4)).astype(np.float32))
    n_x, _ = group_points(pts, S, K, 0.3, select_impl="xla",
                          gather_impl="xla")
    n_p, _ = group_points(pts, S, K, 0.3, select_impl="pallas",
                          gather_impl="pallas")
    np.testing.assert_allclose(
        np.sort(np.asarray(n_p, np.float64), axis=2),
        np.sort(np.asarray(n_x, np.float64), axis=2), atol=1e-6)


def test_fused_select_gather_matches_gather_of_idx(rng):
    # The fused kernel's gathered features must equal table[idx] exactly
    # (same kernel, same index set), including duplicate points and tight
    # radii.
    import jax

    from facl_tpu.ops.pallas.select import (_select_gather,
                                            select_gather_knn_ball)

    B, N, S, K = 2, 96, 12, 16
    base = rng.uniform(-0.5, 0.5, size=(B, N // 2, 4)).astype(np.float32)
    pts_np = np.concatenate([base, base], axis=1)
    pts = jnp.asarray(pts_np)
    grouped, idx = _select_gather(pts, S, K, 0.2, interpret=True)
    grouped = np.asarray(grouped)
    idx = np.asarray(idx)
    for b in range(B):
        exp = pts_np[b][idx[b].reshape(-1)].reshape(S, K, 4)
        np.testing.assert_array_equal(grouped[b], exp)

    # Gradient parity with the XLA path: grad of a set-invariant scalar.
    def loss(p, select_impl, gather_impl):
        n, c = group_points(p, S, K, 0.2, select_impl=select_impl,
                            gather_impl=gather_impl)
        return jnp.sum(n ** 2) + jnp.sum(c ** 2)

    g_x = jax.grad(loss)(pts, "xla", "xla")
    g_p = jax.grad(loss)(pts, "pallas", "pallas")
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-5, atol=1e-5)
