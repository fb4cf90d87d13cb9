"""Loss tests against straight-NumPy oracles that transcribe the reference
formulas loop-by-loop (cn3d_train_apperance_GL.py:265-316,
cn3d_model_conbag.py:391-406, utils_my.py:152-213)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facl_tpu.losses import (
    circle_infonce,
    cld_pair_loss,
    global_local_infonce,
    kmeans,
    pair_infonce,
    sinkhorn,
    swav_loss,
    swav_queue_init,
)


def ce0(logits):
    """CE against label 0, mean over rows."""
    z = logits - logits.max(axis=-1, keepdims=True)
    logzsum = np.log(np.exp(z).sum(axis=-1)) + logits.max(axis=-1)
    return np.mean(logzsum - logits[..., 0])


def oracle_global_local(x_flat, x_global, G, B):
    """Loop transcription of the global_if block (:265-287)."""
    mask = np.tile(1 - np.eye(B), (1, G))
    l_neg = (x_global @ x_flat.T) * mask          # (B, G*B)
    total = 0.0
    for g in range(G):
        pos = np.sum(x_global * x_flat[g * B:(g + 1) * B], axis=1)
        logits = np.concatenate([pos[:, None], l_neg], axis=1)
        total += ce0(logits)
    return total


def oracle_circle(x_flat, perm, G, B):
    """Loop transcription of the circle_if block (:290-316)."""
    mask = np.tile(1 - np.eye(B), (1, G * (G - 1)))
    negs = []
    for i in range(G - 1):
        a = x_flat[perm[i] * B:(perm[i] + 1) * B]
        negs.append(a @ x_flat.T)                 # (B, G*B)
    bank = np.stack(negs, 1).reshape(B, -1) * mask
    total = 0.0
    for i in range(G - 1):
        a = x_flat[perm[i] * B:(perm[i] + 1) * B]
        b = x_flat[perm[i + 1] * B:(perm[i + 1] + 1) * B]
        pos = np.sum(a * b, axis=1)
        logits = np.concatenate([pos[:, None], bank], axis=1)
        total += ce0(logits)
    return total


@pytest.mark.parametrize("G,B,D", [(10, 4, 8), (5, 3, 16)])
def test_global_local_matches_oracle(rng, G, B, D):
    x = rng.normal(size=(G, B, D)).astype(np.float32)
    xg = rng.normal(size=(B, D)).astype(np.float32)
    got = float(global_local_infonce(jnp.asarray(x), jnp.asarray(xg)))
    exp = oracle_global_local(x.reshape(G * B, D), xg, G, B)
    np.testing.assert_allclose(got, exp, rtol=1e-5)


@pytest.mark.parametrize("G,B,D", [(10, 4, 8), (4, 5, 6)])
def test_circle_matches_oracle(rng, G, B, D):
    x = rng.normal(size=(G, B, D)).astype(np.float32)
    key = jax.random.PRNGKey(7)
    perm = np.asarray(jax.random.permutation(key, G))
    got = float(circle_infonce(key, jnp.asarray(x)))
    exp = oracle_circle(x.reshape(G * B, D), perm, G, B)
    np.testing.assert_allclose(got, exp, rtol=1e-5)


def test_pair_infonce_masks_same_video(rng):
    B, D = 4, 8
    x0 = rng.normal(size=(B, D)).astype(np.float32)
    x1 = rng.normal(size=(B, D)).astype(np.float32)
    x_all = np.concatenate([x0, x1], 0)
    logits, labels = pair_infonce(jnp.asarray(x0), jnp.asarray(x1),
                                  jnp.asarray(x_all))
    logits = np.asarray(logits)
    # [pos | x0 @ all (2B) | x1 @ all (2B)] (utils_my.py:205-211).
    assert logits.shape == (B, 1 + 4 * B)
    # Self-similarity slots are zeroed in all four negative sub-blocks.
    for b in range(B):
        for off in (1, 1 + B, 1 + 2 * B, 1 + 3 * B):
            assert logits[b, off + b] == 0.0
    np.testing.assert_allclose(logits[:, 0], np.sum(x0 * x1, 1), rtol=1e-5)


def oracle_sinkhorn(Q, iters):
    Q = Q.copy()
    Q /= Q.sum()
    K, N = Q.shape
    for _ in range(iters):
        u = Q.sum(axis=1)
        Q *= (1.0 / K) / u[:, None]
        Q *= (1.0 / N) / Q.sum(axis=0)[None, :]
    return (Q / Q.sum(axis=0, keepdims=True)).T


def test_sinkhorn_matches_oracle(rng):
    Q = np.exp(rng.normal(size=(8, 12))).astype(np.float32)
    got = np.asarray(sinkhorn(jnp.asarray(Q), 3))
    exp = oracle_sinkhorn(Q.astype(np.float64), 3)
    np.testing.assert_allclose(got, exp, rtol=1e-4)
    # Columns of the transpose (rows of output) are normalized assignments.
    np.testing.assert_allclose(got.sum(axis=1), 1.0, rtol=1e-5)


def test_sinkhorn_ignores_zero_columns(rng):
    Q = np.exp(rng.normal(size=(6, 10))).astype(np.float32)
    Qz = np.concatenate([np.zeros((6, 4), np.float32), Q], axis=1)
    a = np.asarray(sinkhorn(jnp.asarray(Q), 3))
    b = np.asarray(sinkhorn(jnp.asarray(Qz), 3))[4:]
    np.testing.assert_allclose(a, b, rtol=1e-4)


def test_swav_loss_runs_and_queue_shifts(rng):
    G, B, P, D, Q = 5, 4, 16, 8, 8
    code = jnp.asarray(rng.normal(size=(G, B, P)).astype(np.float32))
    x_nor = jnp.asarray(rng.normal(size=(G, B, D)).astype(np.float32))
    W = jnp.asarray(rng.normal(size=(D, P)).astype(np.float32))
    queue = swav_queue_init(G, Q, D)
    loss, new_q = swav_loss(code, x_nor, W, queue, use_queue=jnp.asarray(False))
    assert np.isfinite(float(loss))
    assert new_q.shape == (G - 1, Q, D)
    np.testing.assert_allclose(np.asarray(new_q[:, :B]), np.asarray(x_nor[:G - 1]))
    # No queue at all also works.
    loss2, none_q = swav_loss(code, x_nor, W, None, use_queue=jnp.asarray(False))
    assert none_q is None and np.isfinite(float(loss2))


def test_kmeans_separates_clusters(rng):
    a = rng.normal(size=(20, 4)).astype(np.float32) * 0.05
    b = rng.normal(size=(20, 4)).astype(np.float32) * 0.05 + 10.0
    x = np.concatenate([a, b], 0)
    labels, cents = kmeans(jnp.asarray(x), num_clusters=2, num_iters=10)
    labels = np.asarray(labels)
    assert len(set(labels[:20])) == 1 and len(set(labels[20:])) == 1
    assert labels[0] != labels[20]


def test_cld_pair_loss_finite(rng):
    f1 = rng.normal(size=(30, 8)).astype(np.float32)
    f2 = rng.normal(size=(30, 8)).astype(np.float32)
    f1 /= np.linalg.norm(f1, axis=1, keepdims=True)
    f2 /= np.linalg.norm(f2, axis=1, keepdims=True)
    loss = cld_pair_loss(jnp.asarray(f1), jnp.asarray(f2),
                         num_clusters=5, num_iters=3)
    assert np.isfinite(float(loss))
