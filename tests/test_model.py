"""Encoder forward tests: shapes, the 4-output contract, global-branch
semantics (cn3d_model_conbag.py:213-234), BN train/eval behavior."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from facl_tpu.config import Config, ModelConfig
from facl_tpu.models import PointNetPlus, PointNetSlowFast, LinearProbe
from facl_tpu.ops.grouping import group_points


def small_cfg(**kw):
    base = dict(
        sa_widths=(8, 8, 16), stage2_widths=(16, 32, 64), fc_hidden=32,
        embed_dim=24, num_prototypes=10, num_crops=4,
        slow_widths1=(4, 8, 16), slow_widths3=(16, 32, 32),
        fast_widths1=(8, 16, 32), fast_widths3=(32, 32, 64),
    )
    base.update(kw)
    return ModelConfig(**base)


def make_inputs(rng, G=4, B=2, S=8, K=8, C=4):
    pts = jnp.asarray(rng.normal(size=(G * B, 32, C)).astype(np.float32))
    return group_points(pts, S, K, radius_sq=10.0)


def test_forward_shapes_and_contract(rng):
    cfg = small_cfg()
    G, B = cfg.num_crops, 2
    neigh, cent = make_inputs(rng, G, B)
    model = PointNetPlus(cfg)
    variables = model.init(jax.random.PRNGKey(0), neigh, cent, train=False)
    (x, code, x_nor, x_global), mutated = model.apply(
        variables, neigh, cent, train=True, mutable=["batch_stats"])
    assert x.shape == (G * B, cfg.embed_dim)
    assert code.shape == (G * B, cfg.num_prototypes)
    assert x_nor.shape == (G * B, cfg.embed_dim)
    assert x_global.shape == (B, cfg.embed_dim)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x_nor), axis=1), 1.0, rtol=1e-5)
    assert "batch_stats" in mutated


def test_global_branch_pools_over_crops(rng):
    """The global embedding must change if any single crop changes, and be
    invariant to crop order (max-pool over crops)."""
    cfg = small_cfg()
    G, B = cfg.num_crops, 2
    neigh, cent = make_inputs(rng, G, B)
    model = PointNetPlus(cfg)
    variables = model.init(jax.random.PRNGKey(0), neigh, cent, train=False)

    def run(n, c):
        out, _ = model.apply(variables, n, c, train=True,
                             mutable=["batch_stats"])
        return out

    _, _, _, xg = run(neigh, cent)

    # Permute each video's crops (rows are batch-major: video b's crops
    # are rows b*G..b*G+G-1) — x_global must be unchanged.
    S, K, C = neigh.shape[1:]
    n4 = neigh.reshape(B, G, S, K, C)
    c4 = cent.reshape(B, G, S, 3)
    perm = np.array([2, 0, 3, 1])
    _, _, _, xg_perm = run(n4[:, perm].reshape(G * B, S, K, C),
                           c4[:, perm].reshape(G * B, S, 3))
    # f32 reduction-order noise through BN amplifies to ~2e-4.
    np.testing.assert_allclose(np.asarray(xg), np.asarray(xg_perm), atol=2e-3)


def test_eval_uses_running_stats(rng):
    cfg = small_cfg()
    neigh, cent = make_inputs(rng, cfg.num_crops, 2)
    model = PointNetPlus(cfg)
    variables = model.init(jax.random.PRNGKey(0), neigh, cent, train=False)
    out1 = model.apply(variables, neigh, cent, train=False)
    out2 = model.apply(variables, neigh, cent, train=False)
    np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]))


@pytest.mark.slow
def test_slowfast_forward(rng):
    cfg = small_cfg()
    B = 4
    pts = jnp.asarray(rng.normal(size=(B, 64, 4)).astype(np.float32))
    slow_n, _ = group_points(pts, 8, 16, 10.0)
    fast_n, _ = group_points(pts, 8, 8, 10.0)
    model = PointNetSlowFast(cfg)
    variables = model.init(jax.random.PRNGKey(0), slow_n, fast_n, train=False)
    (xf, xs), _ = model.apply(variables, slow_n, fast_n, train=True,
                              mutable=["batch_stats"])
    assert xf.shape == (B, cfg.embed_dim)
    assert xs.shape == (B, cfg.embed_dim)


def test_linear_probe(rng):
    feats = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
    model = LinearProbe(num_classes=12)
    variables = model.init(jax.random.PRNGKey(0), feats)
    logits = model.apply(variables, feats)
    assert logits.shape == (8, 12)


def test_fine_variant_grouping_geometry(rng):
    """PointNet_Plus_fine = same network, S=32/K=128 grouping
    (cn3d_model_conbag.py:141-234); pooling adapts to the shapes."""
    cfg = small_cfg()
    G, B = cfg.num_crops, 2
    pts = jnp.asarray(rng.normal(size=(G * B, 64, 4)).astype(np.float32))
    # fine geometry scaled down for the test: S=4, K=16
    neigh, cent = group_points(pts, 4, 16, radius_sq=10.0)
    model = PointNetPlus(cfg)
    variables = model.init(jax.random.PRNGKey(0), neigh, cent, train=False)
    (x, code, xn, xg), _ = model.apply(variables, neigh, cent, train=True,
                                       mutable=["batch_stats"])
    assert x.shape == (G * B, cfg.embed_dim)
    assert xg.shape == (B, cfg.embed_dim)


def test_sa_stage_train_eval_consistency(rng):
    """With running stats set to exactly this batch's statistics, the
    eval-mode output must match the train-mode output (same normalization
    path, different code branch)."""
    from facl_tpu.models.sa_stage import SetAbstractionStage
    x = jnp.asarray(rng.normal(size=(4, 8, 16, 4)).astype(np.float32))
    m = SetAbstractionStage(widths=(8, 16))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    out_train, mutated = m.apply(variables, x, train=True,
                                 mutable=["batch_stats"])
    # Build batch_stats equal to this batch's stats: run train once from
    # fresh running stats with momentum applied, then invert the momentum
    # update: stat = (new - m*old) / (1-m).
    old = variables["batch_stats"]
    new = mutated["batch_stats"]
    exact = jax.tree_util.tree_map(
        lambda n, o: (n - 0.9 * o) / 0.1, new, old)
    out_eval = m.apply({"params": variables["params"],
                        "batch_stats": exact}, x, train=False)
    np.testing.assert_allclose(np.asarray(out_eval), np.asarray(out_train),
                               rtol=1e-4, atol=1e-5)


def test_grouping_approx_method(rng):
    """The approx neighbor search path (lax.approx_min_k) produces valid
    neighborhoods with the same ball-query semantics."""
    pts = jnp.asarray(rng.normal(size=(2, 64, 4)).astype(np.float32))
    n_ex, c_ex = group_points(pts, 8, 8, radius_sq=10.0, method="exact")
    n_ap, c_ap = group_points(pts, 8, 8, radius_sq=10.0, method="approx")
    assert n_ap.shape == n_ex.shape
    np.testing.assert_allclose(np.asarray(c_ap), np.asarray(c_ex))
    # High-recall approx on small N: neighbor sets should mostly agree.
    a = np.sort(np.asarray(n_ap), axis=2)
    b = np.sort(np.asarray(n_ex), axis=2)
    agree = np.mean(np.all(np.isclose(a, b, atol=1e-5), axis=-1))
    assert agree > 0.8


@pytest.mark.slow
def test_slowfast_trainer_step(rng):
    from facl_tpu.config import (Config, GroupingConfig, TrainConfig,
                                 OptimConfig)
    from facl_tpu.train.slowfast_trainer import SlowFastTrainer
    cfg = Config(
        grouping=GroupingConfig(num_centroids=8, knn_k=8, radius_sq=10.0),
        model=small_cfg(),
        train=TrainConfig(batch_size=4, optim=OptimConfig(learning_rate=1e-3)),
    )
    B, N = 4, 32
    pts = jnp.asarray(rng.normal(size=(B, N, 4)).astype(np.float32))
    tr = SlowFastTrainer(cfg, steps_per_epoch=10, slow_k=16, fast_k=8)
    state = tr.init_state(jax.random.PRNGKey(0), pts)
    losses = []
    for i in range(6):
        state, m = tr.step_fn(state, pts, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert int(state.step) == 6
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]   # the two pathways align on fixed data
