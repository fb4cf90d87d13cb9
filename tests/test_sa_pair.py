"""Paired-row SA stage (ops/pallas/sa_pair.py, sa_impl="pair"):
full-lane-width Pallas forward + backward — interpret mode on CPU.

Per-element forward values are EXACTLY hybrid2's op sequence (the
block-diagonal zeros contribute exact zeros), but the BatchNorm moments
fold left/right halves instead of summing tiles in row order, so parity
vs the reference is asserted at the same allclose bar as hybrid2."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facl_tpu.ops.pallas.sa_pair import sa_train_pair
from tests.test_analytic_sa import make_layers, reference_forward


@pytest.mark.parametrize("slim", [False, True])
def test_pair_forward_matches_reference(rng, slim):
    B, S, K, C = 2, 4, 8, 4
    widths = (8, 8, 16)
    x = jnp.asarray(rng.normal(size=(B, S, K, C)).astype(np.float32))
    layers = make_layers(rng, widths, C)
    eps = 1e-5

    pooled_p, stats_p = sa_train_pair(x, layers, eps, jnp.float32, True,
                                      slim)
    pooled_r, stats_r = reference_forward(x, layers, eps, jnp.float32)
    assert pooled_p.shape == pooled_r.shape
    np.testing.assert_allclose(np.asarray(pooled_p), np.asarray(pooled_r),
                               rtol=1e-4, atol=1e-5)
    for i, ((mp, vp), (mr, vr)) in enumerate(zip(stats_p, stats_r)):
        np.testing.assert_allclose(np.asarray(mp), np.asarray(mr),
                                   rtol=1e-4, atol=1e-5, err_msg=f"mean{i}")
        np.testing.assert_allclose(np.asarray(vp), np.asarray(vr),
                                   rtol=5e-4, atol=1e-5, err_msg=f"var{i}")


@pytest.mark.parametrize("slim", [False, True])
def test_pair_grad_matches_autodiff(rng, slim):
    B, S, K, C = 2, 4, 8, 4
    widths = (8, 8, 16)
    x = jnp.asarray(rng.normal(size=(B, S, K, C)).astype(np.float32))
    layers = make_layers(rng, widths, C)
    eps = 1e-5
    wvec = jnp.asarray(rng.normal(size=(widths[-1],)).astype(np.float32))

    def loss(fn, extra=()):
        def f(layers):
            pooled, _ = fn(x, layers, eps, jnp.float32, *extra)
            return jnp.sum(jnp.sin(pooled.astype(jnp.float32)) * wvec)
        return f

    gl_p = jax.grad(loss(sa_train_pair, (True, slim)))(layers)
    gl_r = jax.grad(loss(reference_forward))(layers)
    for lp, lr in zip(gl_p, gl_r):
        for name in ("kernel", "scale", "shift"):
            p = np.asarray(getattr(lp, name), np.float32)
            r = np.asarray(getattr(lr, name), np.float32)
            sc = max(1.0, float(np.abs(r).max()))
            np.testing.assert_allclose(p, r, rtol=2e-3, atol=2e-3 * sc,
                                       err_msg=name)


@pytest.mark.parametrize("slim", [False, True])
def test_pair_negative_scale_hits_min_branch(rng, slim):
    """The merged Gram+pool sweep (round 4) emits raw-p3 max AND min per
    pool group and XLA selects by sign(mul3): a NEGATIVE layer-3 BN
    scale flips the monotone chain so the pooled max comes from the
    p3 MIN row. Default-init tests never exercise that branch (scale=1);
    this one forces several negative scale_3 channels and holds forward
    AND gradients to the reference."""
    B, S, K, C = 2, 4, 8, 4
    widths = (8, 8, 16)
    x = jnp.asarray(rng.normal(size=(B, S, K, C)).astype(np.float32))
    layers = list(make_layers(rng, widths, C))
    lp3 = layers[-1]
    sc = np.asarray(lp3.scale).copy()
    sc[::2] *= -1.0              # half the channels take the min branch
    layers[-1] = lp3._replace(scale=jnp.asarray(sc))
    layers = tuple(layers)
    eps = 1e-5

    pooled_p, stats_p = sa_train_pair(x, layers, eps, jnp.float32, True,
                                      slim)
    pooled_r, stats_r = reference_forward(x, layers, eps, jnp.float32)
    np.testing.assert_allclose(np.asarray(pooled_p), np.asarray(pooled_r),
                               rtol=1e-4, atol=1e-5)

    wvec = jnp.asarray(rng.normal(size=(widths[-1],)).astype(np.float32))

    def loss(fn, extra=()):
        def f(layers):
            pooled, _ = fn(x, layers, eps, jnp.float32, *extra)
            return jnp.sum(jnp.sin(pooled.astype(jnp.float32)) * wvec)
        return f

    gl_p = jax.grad(loss(sa_train_pair, (True, slim)))(layers)
    gl_r = jax.grad(loss(reference_forward))(layers)
    for lp, lr in zip(gl_p, gl_r):
        for name in ("kernel", "scale", "shift"):
            p = np.asarray(getattr(lp, name), np.float32)
            r = np.asarray(getattr(lr, name), np.float32)
            sc_ = max(1.0, float(np.abs(r).max()))
            np.testing.assert_allclose(p, r, rtol=2e-3, atol=2e-3 * sc_,
                                       err_msg=name)


@pytest.mark.slow
def test_pair_bf16_statistical_parity(rng):
    """Same statistical bar as hybrid2 (tests/test_sa_pfwd.py): bf16
    pool ties regroup under the different moment reduction order."""
    from facl_tpu.ops.analytic_sa import sa_train_analytic

    B, S, K, C = 32, 8, 16, 4
    widths = (8, 8, 16)
    x = jnp.asarray(rng.normal(size=(B, S, K, C)).astype(np.float32))
    layers = make_layers(rng, widths, C)
    eps, dtype = 1e-5, jnp.bfloat16
    wvec = jnp.asarray(rng.normal(size=(widths[-1],)).astype(np.float32))

    def loss(fn, extra=()):
        def f(layers):
            pooled, _ = fn(x, layers, eps, dtype, *extra)
            return jnp.sum(jnp.sin(pooled.astype(jnp.float32)) * wvec)
        return f

    gl_p = jax.grad(loss(sa_train_pair, (True,)))(layers)
    gl_a = jax.grad(loss(sa_train_analytic))(layers)
    for lp, la in zip(gl_p, gl_a):
        for name in ("kernel", "scale", "shift"):
            p = np.asarray(getattr(lp, name), np.float32)
            a = np.asarray(getattr(la, name), np.float32)
            relf = np.linalg.norm(p - a) / max(np.linalg.norm(a), 1e-9)
            cos = float((p * a).sum() /
                        (np.linalg.norm(p) * np.linalg.norm(a) + 1e-12))
            assert relf < 0.15 and cos > 0.99, (name, relf, cos)


@pytest.mark.parametrize("slim", [False, True])
def test_pair_cf_matches_reference(rng, slim):
    """Channels-first entry: same values and grads as the reference,
    fed the (B, C, S, K) layout the fused select+gather kernel emits."""
    from facl_tpu.ops.pallas.sa_pair import sa_train_pair_cf

    B, S, K, C = 4, 6, 8, 4
    widths = (8, 8, 16)
    x = jnp.asarray(rng.normal(size=(B, S, K, C)).astype(np.float32))
    x_cf = jnp.transpose(x, (0, 3, 1, 2))
    layers = make_layers(rng, widths, C)
    eps = 1e-5
    wvec = jnp.asarray(rng.normal(size=(widths[-1],)).astype(np.float32))

    pooled_p, stats_p = sa_train_pair_cf(x_cf, layers, eps, jnp.float32,
                                         True, slim)
    pooled_r, stats_r = reference_forward(x, layers, eps, jnp.float32)
    np.testing.assert_allclose(np.asarray(pooled_p), np.asarray(pooled_r),
                               rtol=1e-4, atol=1e-5)
    for (mp, vp), (mr, vr) in zip(stats_p, stats_r):
        np.testing.assert_allclose(np.asarray(mp), np.asarray(mr),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(vp), np.asarray(vr),
                                   rtol=5e-4, atol=1e-5)

    def loss(fn, xx, extra=()):
        def f(layers):
            pooled, _ = fn(xx, layers, eps, jnp.float32, *extra)
            return jnp.sum(jnp.sin(pooled.astype(jnp.float32)) * wvec)
        return f

    gl_p = jax.grad(loss(sa_train_pair_cf, x_cf, (True, slim)))(layers)
    gl_r = jax.grad(loss(reference_forward, x))(layers)
    for lp, lr in zip(gl_p, gl_r):
        for name in ("kernel", "scale", "shift"):
            p = np.asarray(getattr(lp, name), np.float32)
            r = np.asarray(getattr(lr, name), np.float32)
            sc = max(1.0, float(np.abs(r).max()))
            np.testing.assert_allclose(p, r, rtol=2e-3, atol=2e-3 * sc,
                                       err_msg=name)


def test_stage_channels_first_all_paths(rng):
    """The stage accepts (B, C, S, K): the pair train path consumes it
    natively; reference train and eval mode transpose back. All agree
    with the channels-last reference stage."""
    from facl_tpu.models.sa_stage import SetAbstractionStage

    x = jnp.asarray(rng.normal(size=(4, 6, 8, 4)).astype(np.float32))
    x_cf = jnp.transpose(x, (0, 3, 1, 2))

    def run(impl, cf, train):
        stage = SetAbstractionStage((8, 8, 16), impl=impl,
                                    channels_first=cf)
        xx = x_cf if cf else x
        variables = stage.init(jax.random.PRNGKey(0), xx, train=False)

        def loss(v):
            out, mut = stage.apply(v, xx, train=train,
                                   mutable=["batch_stats"])
            return jnp.sum(out ** 2), mut["batch_stats"]

        (l, bs), g = jax.value_and_grad(loss, has_aux=True)(variables)
        return l, bs, g["params"]

    for train in (True, False):
        l_r, bs_r, _ = run("reference", False, train)
        for impl in ("pair", "pair3", "reference"):
            l_p, bs_p, _ = run(impl, True, train)
            np.testing.assert_allclose(np.asarray(l_p), np.asarray(l_r),
                                       rtol=1e-4, atol=1e-4,
                                       err_msg=f"{impl} train={train}")
            jax.tree.map(lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5),
                bs_p, bs_r)


@pytest.mark.parametrize("pair_impl", ["pair", "pair3"])
def test_stage_pair_runs_and_matches(rng, pair_impl):
    from facl_tpu.models.sa_stage import SetAbstractionStage

    x = jnp.asarray(rng.normal(size=(4, 6, 8, 4)).astype(np.float32))

    def run(impl):
        stage = SetAbstractionStage((8, 8, 16), impl=impl)
        variables = stage.init(jax.random.PRNGKey(0), x, train=True)

        def loss(v):
            out, mut = stage.apply(v, x, train=True,
                                   mutable=["batch_stats"])
            return jnp.sum(out ** 2), mut["batch_stats"]

        (l, bs), g = jax.value_and_grad(loss, has_aux=True)(variables)
        return l, bs, g["params"]

    l_r, bs_r, g_r = run("reference")
    l_p, bs_p, g_p = run(pair_impl)
    np.testing.assert_allclose(np.asarray(l_p), np.asarray(l_r),
                               rtol=1e-4, atol=1e-4)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5), bs_p, bs_r)
    for k in g_r:
        if k.startswith("bias"):
            continue
        np.testing.assert_allclose(
            np.asarray(g_p[k]), np.asarray(g_r[k]), rtol=2e-3, atol=2e-3,
            err_msg=k)


def test_stage_pair_rejects_input_grad(rng):
    from facl_tpu.models.sa_stage import SetAbstractionStage

    x = jnp.asarray(rng.normal(size=(2, 2, 4, 4)).astype(np.float32))
    stage = SetAbstractionStage((4, 4, 8), impl="pair", input_grad=True)
    with pytest.raises(ValueError, match="input cotangent"):
        stage.init(jax.random.PRNGKey(0), x, train=True)


@pytest.mark.slow
def test_train_step_channels_first_pair_parity(rng):
    """The flagship combination (sa_impl=pair + channel-major
    neighborhoods) runs the full fused train step and matches the
    channels-last reference step's loss."""
    import dataclasses

    from facl_tpu.config import (Config, GroupingConfig, LossConfig,
                                 ModelConfig, OptimConfig, TrainConfig)
    from facl_tpu.train import Trainer

    base = Config(
        grouping=GroupingConfig(num_centroids=8, knn_k=8, radius_sq=10.0),
        model=ModelConfig(sa_widths=(8, 8, 16), stage2_widths=(16, 32),
                          fc_hidden=32, embed_dim=16, num_prototypes=8,
                          num_crops=4),
        loss=LossConfig(),
        train=TrainConfig(batch_size=2,
                          optim=OptimConfig(learning_rate=1e-3)),
    )
    cfg_cf = base.replace(model=dataclasses.replace(
        base.model, sa_impl="pair", channels_first=True))

    batch = jnp.asarray(rng.normal(size=(4, 2, 32, 4)).astype(np.float32))
    key, epoch = jax.random.PRNGKey(1), jnp.asarray(0)

    losses = {}
    for name, cfg in (("ref", base), ("pair_cf", cfg_cf)):
        tr = Trainer(cfg, steps_per_epoch=4)
        state = tr.init_state(jax.random.PRNGKey(0), batch)
        state, m = tr.step_fn(state, batch, key, epoch)
        losses[name] = float(m["loss"])
        assert int(state.step) == 1
    np.testing.assert_allclose(losses["pair_cf"], losses["ref"],
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("cf", [False, True])
@pytest.mark.parametrize("slim", [False, True])
@pytest.mark.slow
def test_sharded_pair_matches_unsharded(rng, cf, slim):
    """make_sharded_pair on the 8-device CPU mesh: per-shard Pallas
    sweeps + psum'd global BN statistics must reproduce the unsharded
    pair values, stats, and parameter gradients."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from facl_tpu.ops.pallas.sa_pair import (make_sharded_pair,
                                             sa_train_pair,
                                             sa_train_pair_cf)

    B, S, K, C = 16, 4, 8, 4          # per-shard 2 batch rows (even)
    widths = (8, 8, 16)
    x = jnp.asarray(rng.normal(size=(B, S, K, C)).astype(np.float32))
    xx = jnp.transpose(x, (0, 3, 1, 2)) if cf else x
    layers = make_layers(rng, widths, C)
    eps = 1e-5
    wvec = jnp.asarray(rng.normal(size=(widths[-1],)).astype(np.float32))
    mesh = Mesh(np.array(jax.devices()).reshape(8,), ("dp",))

    f_sh = make_sharded_pair(mesh, "dp", eps, jnp.float32, slim, cf,
                             interpret=True)
    f_ref = sa_train_pair_cf if cf else sa_train_pair

    def loss_sh(layers, xv):
        pooled, stats = f_sh(xv, layers)
        return (jnp.sum(jnp.sin(pooled.astype(jnp.float32)) * wvec),
                stats)

    def loss_ref(layers, xv):
        pooled, stats = f_ref(xv, layers, eps, jnp.float32, True, slim)
        return (jnp.sum(jnp.sin(pooled.astype(jnp.float32)) * wvec),
                stats)

    xs = jax.device_put(xx, NamedSharding(mesh, P("dp")))
    (l_s, st_s), g_s = jax.jit(
        jax.value_and_grad(loss_sh, has_aux=True))(layers, xs)
    (l_r, st_r), g_r = jax.jit(
        jax.value_and_grad(loss_ref, has_aux=True))(layers, xx)

    np.testing.assert_allclose(float(l_s), float(l_r), rtol=1e-5)
    for (ms, vs), (mr, vr) in zip(st_s, st_r):
        np.testing.assert_allclose(np.asarray(ms), np.asarray(mr),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(vs), np.asarray(vr),
                                   rtol=1e-4, atol=1e-6)
    for ls, lr in zip(g_s, g_r):
        for name in ("kernel", "bias", "scale", "shift"):
            np.testing.assert_allclose(
                np.asarray(getattr(ls, name), np.float32),
                np.asarray(getattr(lr, name), np.float32),
                rtol=5e-4, atol=5e-5, err_msg=f"slim={slim} {name}")


def test_pair_rejects_odd_pooled_rows(rng):
    x = jnp.asarray(rng.normal(size=(1, 3, 8, 4)).astype(np.float32))
    layers = make_layers(rng, (8, 8, 16), 4)
    with pytest.raises(AssertionError, match="even pooled-row"):
        sa_train_pair(x, layers, 1e-5, jnp.float32, True)
