"""2-sweep Pallas analytic backward (ops/pallas/sa_bwd.py) vs the
pure-JAX analytic path and autodiff — interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facl_tpu.ops.analytic_sa import sa_train_analytic
from facl_tpu.ops.pallas.sa_bwd import sa_train_hybrid
from tests.test_analytic_sa import make_layers, reference_forward


@pytest.mark.parametrize("dtype,rtol,atol", [
    (jnp.float32, 2e-3, 2e-3),
])
def test_hybrid_matches_analytic_and_autodiff(rng, dtype, rtol, atol):
    B, S, K, C = 2, 4, 8, 4
    widths = (8, 8, 16)
    x = jnp.asarray(rng.normal(size=(B, S, K, C)).astype(np.float32))
    layers = make_layers(rng, widths, C)
    eps = 1e-5
    wvec = jnp.asarray(rng.normal(size=(widths[-1],)).astype(np.float32))

    pooled_h, stats_h = sa_train_hybrid(x, layers, eps, dtype, True)
    pooled_r, stats_r = reference_forward(x, layers, eps, dtype)
    np.testing.assert_array_equal(np.asarray(pooled_h, np.float32),
                                  np.asarray(pooled_r, np.float32))
    for (mh, vh), (mr, vr) in zip(stats_h, stats_r):
        np.testing.assert_array_equal(np.asarray(mh), np.asarray(mr))
        np.testing.assert_array_equal(np.asarray(vh), np.asarray(vr))

    def loss(fn, extra=()):
        def f(layers):
            pooled, _ = fn(x, layers, eps, dtype, *extra)
            return jnp.sum(jnp.sin(pooled.astype(jnp.float32)) * wvec)
        return f

    gl_h = jax.grad(loss(sa_train_hybrid, (True,)))(layers)
    gl_a = jax.grad(loss(sa_train_analytic))(layers)
    gl_r = jax.grad(loss(reference_forward))(layers)

    for lh, la, lr in zip(gl_h, gl_a, gl_r):
        for name in ("kernel", "scale", "shift"):
            h = np.asarray(getattr(lh, name), np.float32)
            a = np.asarray(getattr(la, name), np.float32)
            r = np.asarray(getattr(lr, name), np.float32)
            # vs the JAX analytic path (same algebra): tight.
            np.testing.assert_allclose(h, a, rtol=1e-4, atol=1e-4,
                                       err_msg=f"{name} vs analytic")
            sc = max(1.0, float(np.abs(r).max()))
            np.testing.assert_allclose(h, r, rtol=rtol, atol=atol * sc,
                                       err_msg=f"{name} vs autodiff")


def test_hybrid_bf16_statistical_parity(rng):
    """bf16 pool ties are compilation-dependent (see the matching test
    in test_analytic_sa) — assert statistical agreement with the JAX
    analytic path at a row count where the tie noise averages out."""
    B, S, K, C = 8, 8, 16, 4
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

    gl_h = jax.grad(loss(sa_train_hybrid, (True,)))(layers)
    gl_a = jax.grad(loss(sa_train_analytic))(layers)
    for lh, la in zip(gl_h, gl_a):
        for name in ("kernel", "scale", "shift"):
            h = np.asarray(getattr(lh, name), np.float32)
            a = np.asarray(getattr(la, name), np.float32)
            relf = np.linalg.norm(h - a) / max(np.linalg.norm(a), 1e-9)
            cos = float((h * a).sum() /
                        (np.linalg.norm(h) * np.linalg.norm(a) + 1e-12))
            assert relf < 0.05 and cos > 0.998, (name, relf, cos)


def test_hybrid_pool_ties(rng):
    B, S, K, C = 1, 2, 4, 4
    half = rng.normal(size=(B, S, K // 2, C)).astype(np.float32)
    x = jnp.asarray(np.concatenate([half, half], axis=2))
    layers = make_layers(rng, (6, 6, 8), C)

    def loss(fn, extra=()):
        def f(layers):
            pooled, _ = fn(x, layers, 1e-5, jnp.float32, *extra)
            return jnp.sum(pooled ** 2)
        return f

    gl_h = jax.grad(loss(sa_train_hybrid, (True,)))(layers)
    gl_a = jax.grad(loss(sa_train_analytic))(layers)
    for lh, la in zip(gl_h, gl_a):
        for name in ("kernel", "scale", "shift"):
            np.testing.assert_allclose(
                np.asarray(getattr(lh, name)),
                np.asarray(getattr(la, name)), rtol=1e-4, atol=1e-4)


def test_stage_hybrid_runs_and_matches(rng):
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
    l_h, bs_h, g_h = run("hybrid")
    np.testing.assert_array_equal(np.asarray(l_h), np.asarray(l_r))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), bs_h, bs_r)
    for k in g_r:
        if k.startswith("bias"):
            continue
        np.testing.assert_allclose(
            np.asarray(g_h[k]), np.asarray(g_r[k]), rtol=2e-3, atol=2e-3,
            err_msg=k)


def test_stage_hybrid_rejects_input_grad(rng):
    from facl_tpu.models.sa_stage import SetAbstractionStage

    x = jnp.asarray(rng.normal(size=(2, 2, 4, 4)).astype(np.float32))
    stage = SetAbstractionStage((4, 4, 8), impl="hybrid", input_grad=True)
    with pytest.raises(ValueError, match="input cotangent"):
        stage.init(jax.random.PRNGKey(0), x, train=True)
