"""Gram-matrix (covariance-form) BatchNorm statistics vs the direct
convert+reduce form — values and gradients (models/sa_stage.py).

The two are the same mathematical moments of p = xW + b; "covar" computes
them from the input Gram matrix so the big pre-activation tensor is never
reduced (the round-1 profiler's 12.4 ms/step wall).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facl_tpu.models.sa_stage import SetAbstractionStage, covar_moments


def _data(rng, R=64, S=8, K=8, C=4, dtype=np.float32):
    x = rng.normal(size=(R, S, K, C)).astype(np.float32)
    # Nonzero mean so mean/var cancellation paths are exercised.
    x[..., 1] += 1.5
    return jnp.asarray(x)


def test_covar_moments_match_direct(rng):
    h = _data(rng).reshape(-1, 4)
    w = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    p = (h @ w + b).astype(jnp.float32)
    mean_d = jnp.mean(p, axis=0)
    var_d = jnp.mean(jnp.square(p), axis=0) - jnp.square(mean_d)
    mean_c, var_c = covar_moments(h, w, b,
                                  precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(mean_c), np.asarray(mean_d),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_c), np.asarray(var_d),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dtype,rtol", [("float32", 2e-5),
                                        ("bfloat16", 5e-2)])
def test_stage_covar_matches_reference(rng, dtype, rtol):
    x = _data(rng)
    widths = (8, 16)

    def run(impl):
        stage = SetAbstractionStage(widths, dtype=jnp.dtype(dtype),
                                    impl=impl)
        variables = stage.init(jax.random.PRNGKey(0), x, train=False)
        (out, mutated) = stage.apply(variables, x, train=True,
                                     mutable=["batch_stats"])
        return out, mutated["batch_stats"]

    out_ref, bs_ref = run("reference")
    out_cov, bs_cov = run("covar")
    np.testing.assert_allclose(np.asarray(out_cov, np.float32),
                               np.asarray(out_ref, np.float32),
                               rtol=rtol, atol=rtol)
    for k in bs_ref:
        np.testing.assert_allclose(np.asarray(bs_cov[k], np.float32),
                                   np.asarray(bs_ref[k], np.float32),
                                   rtol=rtol, atol=rtol,
                                   err_msg=f"batch_stats[{k}]")


def test_stage_covar_gradients_match(rng):
    """Gradients flow through the Gram-matrix stats exactly like through
    the direct reduce (same mathematical function of x, W, b)."""
    x = _data(rng)
    widths = (8, 16)

    def loss(variables, impl):
        stage = SetAbstractionStage(widths, dtype=jnp.float32, impl=impl)
        out, _ = stage.apply(variables, x, train=True,
                             mutable=["batch_stats"])
        return jnp.sum(out * out)

    stage = SetAbstractionStage(widths, dtype=jnp.float32, impl="reference")
    variables = stage.init(jax.random.PRNGKey(0), x, train=False)

    g_ref = jax.grad(loss)(variables, "reference")
    g_cov = jax.grad(loss)(variables, "covar")
    # atol: the BIAS gradient is mathematically ~0 (BN cancels the bias),
    # so both paths return pure f32 cancellation noise there — compare
    # with an absolute floor sized to that noise.
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref["params"]),
            jax.tree_util.tree_leaves_with_path(g_cov["params"])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-3,
                                   err_msg=str(pa))
