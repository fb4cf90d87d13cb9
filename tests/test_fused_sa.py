"""Fused set-abstraction kernel tests (interpret mode on CPU) against the
pure-JAX reference — forward values, BN stats, and the full custom-VJP
backward vs jax.grad of the reference."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facl_tpu.ops.fused_sa import (
    SALayerParams,
    sa_train_fused,
    sa_train_reference,
)
from facl_tpu.ops.pallas.sa_kernel import (
    sa_train_backward_pallas,
    sa_train_forward_pallas,
)


def make_layers(rng, widths=(8, 16, 32), c0=4):
    layers = []
    cin = c0
    for w in widths:
        layers.append(SALayerParams(
            kernel=jnp.asarray(rng.normal(size=(cin, w)).astype(np.float32)
                               * 0.5),
            bias=jnp.asarray(rng.normal(size=(w,)).astype(np.float32) * 0.1),
            scale=jnp.asarray(1.0 + 0.1 * rng.normal(size=(w,))
                              .astype(np.float32)),
            shift=jnp.asarray(0.1 * rng.normal(size=(w,))
                              .astype(np.float32)),
        ))
        cin = w
    return tuple(layers)


def test_forward_matches_reference(rng):
    R, K = 256, 8
    x = jnp.asarray(rng.normal(size=(R, 4)).astype(np.float32))
    layers = make_layers(rng)
    ref_pool, ref_stats = sa_train_reference(x, layers, K)
    pal_pool, pal_stats, _ = sa_train_forward_pallas(
        x, layers, K, interpret=True)
    np.testing.assert_allclose(np.asarray(pal_pool), np.asarray(ref_pool),
                               rtol=2e-5, atol=2e-5)
    for (rm, rv), (pm, pv) in zip(ref_stats, pal_stats):
        np.testing.assert_allclose(np.asarray(pm), np.asarray(rm),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(pv), np.asarray(rv),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_backward_matches_autodiff(rng):
    R, K = 128, 8
    x = jnp.asarray(rng.normal(size=(R, 4)).astype(np.float32))
    layers = make_layers(rng, widths=(8, 16))
    dout = jnp.asarray(
        rng.normal(size=(R // K, 16)).astype(np.float32))

    def ref_loss(x, layers):
        pooled, _ = sa_train_reference(x, layers, K)
        return jnp.sum(pooled * dout)

    ref_dx, ref_dl = jax.grad(ref_loss, argnums=(0, 1))(x, layers)

    _, stats, packed = sa_train_forward_pallas(x, layers, K, interpret=True)
    dx, grads = sa_train_backward_pallas(
        x, layers, packed, dout, K, interpret=True)

    np.testing.assert_allclose(np.asarray(dx), np.asarray(ref_dx),
                               rtol=5e-4, atol=5e-5)
    for li, (dw, db, dg, dbe) in enumerate(grads):
        np.testing.assert_allclose(np.asarray(dw),
                                   np.asarray(ref_dl[li].kernel),
                                   rtol=5e-4, atol=5e-5, err_msg=f"dW{li}")
        np.testing.assert_allclose(np.asarray(db),
                                   np.asarray(ref_dl[li].bias),
                                   rtol=5e-4, atol=5e-5, err_msg=f"db{li}")
        np.testing.assert_allclose(np.asarray(dg),
                                   np.asarray(ref_dl[li].scale),
                                   rtol=5e-4, atol=5e-5, err_msg=f"dg{li}")
        np.testing.assert_allclose(np.asarray(dbe),
                                   np.asarray(ref_dl[li].shift),
                                   rtol=5e-4, atol=5e-5, err_msg=f"dbe{li}")


def test_custom_vjp_end_to_end(rng):
    R, K = 128, 8
    x = jnp.asarray(rng.normal(size=(R, 4)).astype(np.float32))
    layers = make_layers(rng, widths=(8, 16))

    def fused_loss(x, layers):
        pooled, _ = sa_train_fused(x, layers, K, 1e-5, jnp.float32, True)
        return jnp.sum(pooled ** 2)

    def ref_loss(x, layers):
        pooled, _ = sa_train_reference(x, layers, K)
        return jnp.sum(pooled ** 2)

    vf, gf = jax.value_and_grad(fused_loss, argnums=(0, 1))(x, layers)
    vr, gr = jax.value_and_grad(ref_loss, argnums=(0, 1))(x, layers)
    np.testing.assert_allclose(float(vf), float(vr), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_tie_gradients_match(rng):
    """Centroid-pad duplicates make max ties common; the kernel must split
    gradients evenly like JAX."""
    R, K = 64, 8
    x_np = rng.normal(size=(R, 4)).astype(np.float32)
    # Duplicate rows inside pooling groups -> guaranteed activation ties.
    x_np[1::2] = x_np[::2]
    x = jnp.asarray(x_np)
    layers = make_layers(rng, widths=(8,))

    def fused_loss(x):
        pooled, _ = sa_train_fused(x, layers, K, 1e-5, jnp.float32, True)
        return jnp.sum(pooled * 3.0)

    def ref_loss(x):
        pooled, _ = sa_train_reference(x, layers, K)
        return jnp.sum(pooled * 3.0)

    gf = jax.grad(fused_loss)(x)
    gr = jax.grad(ref_loss)(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_unified_kernels_match_multicall(rng):
    from facl_tpu.ops.pallas.sa_kernel import (
        sa_train_backward_unified, sa_train_forward_unified)
    R, K = 256, 8
    x = jnp.asarray(rng.normal(size=(R, 4)).astype(np.float32))
    layers = make_layers(rng)
    dout = jnp.asarray(rng.normal(size=(R // K, 32)).astype(np.float32))

    pm, sm, pkm = sa_train_forward_pallas(x, layers, K, interpret=True)
    pu, su, pku = sa_train_forward_unified(x, layers, K, interpret=True)
    np.testing.assert_allclose(np.asarray(pu), np.asarray(pm), rtol=1e-5,
                               atol=1e-6)
    for (mm, vm), (mu, vu) in zip(sm, su):
        np.testing.assert_allclose(np.asarray(mu), np.asarray(mm), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(vu), np.asarray(vm),
                                   rtol=1e-4, atol=1e-6)

    dxm, gm = sa_train_backward_pallas(x, layers, pkm, dout, K,
                                       interpret=True)
    dxu, gu = sa_train_backward_unified(x, layers, pku, dout, K,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(dxu), np.asarray(dxm), rtol=1e-4,
                               atol=1e-6)
    for a, b in zip(gu, gm):
        for au, bm in zip(a, b):
            np.testing.assert_allclose(np.asarray(au), np.asarray(bm),
                                       rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_bf16_mode_close_to_f32(rng):
    """bf16 in-kernel elementwise: results track the f32 path within bf16
    tolerance (the kernels' production fast path)."""
    R, K = 256, 8
    x = jnp.asarray(rng.normal(size=(R, 4)).astype(np.float32))
    layers = make_layers(rng)
    p32, s32, _ = sa_train_forward_pallas(x, layers, K, interpret=True)
    p16, s16, pk16 = sa_train_forward_pallas(
        x, layers, K, compute_dtype=jnp.bfloat16, interpret=True)
    np.testing.assert_allclose(np.asarray(p16, np.float32), np.asarray(p32),
                               rtol=0.05, atol=0.05)
    dout = jnp.asarray(rng.normal(size=(R // K, 32)).astype(np.float32))
    dx32, g32 = sa_train_backward_pallas(x, layers, _pack(s32, 32), dout, K,
                                         interpret=True)
    dx16, g16 = sa_train_backward_pallas(x, layers, pk16, dout, K,
                                         compute_dtype=jnp.bfloat16,
                                         interpret=True)
    # bf16 activations flip occasional max-pool ties, redirecting gradient
    # mass between near-duplicate rows — compare statistically, not
    # element-wise. The Dense bias gradient through BN is analytically ~0
    # (BN backward output is mean-free), i.e. pure cancellation noise in
    # both implementations — compare it only in magnitude against dW.
    for li, (g_a, g_b) in enumerate(zip(g16, g32)):
        dw_a, db_a, dg_a, dbe_a = g_a
        dw_b, db_b, dg_b, dbe_b = g_b
        scale = np.linalg.norm(np.asarray(dw_b, np.float64))
        assert np.linalg.norm(np.asarray(db_a, np.float64)) < 0.05 * scale
        for name, a, b in (("dW", dw_a, dw_b), ("dgamma", dg_a, dg_b),
                           ("dbeta", dbe_a, dbe_b)):
            a = np.asarray(a, np.float64).ravel()
            b = np.asarray(b, np.float64).ravel()
            na, nb = np.linalg.norm(a), np.linalg.norm(b)
            if nb < 1e-6:
                continue
            cos = float(a @ b / (na * nb + 1e-12))
            assert cos > 0.97, f"L{li} {name} cosine {cos}"
            assert 0.8 < na / nb < 1.25, f"L{li} {name} norm ratio {na/nb}"


def _pack(stats, cmax):
    import jax.numpy as jnp
    rows = []
    for mean, var in stats:
        inv = 1.0 / np.sqrt(np.asarray(var) + 1e-5)
        pad = cmax - mean.shape[0]
        rows.append(np.stack([np.pad(np.asarray(mean), (0, pad)),
                              np.pad(inv, (0, pad))]))
    return jnp.asarray(np.stack(rows))
