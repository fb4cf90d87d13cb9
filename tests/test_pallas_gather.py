"""Pallas gather/scatter kernel tests (interpret mode on CPU; the same
code path compiles with Mosaic on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from facl_tpu.ops.pallas.gather import (
    gather_rows,
    gather_rows_vjp,
    scatter_add_rows,
)


def test_gather_rows_matches_indexing(rng):
    B, N, C, R = 4, 128, 4, 256
    table = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, size=(B, R)).astype(np.int32))
    out = gather_rows(table, idx, interpret=True)
    exp = jax.vmap(lambda t, i: t[i])(table, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(exp))


def test_scatter_add_rows_matches_at_add(rng):
    B, N, C, R = 3, 64, 4, 128
    idx = jnp.asarray(rng.integers(0, N, size=(B, R)).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(B, R, C)).astype(np.float32))
    out = scatter_add_rows(idx, g, N, interpret=True)
    exp = jax.vmap(lambda i, gg: jnp.zeros((N, C)).at[i].add(gg))(idx, g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp), atol=1e-5)


def test_gather_vjp_matches_autodiff(rng):
    B, N, C, R = 2, 64, 4, 128
    table = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, size=(B, R)).astype(np.int32))

    def loss_pallas(t):
        return jnp.sum(gather_rows_vjp(t, idx, True) ** 2)

    def loss_ref(t):
        return jnp.sum(jax.vmap(lambda tt, i: tt[i])(t, idx) ** 2)

    gp = jax.grad(loss_pallas)(table)
    gr = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), atol=1e-4)
