"""Explicit collective helpers under shard_map on the CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from facl_tpu.config import MeshConfig
from facl_tpu.parallel import (cross_replica_mean, gather_negatives,
                               make_mesh, psum_grads)


def test_gather_negatives_shard_map(rng):
    mesh = make_mesh(MeshConfig(dp=8, mp=1))
    B, D = 16, 4
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

    def f(xs):
        return gather_negatives(xs, "dp")

    out = jax.shard_map(f, mesh=mesh, in_specs=P("dp"),
                        out_specs=P("dp"))(x)
    # Each shard gathered the global batch then re-inserted its local
    # block; the stacked result's per-shard rows must equal x globally.
    out = np.asarray(out)
    assert out.shape == (8 * B, D)
    for s in range(8):
        np.testing.assert_allclose(out[s * B:(s + 1) * B][s * 2:(s + 1) * 2],
                                   np.asarray(x)[s * 2:(s + 1) * 2])


def test_gather_negatives_gradient_local_only(rng):
    mesh = make_mesh(MeshConfig(dp=8, mp=1))
    B, D = 8, 4
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

    def loss(xs):
        g = gather_negatives(xs, "dp")
        # psum makes the scalar provably replicated for out_specs=P().
        return jax.lax.psum(jnp.sum(g ** 2), "dp")

    grad = jax.grad(
        lambda x: jax.shard_map(loss, mesh=mesh, in_specs=P("dp"),
                                out_specs=P())(x)
    )(x)
    # Each shard's gathered pool contains x's local block differentiably
    # and every other copy behind stop_gradient, so d(total)/dx = 2x.
    np.testing.assert_allclose(np.asarray(grad), 2 * np.asarray(x),
                               rtol=1e-5)


def test_psum_and_mean(rng):
    mesh = make_mesh(MeshConfig(dp=8, mp=1))
    x = jnp.arange(8.0)

    def f(xs):
        return psum_grads(xs, "dp"), cross_replica_mean(xs, "dp")

    m1, m2 = jax.shard_map(f, mesh=mesh, in_specs=P("dp"),
                           out_specs=(P("dp"), P("dp")))(x)
    np.testing.assert_allclose(np.asarray(m1), np.full(8, 3.5))
    np.testing.assert_allclose(np.asarray(m2), np.full(8, 3.5))
