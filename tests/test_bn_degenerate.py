"""Degenerate-input BatchNorm robustness (round-4 verify-drive regression).

All-zero videos (a synthetic tree can produce them when a clip's motion
never survives the boundary mask) make entire SA channels CONSTANT; the
E[x^2] - E[x]^2 variance identity then rounds negative, and once the
round-off exceeds eps=1e-5, rsqrt(var + eps) is NaN — which poisoned
params from the first step containing such a video. Every stat site now
clamps the finalized variance at 0 (the direct E[(x-mean)^2] form —
torch's — is non-negative by construction).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facl_tpu.config import Config, GroupingConfig
from facl_tpu.train import Trainer


def test_finalize_clamps_negative_roundoff():
    from facl_tpu.ops.pallas.sa_fwd import _finalize

    n = 1000.0
    c = 37.5
    # Craft sums whose identity lands BELOW -eps: var = -1e-4.
    s = jnp.asarray([[c * n]], jnp.float32)
    ss = jnp.asarray([[(c * c - 1e-4) * n]], jnp.float32)
    mean, var = _finalize(s, ss, n)
    assert float(var[0]) == 0.0
    assert np.isfinite(float(jax.lax.rsqrt(var + 1e-5)[0]))


def test_covar_moments_clamps():
    from facl_tpu.models.sa_stage import covar_moments

    # Constant rows -> var mathematically 0; round-off must not go
    # negative through the Gram identity either.
    h = jnp.full((512, 8), 7.25, jnp.float32)
    k = jnp.full((8, 4), 0.37, jnp.float32)
    b = jnp.asarray([0.1, -0.2, 0.3, -0.4], jnp.float32)
    mean, var = covar_moments(h, k, b)
    assert np.all(np.asarray(var) >= 0.0)


@pytest.mark.parametrize("sa_impl", ["reference", "pair3", "hybrid2"])
def test_train_step_finite_on_all_zero_videos(sa_impl):
    """One production train step on a batch of ALL-ZERO clips stays
    finite for the reference path and both Pallas flagship paths."""
    cfg = Config()
    cfg = cfg.replace(
        grouping=GroupingConfig(num_centroids=8, knn_k=8, radius_sq=0.06),
        model=dataclasses.replace(cfg.model, num_crops=2,
                                  sa_widths=(8, 8, 16),
                                  stage2_widths=(16, 32), fc_hidden=24,
                                  embed_dim=12, num_prototypes=6,
                                  sa_impl=sa_impl),
    )
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, batch_size=2))
    trainer = Trainer(cfg, steps_per_epoch=2)
    G, B, N, C = 2, 2, 64, 4
    batch = jnp.zeros((G, B, N, C), jnp.float32)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    for i in range(3):
        state, m = trainer.step_fn(state, batch, jax.random.fold_in(
            jax.random.PRNGKey(1), i), jnp.asarray(0, jnp.int32))
        assert np.isfinite(float(m["loss"])), (sa_impl, i)
    assert all(bool(jnp.isfinite(x).all())
               for x in jax.tree_util.tree_leaves(state.params))
