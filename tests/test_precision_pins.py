"""HLO-level tripwire: the tiny f32 finalize/moment dots stay HIGHEST.

On TPU, XLA's DEFAULT matmul precision executes f32 dot_general through
bf16 MXU passes (~3e-3 relative error). The BN-moment finalize and the
closed-form gradient-term contractions are <=256-wide but their Gram
entries are O(n_rows) ~ 1e6, so bf16 rounding there IS the moment
signal: device-measured round 4, pair3-vs-reference f32 forward parity
was 6.6e-3 relmax until these dots were pinned HIGHEST, 3.7e-6 after
(docs/DESIGN.md section 3).

Every CPU golden test is blind to this (CPU f32 dots are exact), so
this test asserts the pins at the *lowering* level instead: the
stablehlo text of each function must carry HIGHEST on its dots. That
makes removing a pin a visible CI failure rather than a silent
device-only accuracy hole.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from facl_tpu.models.sa_stage import covar_moments
from facl_tpu.ops.fused_sa import SALayerParams


def _count_highest_dots(text: str) -> int:
    return text.count("precision = [HIGHEST, HIGHEST]")


def _layers(key, widths=(4, 8, 8)):
    ks = jax.random.split(key, len(widths) * 4)
    layers = []
    cin = widths[0]
    for i, w in enumerate(widths[1:]):
        k0, k1, k2, k3 = ks[4 * i: 4 * i + 4]
        layers.append(SALayerParams(
            kernel=jax.random.normal(k0, (cin, w), jnp.float32),
            bias=jax.random.normal(k1, (w,), jnp.float32),
            scale=1.0 + 0.1 * jax.random.normal(k2, (w,), jnp.float32),
            shift=0.1 * jax.random.normal(k3, (w,), jnp.float32),
        ))
        cin = w
    return layers


def test_covar_moments_pins_highest():
    h = jnp.zeros((64, 4), jnp.float32)
    w = jnp.zeros((4, 8), jnp.float32)
    b = jnp.zeros((8,), jnp.float32)
    text = jax.jit(covar_moments).lower(h, w, b).as_text()
    # mean dot + the two e2 dots (gram @ W, then the contraction with W).
    assert _count_highest_dots(text) >= 3, text[:2000]


def test_analytic_layer_bwd_pins_highest():
    from facl_tpu.ops.analytic_sa import _layer_bwd

    lp = _layers(jax.random.PRNGKey(0), (4, 8))[0]
    dy = jnp.zeros((64, 8), jnp.float32)
    h = jnp.zeros((64, 4), jnp.float32)
    mean = jnp.zeros((8,), jnp.float32)
    var = jnp.ones((8,), jnp.float32)

    def f(dy, h, lp, mean, var):
        return _layer_bwd(dy, h, lp, mean, var, 1e-5, jnp.float32)

    text = jax.jit(f).lower(dy, h, lp, mean, var).as_text()
    # v, HX, sum_xhat, M, row_const all pin HIGHEST.
    assert _count_highest_dots(text) >= 5, text[:2000]


def test_layer_terms_pins_highest():
    from facl_tpu.ops.pallas.sa_bwd import _layer_terms

    lp = _layers(jax.random.PRNGKey(1), (4, 8))[0]
    A = jnp.zeros((8, 4), jnp.float32)
    u = jnp.zeros((8,), jnp.float32)
    mean = jnp.zeros((8,), jnp.float32)
    var = jnp.ones((8,), jnp.float32)
    G = jnp.zeros((4, 4), jnp.float32)
    ch = jnp.zeros((4,), jnp.float32)

    def f(A, u, lp, mean, var, G, ch):
        return _layer_terms(A, u, lp, mean, var, G, ch, 64.0, 1e-5)

    text = jax.jit(f).lower(A, u, lp, mean, var, G, ch).as_text()
    assert _count_highest_dots(text) >= 5, text[:2000]
