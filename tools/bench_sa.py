"""Micro-benchmark the SA-stage training backends on the reference
workload shapes (batch 64 x 10 crops x S=64 x K=64 x 4 features;
widths 64/64/256).

Usage: python tools/bench_sa.py [impl ...]   (default: hybrid2 pair)
Env: SA_BENCH_DTYPE=float32|bfloat16 (default bfloat16),
     SA_BENCH_STEPS=N (default 20).

Times one jitted value_and_grad step of sum(pooled * w) — forward +
full backward w.r.t. the layer parameters — synchronized by scalar
fetch (axon's block_until_ready returns early)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from facl_tpu.ops.fused_sa import SALayerParams


def main() -> None:
    impls = sys.argv[1:] or ["hybrid2", "pair"]
    dtype = jnp.dtype(os.environ.get("SA_BENCH_DTYPE", "bfloat16"))
    steps = int(os.environ.get("SA_BENCH_STEPS", "20"))

    GB, S, K, C = 640, 64, 64, 4
    widths = (64, 64, 256)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(GB, S, K, C)).astype(np.float32))
    cin = C
    layers = []
    for w in widths:
        layers.append(SALayerParams(
            kernel=jnp.asarray(
                rng.normal(size=(cin, w)).astype(np.float32) / np.sqrt(cin)),
            bias=jnp.zeros((w,), jnp.float32),
            scale=jnp.ones((w,), jnp.float32),
            shift=jnp.zeros((w,), jnp.float32)))
        cin = w
    layers = tuple(layers)
    wvec = jnp.asarray(rng.normal(size=(widths[-1],)).astype(np.float32))

    def get_fn(impl):
        if impl == "hybrid2":
            from facl_tpu.ops.pallas.sa_fwd import sa_train_pfwd as f
        elif impl == "pair":
            from facl_tpu.ops.pallas.sa_pair import sa_train_pair as f
        elif impl == "pair3":
            from facl_tpu.ops.pallas.sa_pair import sa_train_pair

            def f(x, layers, eps, dtype, interpret):
                return sa_train_pair(x, layers, eps, dtype, interpret,
                                     True)
        elif impl == "hybrid":
            from facl_tpu.ops.pallas.sa_bwd import sa_train_hybrid as f
        else:
            raise SystemExit(f"unknown impl {impl!r}")
        return f

    for impl in impls:
        f = get_fn(impl)

        @jax.jit
        def step(layers, x):
            def loss(layers):
                pooled, _ = f(x, layers, 1e-5, dtype, False)
                return jnp.sum(pooled.astype(jnp.float32) * wvec)
            l, g = jax.value_and_grad(loss)(layers)
            return l, g

        l, g = step(layers, x)
        _ = float(l)                       # sync (compile + run 1)
        t0 = time.perf_counter()
        for _i in range(steps):
            l, g = step(layers, x)
        _ = float(l) + float(g[0].kernel.ravel()[0])
        dt = (time.perf_counter() - t0) / steps
        print(f"{impl:10s} {dtype.name:9s} {dt * 1e3:8.2f} ms/step "
              f"(fwd+bwd, {GB * S * K:,} rows)")


if __name__ == "__main__":
    main()
