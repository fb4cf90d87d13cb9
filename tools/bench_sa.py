"""Micro-benchmark the SA-stage training backends on the reference
workload shapes (batch 64 x 10 crops x S=64 x K=64 x 4 features;
widths 64/64/256).

Usage: python tools/bench_sa.py [impl ...]   (default: hybrid2 pair)
Env: SA_BENCH_DTYPE=float32|bfloat16 (default bfloat16),
     SA_BENCH_STEPS=N (default 20),
     SA_BENCH_LOOP=N (0 = off): tunnel-immune mode — run N parameter-
       update iterations chained through ``lax.fori_loop`` inside ONE
       jit dispatch and report (t_N - t_1)/(N - 1), cancelling the
       per-dispatch tunnel overhead that dominates Python-loop timings
       when the axon link is degraded (e.g. 2026-08-19: a trivial add
       took 175 s to warm up and per-dispatch overhead was ~65 ms,
       5x-ing the Python-loop numbers of BASELINE.md's table).

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

    loop_n = int(os.environ.get("SA_BENCH_LOOP", "0"))
    if loop_n == 1:
        raise SystemExit("SA_BENCH_LOOP must be >= 2 (the timing is the "
                         "difference between an n-step and a 1-step loop)")
    if loop_n:
        for impl in impls:
            f = get_fn(impl)

            @jax.jit
            def run(layers, x, n, f=f):
                # Dynamic trip count: ONE compile serves both the n=1
                # calibration and the n=loop_n measurement.
                def body(_i, lay):
                    def loss(lay):
                        pooled, _ = f(x, lay, 1e-5, dtype, False)
                        return jnp.sum(pooled.astype(jnp.float32)
                                       * wvec)
                    _l, g = jax.value_and_grad(loss)(lay)
                    # Tiny SGD update: chains iteration i+1 on i's
                    # gradients so XLA cannot elide or overlap steps.
                    return jax.tree_util.tree_map(
                        lambda p, gr: (p - 1e-6 * gr).astype(p.dtype),
                        lay, g)
                out = jax.lax.fori_loop(0, n, body, layers)
                return out[0].kernel

            times = {}
            nn = {1: jnp.asarray(1, jnp.int32),
                  loop_n: jnp.asarray(loop_n, jnp.int32)}
            _ = float(run(layers, x, nn[1]).ravel()[0])   # compile+run 1
            for n in (1, loop_n):
                reps = 3
                t0 = time.perf_counter()
                for _r in range(reps):
                    _ = float(run(layers, x, nn[n]).ravel()[0])
                times[n] = (time.perf_counter() - t0) / reps
            dt = (times[loop_n] - times[1]) / (loop_n - 1)
            print(f"{impl:10s} {dtype.name:9s} {dt * 1e3:8.2f} ms/step "
                  f"device (fori_loop {loop_n} vs 1; dispatch+1step "
                  f"{times[1] * 1e3:.1f} ms)")
        return

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
