"""Micro-benchmark: Pallas select_knn_ball vs the XLA composite
(pairwise_sqdist -> top_k -> radius override) on the reference grouping
workload (640 rows x 512 points, S=64, K=64).

Also checks index-set equality on the real device before timing.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from facl_tpu.ops.grouping import pairwise_sqdist, knn_indices
from facl_tpu.ops.pallas.select import select_knn_ball


def composite(points, S, K, radius_sq):
    xyz = points[..., :3]
    centers = xyz[:, :S, :]
    sqd = pairwise_sqdist(centers, xyz)
    dists, idx = knn_indices(sqd, K)
    rows = jnp.arange(S, dtype=idx.dtype)[None, :, None]
    return jnp.where(dists > radius_sq, rows, idx)


def sync(x):
    return float(jnp.asarray(x).ravel()[0])


def main():
    B, N, C, S, K = 640, 512, 4, 64, 64
    radius_sq = 0.06
    rng = np.random.default_rng(0)
    # Normalized-cloud-like coordinates (reference data is in [-0.5, 0.5]).
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, N, C)).astype(np.float32))

    comp = jax.jit(lambda p: composite(p, S, K, radius_sq))
    sel = jax.jit(lambda p: select_knn_ball(p, S, K, radius_sq))

    idx_c = np.asarray(comp(pts))
    idx_s = np.asarray(sel(pts))
    same = 0
    for b in range(0, B, 97):
        for s in range(S):
            if set(idx_c[b, s].tolist()) == set(idx_s[b, s].tolist()):
                same += 1
    total = len(range(0, B, 97)) * S
    print(f"set-equality spot check: {same}/{total}")

    from facl_tpu.ops.pallas.gather import gather_rows
    from facl_tpu.ops.pallas.select import select_gather_knn_ball

    def split_pair(p):
        i = select_knn_ball(p, S, K, radius_sq)
        return gather_rows(p, i.reshape(B, S * K)).reshape(B, S, K, C)

    fused = jax.jit(lambda p: select_gather_knn_ball(p, S, K, radius_sq))
    pair = jax.jit(split_pair)

    g_f = np.asarray(fused(pts))
    g_p = np.asarray(pair(pts))
    print("fused == select+gather:", bool((g_f == g_p).all()))

    for name, fn in [("composite", comp), ("pallas_select", sel),
                     ("select+gather pair", pair), ("fused gather", fused)]:
        out = fn(pts)
        sync(out)
        t0 = time.perf_counter()
        iters = 50
        for _ in range(iters):
            out = fn(pts)
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
