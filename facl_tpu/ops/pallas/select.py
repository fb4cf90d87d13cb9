"""Pallas TPU kernel: fused kNN + ball-query neighbor selection.

Replaces the XLA composite ``pairwise_sqdist -> lax.top_k -> radius
override`` (semantics: utils_my.py:255-291) for the training hot path.
The (B, S, N) distance matrix never leaves VMEM and the O(N log N)
top_k sort is replaced by an exact k-th-value binary search on the
monotonic f32 bit pattern — on the reference workload the XLA composite
costs ~8.5 ms/step (dist 3 + sort 5.5), this kernel ~1-2 ms.

Semantics vs the XLA composite
------------------------------
Returns, per centroid, the index SET {k nearest points, any of them
farther than radius_sq replaced by the centroid's own index} — identical
to the composite. The ORDER differs: the composite lists neighbors by
ascending distance; this kernel lists the selected in-radius points by
ascending point index with the centroid-padding at the tail. Everything
downstream of the gather is order-invariant (Dense is per-point, BN
statistics and the K max-pool reduce over the neighbor axis), so model
outputs are unchanged up to float reduction order; tests assert set
equality against the composite and output equality through the SA stage.

Tie-breaking is exact and deterministic: among equal distances, smaller
point index wins (ties are common on real data — resampling duplicates
points). The k-th-value search runs on ``bitcast(d, int32)``, which is
order-isomorphic to d for d >= 0; prefix counts for tie resolution and
selection ranks ride the MXU as {0,1}-matrix x strict-upper-triangular
matmuls (exact: integer values < 2^24 in f32 accumulation).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_INT_MAX = jnp.int32(2**31 - 1)


def _make_select_kernel(S: int, K: int, N: int, radius_sq: float,
                        bits_iters: int):
    def kernel(pts_ref, out_ref):
        # pts_ref: (1, 3, N) f32 — xyz transposed; first S columns are the
        #          centroids. out_ref: (1, S, K) int32.
        xyz_t = pts_ref[0, :, :]                                 # (3, N)
        cent_t = xyz_t[:, :S]                                    # (3, S)

        # Squared distances, mirroring ops.grouping.pairwise_sqdist:
        # a2 - 2ab + b2, clamped at 0.  (S, N) stays in VMEM.
        ab = jax.lax.dot_general(
            cent_t, xyz_t, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)                 # (S, N)
        c2 = jnp.sum(cent_t * cent_t, axis=0)[:, None]           # (S, 1)
        p2 = jnp.sum(xyz_t * xyz_t, axis=0)[None, :]             # (1, N)
        d = jnp.maximum(c2 - 2.0 * ab + p2, 0.0)                 # (S, N)

        # Monotone integer keys; out-of-radius -> +inf key (the composite
        # keeps d == radius_sq: strict `>` drops, utils_my.py:272-275).
        bits = jax.lax.bitcast_convert_type(d, jnp.int32)
        w = jnp.where(d <= radius_sq, bits, _INT_MAX)            # (S, N)

        # Exact k-th smallest per row: branchless binary search on the
        # key value. 31 iterations pin every bit of the int32 key.
        def bisect(_, carry):
            lo, hi = carry                                       # (S, 1)
            mid = lo + ((hi - lo) >> 1)
            cnt = jnp.sum((w <= mid).astype(jnp.float32), axis=1,
                          keepdims=True)                         # (S, 1)
            take = cnt >= float(K)
            return (jnp.where(take, lo, mid + 1),
                    jnp.where(take, mid, hi))

        lo0 = jnp.zeros((S, 1), jnp.int32)
        hi0 = jnp.full((S, 1), _INT_MAX, jnp.int32)
        _, t = jax.lax.fori_loop(0, bits_iters, bisect, (lo0, hi0))

        # Selection mask with exact smaller-index-first tie resolution.
        less = (w < t).astype(jnp.float32)                       # (S, N)
        valid_t = (t < _INT_MAX)
        tie = jnp.logical_and(w == t, valid_t).astype(jnp.float32)
        n_less = jnp.sum(less, axis=1, keepdims=True)            # (S, 1)
        m = jnp.asarray(float(K), jnp.float32) - n_less          # ties to take

        # Exclusive prefix counts along the point axis via a strict upper
        # triangular matmul (exact in f32 for counts < 2^24).
        rows = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
        upper = (rows < cols).astype(jnp.float32)                # (N, N)

        def prefix(mask):
            return jax.lax.dot_general(
                mask, upper, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        tie_rank = prefix(tie)
        sel = less + tie * (tie_rank < m).astype(jnp.float32)    # (S, N)
        rank = prefix(sel)                                       # (S, N)
        n_sel = jnp.sum(sel, axis=1, keepdims=True)              # (S, 1)

        # Compact: slot q of row s gets the point with rank q. Flatten
        # (S, K) onto sublanes so the hit matrix stays 2-D.
        # rank' = rank where selected else -1.
        rank_sel = jnp.where(sel > 0.5, rank, -1.0)              # (S, N)
        rank_b = jnp.broadcast_to(rank_sel[:, None, :], (S, K, N)
                                  ).reshape(S * K, N)
        q_col = jax.lax.broadcasted_iota(jnp.float32, (S, K), 1
                                         ).reshape(S * K, 1)
        hit = (rank_b == q_col).astype(jnp.float32)              # (S*K, N)
        col_idx = jax.lax.broadcasted_iota(
            jnp.float32, (N, 1), 0)                              # (N, 1)
        idx_f = jax.lax.dot_general(
            hit, col_idx, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(S, K)

        # Pad the tail slots (q >= n_sel) with the centroid's own index —
        # the composite's radius override picks the centroid feature.
        q_iota = jax.lax.broadcasted_iota(jnp.float32, (S, K), 1)
        s_iota = jax.lax.broadcasted_iota(jnp.float32, (S, K), 0)
        idx_f = jnp.where(q_iota < n_sel, idx_f, s_iota)
        out_ref[0, :, :] = idx_f.astype(jnp.int32)

    return kernel


@partial(jax.jit, static_argnames=("num_centroids", "knn_k", "radius_sq",
                                   "interpret"))
def select_knn_ball(points: Array, num_centroids: int, knn_k: int,
                    radius_sq: float, interpret: bool = False) -> Array:
    """Fused kNN + ball-query index selection.

    points: (B, N, C) with xyz in channels 0:3; the first
    ``num_centroids`` points are the centroids. Returns (B, S, K) int32 —
    same index set as ``top_k`` + radius override, selected in-radius
    points in ascending index order, centroid-padding at the tail.
    """
    B, N, C = points.shape
    S, K = num_centroids, knn_k
    xyz_t = jnp.swapaxes(points[..., :3].astype(jnp.float32), 1, 2)

    return pl.pallas_call(
        _make_select_kernel(S, K, N, float(radius_sq), 31),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 3, N), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, S, K), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, K), jnp.int32),
        interpret=interpret,
    )(xyz_t)
