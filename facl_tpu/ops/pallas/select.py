"""Pallas TPU kernel: fused kNN + ball-query neighbor selection.

Replaces the XLA composite ``pairwise_sqdist -> lax.top_k -> radius
override`` (semantics: utils_my.py:255-291) for the training hot path.
The (B, S, N) distance matrix never leaves VMEM and the O(N log N)
top_k sort is replaced by an exact k-th-value binary search on the
monotonic f32 bit pattern.

Blocking: each grid step processes ``rb`` batch rows at once, stacking
their (S, N) problems into one (rb*S, N) tile — the binary search and the
compaction loop are serial chains of cheap vector ops, so one-row tiles
leave the VPU latency-bound (measured: slower than the XLA composite at
rb=1, ~3x faster at rb=8 on the reference workload's 640x(64,512)).

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
equality against the composite and output equality through group_points.

Tie-breaking is exact and deterministic: among equal distances, smaller
point index wins (ties are common on real data — resampling duplicates
points). The k-th-value search runs on ``bitcast(d, int32)``, which is
order-isomorphic to d for d >= 0; prefix counts for tie resolution and
selection ranks ride the MXU as {0,1}-mask x strict-upper-triangular
matmuls (exact: 0/1 values are exact in bf16 and the counts < 2^24
accumulate in f32).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Plain Python int: a jnp scalar here would be captured by the kernel as a
# traced constant, which pallas_call rejects.
_INT_MAX = 2**31 - 1


def _make_select_kernel(rb: int, S: int, K: int, N: int, bits_iters: int,
                        gather_channels: int = 0):
    R = rb * S  # stacked rows per grid step
    C = gather_channels

    def kernel(radius_ref, pts_ref, out_ref, *grouped_ref):
        # radius_ref: (1, 1) f32 in SMEM — squared ball radius (dynamic so
        #          group_points stays jit-traceable in it).
        # pts_ref: (rb, C_in, N) f32 — features transposed, xyz in rows
        #          0:3; per batch row, the first S columns are centroids.
        # out_ref: (rb, S, K) int32 selected indices.
        # grouped_ref (only when gather_channels): (rb, C, S, K) f32 —
        #          the gathered (not yet re-centered) neighborhoods.
        radius_sq = radius_ref[0, 0]

        # Per-row distance blocks, stacked on sublanes: row r*S+s holds the
        # squared distances of batch row r's centroid s to its N points.
        # (Mirrors ops.grouping.pairwise_sqdist: a2 - 2ab + b2, clamped.)
        blocks = []
        for r in range(rb):
            xyz_t = pts_ref[r, 0:3, :]                           # (3, N)
            cent_t = xyz_t[:, :S]                                # (3, S)
            ab = jax.lax.dot_general(
                cent_t, xyz_t, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)             # (S, N)
            c2 = jnp.sum(cent_t * cent_t, axis=0)[:, None]       # (S, 1)
            p2 = jnp.sum(xyz_t * xyz_t, axis=0)[None, :]         # (1, N)
            blocks.append(jnp.maximum(c2 - 2.0 * ab + p2, 0.0))
        d = jnp.concatenate(blocks, axis=0)                      # (R, N)

        # Monotone integer keys; out-of-radius -> +inf key (the composite
        # keeps d == radius_sq: strict `>` drops, utils_my.py:272-275).
        bits = jax.lax.bitcast_convert_type(d, jnp.int32)
        w = jnp.where(d <= radius_sq, bits, _INT_MAX)            # (R, N)

        # Exact k-th smallest per row: branchless 4-ary search on the key
        # value. The search is a serial chain of cheap reduces (latency-
        # bound, not throughput-bound), so quartering the range per step
        # with three INDEPENDENT counts — which the VPU pipelines — halves
        # the chain length vs binary: 16 iterations cover [0, 2^31)
        # (worst-case range recurrence d -> max(d>>2, d-(d>>1)-(d>>2)-1)
        # reaches 0 in exactly 16 steps from 2^31-1).
        kf = float(K)

        def bisect(_, carry):
            lo, hi = carry                                       # (R, 1)
            d = hi - lo
            m1 = lo + (d >> 2)
            m2 = lo + (d >> 1)
            m3 = lo + (d >> 1) + (d >> 2)    # 3d/4 without int32 overflow
            c1 = jnp.sum((w <= m1).astype(jnp.float32), axis=1,
                         keepdims=True)                          # (R, 1)
            c2 = jnp.sum((w <= m2).astype(jnp.float32), axis=1,
                         keepdims=True)
            c3 = jnp.sum((w <= m3).astype(jnp.float32), axis=1,
                         keepdims=True)
            t1, t2, t3 = c1 >= kf, c2 >= kf, c3 >= kf
            new_lo = jnp.where(t1, lo, jnp.where(t2, m1 + 1,
                               jnp.where(t3, m2 + 1, m3 + 1)))
            new_hi = jnp.where(t1, m1, jnp.where(t2, m2,
                               jnp.where(t3, m3, hi)))
            return new_lo, new_hi

        lo0 = jnp.zeros((R, 1), jnp.int32)
        hi0 = jnp.full((R, 1), _INT_MAX, jnp.int32)
        _, t = jax.lax.fori_loop(0, bits_iters, bisect, (lo0, hi0))

        # Selection mask with exact smaller-index-first tie resolution.
        less = (w < t).astype(jnp.float32)                       # (R, N)
        valid_t = (t < _INT_MAX)
        tie = jnp.logical_and(w == t, valid_t).astype(jnp.float32)
        n_less = jnp.sum(less, axis=1, keepdims=True)            # (R, 1)
        m = jnp.asarray(float(K), jnp.float32) - n_less          # ties to take

        # Exclusive prefix counts along the point axis via a strict upper
        # triangular matmul. bf16 mask inputs are exact (0/1 values) and
        # the counts < 2^24 accumulate in f32.
        rows = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
        upper = (rows < cols).astype(jnp.bfloat16)               # (N, N)

        def prefix(mask):
            return jax.lax.dot_general(
                mask.astype(jnp.bfloat16), upper,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        tie_rank = prefix(tie)
        sel = less + tie * (tie_rank < m).astype(jnp.float32)    # (R, N)
        rank = prefix(sel)                                       # (R, N)
        n_sel = jnp.sum(sel, axis=1, keepdims=True)              # (R, 1)

        # Compact via log-shift stream compaction: selected element n must
        # move LEFT by defect = n - rank[n] lanes to land at lane rank[n].
        # Defects are monotone non-decreasing in n, so processing defect
        # bits LSB->MSB keeps positions strictly ordered (equal remaining
        # high bits preserve the rank gap; smaller high bits only widen
        # it) — no two elements ever contend for a lane. log2(N) stages of
        # roll+select replace a K-iteration one-hot loop (~5x less VPU
        # work at K=64, device-measured on the kernel's critical path).
        # Wrap-around is harmless: an element wrapped from lane p < 2^b
        # has remaining defect <= p < 2^b, so its bit b is never set.
        ranki = rank.astype(jnp.int32)                           # (R, N)
        seli = sel > 0.5
        n_row = jax.lax.broadcasted_iota(jnp.int32, (R, N), 1)
        V = jnp.where(seli, n_row, -1)                           # payload
        D = jnp.where(seli, n_row - ranki, 0)                    # defect

        # Fused gather: the point features ride the same compaction as
        # extra payload lanes — every channel c of batch row r is one
        # (1, N) vector broadcast to that row's S stacked rows.
        P = []
        cent_feat = []
        if C:
            eye = (n_row == jnp.remainder(
                jax.lax.broadcasted_iota(jnp.int32, (R, N), 0),
                jnp.int32(S))).astype(jnp.float32)               # (R, N)
            for c in range(C):
                pc = jnp.concatenate(
                    [jnp.broadcast_to(pts_ref[r, c:c + 1, :], (S, N))
                     for r in range(rb)], axis=0)                # (R, N)
                # The centroid's own feature value per stacked row (the
                # ball-query pad value): lane n == s picked via the eye
                # mask — no sublane<->lane transpose needed.
                cent_feat.append(jnp.sum(pc * eye, axis=1,
                                         keepdims=True))         # (R, 1)
                P.append(pc)

        for b in range(max(1, (N - 1).bit_length())):
            sh = 1 << b
            # Left-rotate by sh == right-rotate by N - sh (pltpu.roll
            # rejects negative shifts).
            Vs = pltpu.roll(V, shift=N - sh, axis=1)
            Ds = pltpu.roll(D, shift=N - sh, axis=1)
            take = jnp.logical_and(Vs >= 0, ((Ds >> b) & 1) == 1)
            keep = jnp.logical_and(V >= 0, ((D >> b) & 1) == 0)
            V = jnp.where(take, Vs, jnp.where(keep, V, -1))
            # Unoccupied lanes keep stale feature values — masked by the
            # q < n_sel pad select below.
            P = [jnp.where(take, pltpu.roll(pc, shift=N - sh, axis=1), pc)
                 for pc in P]
            D = jnp.where(take, Ds - sh, jnp.where(keep, D, 0))

        # Lane q < n_sel now holds the rank-q selected index; pad the tail
        # slots with the centroid's own index — the composite's radius
        # override picks the centroid feature.
        # Centroid index of each stacked row: row r*S+s -> s.
        s_col = jnp.remainder(
            jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0),
            jnp.int32(S))                                        # (R, 1)
        q_iota = jax.lax.broadcasted_iota(jnp.int32, (R, K), 1)
        valid_q = q_iota < n_sel.astype(jnp.int32)               # (R, K)
        idx = jnp.where(valid_q, V[:, :K], jnp.broadcast_to(s_col, (R, K)))
        for r in range(rb):
            out_ref[r, :, :] = idx[r * S:(r + 1) * S, :]
        if C:
            for c in range(C):
                g = jnp.where(valid_q, P[c][:, :K],
                              jnp.broadcast_to(cent_feat[c], (R, K)))
                for r in range(rb):
                    grouped_ref[0][r, c, :, :] = g[r * S:(r + 1) * S, :]

    return kernel


def _rows_per_block(B: int, S: int, N: int, gather_channels: int = 0) -> int:
    """Largest power-of-two batch-rows-per-grid-step that divides B and
    keeps the stacked (rb*S, N) working set comfortably inside VMEM
    (~6 live f32 tiles, ~2 more per gathered channel, + the (N, N) bf16
    triangular). ``SELECT_RB`` env forces a value (device tile sweeps);
    at the reference workload the heuristic lands on rb=4 for the fused
    select+gather (14 tiles) and rb=8 for select-only."""
    import os

    forced = os.environ.get("SELECT_RB")
    if forced:
        rb = int(forced)
        if B % rb:
            raise ValueError(f"SELECT_RB={rb} must divide batch {B}")
        return rb
    budget = 10 * 1024 * 1024 - 2 * N * N
    tiles = 6 + 2 * gather_channels
    rb = 8
    while rb > 1 and (B % rb or rb * S * N * 4 * tiles > budget):
        rb //= 2
    return rb


@partial(jax.jit, static_argnames=("num_centroids", "knn_k", "interpret"))
def select_knn_ball(points: Array, num_centroids: int, knn_k: int,
                    radius_sq, interpret: bool = False) -> Array:
    """Fused kNN + ball-query index selection.

    points: (B, N, C) with xyz in channels 0:3; the first
    ``num_centroids`` points are the centroids. ``radius_sq`` may be a
    traced scalar (it enters the kernel through SMEM). Returns (B, S, K)
    int32 — same index set as ``top_k`` + radius override, selected
    in-radius points in ascending index order, centroid-padding at the
    tail.
    """
    B, N, C = points.shape
    S, K = num_centroids, knn_k
    xyz_t = jnp.swapaxes(points[..., :3].astype(jnp.float32), 1, 2)
    radius = jnp.asarray(radius_sq, jnp.float32).reshape(1, 1)
    rb = _rows_per_block(B, S, N)

    return pl.pallas_call(
        _make_select_kernel(rb, S, K, N, 16),
        grid=(B // rb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((rb, 3, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, S, K), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, K), jnp.int32),
        interpret=interpret,
    )(radius, xyz_t)


@partial(jax.jit, static_argnames=("num_centroids", "knn_k", "interpret",
                                   "channels_first"))
def _select_gather(points: Array, num_centroids: int, knn_k: int,
                   radius_sq, interpret: bool = False,
                   channels_first: bool = False):
    """Fused selection + gather: one kernel pass emits both the index set
    and the gathered neighborhoods (features ride the log-shift
    compaction as extra payload lanes — the separate one-hot gather
    matmul kernel disappears from the hot path).

    Returns (grouped (B, S, K, C) f32 — NOT re-centered, idx (B, S, K)).
    """
    import os

    B, N, C = points.shape
    S, K = num_centroids, knn_k
    pts_t = jnp.swapaxes(points.astype(jnp.float32), 1, 2)   # (B, C, N)
    radius = jnp.asarray(radius_sq, jnp.float32).reshape(1, 1)
    rb = _rows_per_block(B, S, N, gather_channels=C)

    # SELECT_VMEM_MB: raise Mosaic's scoped-VMEM cap for SELECT_RB sweeps
    # (the rb=8 fused working set exceeds the default budget).
    vmem_mb = int(os.environ.get("SELECT_VMEM_MB", "0"))
    kwargs = {}
    if vmem_mb:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024)

    idx, grouped_t = pl.pallas_call(
        _make_select_kernel(rb, S, K, N, 16, gather_channels=C),
        grid=(B // rb,),
        **kwargs,
        in_specs=[
            pl.BlockSpec((1, 1), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((rb, C, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rb, S, K), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, C, S, K), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, K), jnp.int32),
            jax.ShapeDtypeStruct((B, C, S, K), jnp.float32),
        ),
        interpret=interpret,
    )(radius, pts_t)
    if channels_first:
        return grouped_t, idx
    return jnp.transpose(grouped_t, (0, 2, 3, 1)), idx


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 4, 5))
def select_gather_knn_ball(points: Array, num_centroids: int, knn_k: int,
                           radius_sq, interpret: bool = False,
                           channels_first: bool = False) -> Array:
    """Differentiable fused select+gather (backward = the in-VMEM
    scatter-add kernel over the selected indices, exactly the gather
    VJP — the index selection itself is piecewise constant in the
    points, like lax.top_k). Returns gathered f32 neighborhoods, NOT
    re-centered: (B, S, K, C), or with ``channels_first`` the kernel's
    native (B, C, S, K) layout — no transpose at all, for consumers
    like sa_train_pair_cf that read channel-major blocks directly."""
    grouped, _ = _select_gather(points, num_centroids, knn_k, radius_sq,
                                interpret, channels_first)
    return grouped


def _sg_fwd(points, num_centroids, knn_k, radius_sq, interpret,
            channels_first):
    grouped, idx = _select_gather(points, num_centroids, knn_k, radius_sq,
                                  interpret, channels_first)
    return grouped, (idx, points.shape[1])


def _sg_bwd(num_centroids, knn_k, interpret, channels_first, res, g):
    from facl_tpu.ops.pallas.gather import scatter_add_rows
    idx, n = res
    if channels_first:
        g = jnp.transpose(g, (0, 2, 3, 1))
    B, S, K, C = g.shape
    dpoints = scatter_add_rows(idx.reshape(B, S * K),
                               g.reshape(B, S * K, C), n, interpret)
    return dpoints, None


select_gather_knn_ball.defvjp(_sg_fwd, _sg_bwd)
