"""kNN + ball-query grouping — the hot op of the whole pipeline.

Re-derivation of the reference semantics (training_code/utils_my.py:255-291,
``group_points_3DV`` and friends), built TPU-first:

* The first ``num_centroids`` points of each cloud act as group centroids
  (the reference relies on upstream random/FPS ordering for this).
* All-pairs *squared* euclidean distances between centroids and points are
  computed as one batched matmul (MXU) instead of the reference's
  broadcast-subtract-square (utils_my.py:265-268).
* The k nearest points per centroid are selected; any neighbor whose squared
  distance exceeds ``radius_sq`` is replaced by the centroid itself — the
  reference encodes this by overwriting the gather index with the centroid's
  own row index jj (utils_my.py:272-275), so the pad feature is the
  centroid's feature. We reproduce exactly that.
* Gathered neighborhoods have their xyz re-centered on the centroid.

Outputs are channels-last ``(B, S, K, C)`` — the idiomatic layout for XLA on
TPU (the reference returns NCHW ``(B, C, S, K)`` because torch convs want
that; our shared-MLP is a plain matmul over the trailing channel dim).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from facl_tpu.config import GroupingConfig

Array = jax.Array


def pairwise_sqdist(a: Array, b: Array) -> Array:
    """Squared euclidean distances between two point sets.

    a: (..., S, D), b: (..., N, D) -> (..., S, N).

    Uses the |a|^2 - 2ab + |b|^2 expansion so the inner term rides the MXU.
    Distances of a point to itself may come out as tiny negatives from
    cancellation; clamped to 0 so ball-query thresholds stay exact.
    """
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)            # (..., S, 1)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)            # (..., N, 1)
    # HIGHEST precision: the default TPU matmul precision is bf16-ish, which
    # is far too coarse for radius comparisons on squared distances.
    ab = jnp.einsum("...sd,...nd->...sn", a, b,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)   # (..., S, N)
    d = a2 - 2.0 * ab + jnp.swapaxes(b2, -1, -2)
    return jnp.maximum(d, 0.0)


def knn_indices(sqd: Array, k: int, method: str = "exact") -> Tuple[Array, Array]:
    """k smallest entries along the last axis. Returns (dists, indices)."""
    if method == "approx":
        # TPU-native approximate nearest neighbours (recall ~0.95); useful
        # for throughput experiments. Exact is the default for parity.
        dists, idx = jax.lax.approx_min_k(sqd, k)
        return dists, idx
    neg, idx = jax.lax.top_k(-sqd, k)
    return -neg, idx


def _use_pallas_gather() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def _interpret_pallas() -> bool:
    """Pallas TPU kernels run interpreted on the CPU backend (tests)."""
    try:
        return jax.default_backend() == "cpu"
    except Exception:
        return False


@partial(jax.jit, static_argnames=("num_centroids", "knn_k", "method",
                                   "gather_impl", "select_impl", "layout"))
def group_points(
    points: Array,
    num_centroids: int = 64,
    knn_k: int = 64,
    radius_sq: float = 0.06,
    method: str = "exact",
    gather_impl: str = "auto",
    select_impl: str = "auto",
    layout: str = "bskc",
) -> Tuple[Array, Array]:
    """Ball-query/kNN grouping (semantics of utils_my.py:255-291).

    Args:
      points: (B, N, C) point clouds; channels 0:3 are xyz.
      num_centroids: S — number of groups (first S points are centroids).
      knn_k: K — neighbors per group.
      radius_sq: squared-distance ball; the reference compares the *squared*
        distance against 0.06 without sqrt (utils_my.py:268-272).
      method: "exact" | "approx" neighbor search.
      gather_impl: "auto" | "xla" | "pallas". On TPU, "pallas" uses the
        in-VMEM one-hot matmul kernel (facl_tpu.ops.pallas.gather) —
        bit-exact and ~6x faster than XLA's gather; "auto" picks it on TPU.
      select_impl: "auto" | "xla" | "pallas". "pallas" computes the kNN +
        ball-query index set with the fused in-VMEM kernel
        (facl_tpu.ops.pallas.select) instead of dists -> lax.top_k ->
        radius override — same exact index set, neighbor order within the
        K selected differs (downstream ops reduce over that axis).
        "auto" picks pallas on TPU for method="exact".

    Returns:
      neighborhoods: gathered features, xyz re-centered — (B, S, K, C),
        or (B, C, S, K) for ``layout="bcsk"`` (the fused kernel's native
        channel-major layout, consumed transpose-free by the paired SA
        stage; non-fused impl combinations fall back to an explicit
        transpose).
      centers: (B, S, 3) centroid coordinates.
    """
    if layout not in ("bskc", "bcsk"):
        raise ValueError(f"unknown layout {layout!r}")
    B, N, C = points.shape
    S, K = num_centroids, knn_k
    if K > N:
        raise ValueError(f"knn_k={K} exceeds the {N} points per cloud")
    if S > N:
        raise ValueError(f"num_centroids={S} exceeds the {N} points per "
                         "cloud (centroids are the first S points)")
    xyz = points[..., :3]
    centers = xyz[:, :S, :]                                # (B, S, 3)

    use_pallas_select = method == "exact" and (
        select_impl == "pallas" or
        (select_impl == "auto" and _use_pallas_gather()))
    use_pallas_gather = gather_impl == "pallas" or (
        gather_impl == "auto" and _use_pallas_gather())

    if use_pallas_select and use_pallas_gather:
        # Fully fused: one kernel emits the gathered neighborhoods — the
        # separate select+gather pair costs two passes over the same
        # in-VMEM state.
        from facl_tpu.ops.pallas.select import select_gather_knn_ball
        cf = layout == "bcsk"
        grouped = select_gather_knn_ball(points, S, K, radius_sq,
                                         _interpret_pallas(), cf)
        if cf:
            grouped = grouped.at[:, :3].add(
                -jnp.swapaxes(centers, 1, 2)[:, :, :, None])
        else:
            grouped = grouped.at[..., :3].add(-centers[:, :, None, :])
        return grouped, centers

    if use_pallas_select:
        from facl_tpu.ops.pallas.select import select_knn_ball
        idx = select_knn_ball(points, S, K, radius_sq,
                              interpret=_interpret_pallas())
    else:
        sqd = pairwise_sqdist(centers, xyz)                # (B, S, N)
        dists, idx = knn_indices(sqd, K, method)           # (B, S, K)
        # Ball query: out-of-radius neighbor -> the centroid's own index,
        # making the centroid feature the pad value (utils_my.py:272-275).
        centroid_rows = jnp.arange(S, dtype=idx.dtype)[None, :, None]
        idx = jnp.where(dists > radius_sq, centroid_rows, idx)

    if use_pallas_gather:
        from facl_tpu.ops.pallas.gather import gather_rows_vjp
        grouped = gather_rows_vjp(points, idx.reshape(B, S * K),
                                  _interpret_pallas())
        grouped = grouped.reshape(B, S, K, C)
    else:
        grouped = jnp.take_along_axis(
            points[:, None, :, :], idx[..., None], axis=2
        )                                                  # (B, S, K, C)
    grouped = grouped.at[..., :3].add(-centers[:, :, None, :])
    if layout == "bcsk":
        grouped = jnp.transpose(grouped, (0, 3, 1, 2))
    return grouped, centers


def resolve_gather_impl(cfg: GroupingConfig, *,
                        n_devices: int = None) -> str:
    """Config-driven gather selection, decided ONCE at build time (like
    models.resolve_model_config — not re-probed inside traced code).

    An explicit "pallas"/"xla" is always honored. ``"auto"`` downgrades
    to the XLA gather only in the no-mesh multi-device case, where GSPMD
    must partition the whole graph and a pallas_call is a single-device
    program; with a mesh, grouping runs per-shard under shard_map and
    never calls this. ``n_devices`` defaults to the live runtime and
    exists so the rule is unit-testable without it
    (tests/test_grouping.py)."""
    if cfg.gather_impl != "auto":
        return cfg.gather_impl
    if n_devices is None:
        n_devices = len(jax.devices())
    return "xla" if n_devices > 1 else "auto"


def resolve_select_impl(cfg: GroupingConfig, *,
                        n_devices: int = None) -> str:
    """Same rule for the neighbor-selection kernel (see
    :func:`resolve_gather_impl`)."""
    if cfg.select_impl != "auto":
        return cfg.select_impl
    if n_devices is None:
        n_devices = len(jax.devices())
    return "xla" if n_devices > 1 else "auto"


def group_points_cfg(points: Array, cfg: GroupingConfig) -> Tuple[Array, Array]:
    return group_points(
        points,
        num_centroids=cfg.num_centroids,
        knn_k=cfg.knn_k,
        radius_sq=cfg.radius_sq,
        method=cfg.method,
        gather_impl=cfg.gather_impl,
        select_impl=cfg.select_impl,
    )


@partial(jax.jit, static_argnames=("num_centroids", "knn_k"))
def group_points_level2(
    features: Array,
    num_centroids: int = 64,
    knn_k: int = 32,
    radius_sq: float = 0.11,
) -> Tuple[Array, Array]:
    """Second-level grouping over already-abstracted features.

    Semantics of utils_my.py:332-381 (``group_points_2`` /
    ``group_points_2_3DV``): the input is (B, S1, 3 + F) — xyz plus learned
    features per first-level group; the first ``num_centroids`` rows are
    level-2 centroids; gather is over the full feature vector and only xyz
    is re-centered. Unused by the reference's active drivers but part of the
    capability surface.
    """
    return group_points(
        features, num_centroids=num_centroids, knn_k=knn_k,
        radius_sq=radius_sq, method="exact",
    )
