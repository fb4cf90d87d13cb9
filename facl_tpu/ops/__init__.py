from facl_tpu.ops.grouping import (
    group_points,
    group_points_cfg,
    group_points_level2,
    knn_indices,
    pairwise_sqdist,
)
from facl_tpu.ops.fps import farthest_point_sampling, fps_batched, fps_reorder
from facl_tpu.ops import transforms

__all__ = [
    "group_points",
    "group_points_cfg",
    "group_points_level2",
    "knn_indices",
    "pairwise_sqdist",
    "farthest_point_sampling",
    "fps_batched",
    "fps_reorder",
    "transforms",
]
