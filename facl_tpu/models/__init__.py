from facl_tpu.models.layers import EmbedHead, PointMLP, l2_normalize
from facl_tpu.models.pointnet import (PointNetPlus, SA_IMPLS, resolve_model,
                                      resolve_model_config)
from facl_tpu.models.slowfast import PointNetSlowFast
from facl_tpu.models.probe import LinearProbe
from facl_tpu.models import moco

__all__ = [
    "EmbedHead",
    "PointMLP",
    "l2_normalize",
    "PointNetPlus",
    "resolve_model",
    "resolve_model_config",
    "SA_IMPLS",
    "PointNetSlowFast",
    "LinearProbe",
    "moco",
]
