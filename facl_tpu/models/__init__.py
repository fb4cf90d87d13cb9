from facl_tpu.models.layers import EmbedHead, PointMLP, l2_normalize
from facl_tpu.models.pointnet import PointNetPlus, resolve_model
from facl_tpu.models.slowfast import PointNetSlowFast
from facl_tpu.models.probe import LinearProbe
from facl_tpu.models import moco

__all__ = [
    "EmbedHead",
    "PointMLP",
    "l2_normalize",
    "PointNetPlus",
    "resolve_model",
    "PointNetSlowFast",
    "LinearProbe",
    "moco",
]
