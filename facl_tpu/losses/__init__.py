from facl_tpu.losses.infonce import (
    circle_infonce,
    cross_entropy,
    global_local_infonce,
    offdiag_mask,
    pair_infonce,
)
from facl_tpu.losses.sinkhorn import sinkhorn, shoot_infs, swav_loss, swav_queue_init
from facl_tpu.losses.cld import cld_loss, cld_pair_loss, kmeans

__all__ = [
    "circle_infonce",
    "cross_entropy",
    "global_local_infonce",
    "offdiag_mask",
    "pair_infonce",
    "sinkhorn",
    "shoot_infs",
    "swav_loss",
    "swav_queue_init",
    "cld_loss",
    "cld_pair_loss",
    "kmeans",
]
