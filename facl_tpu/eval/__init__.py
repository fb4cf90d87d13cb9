from facl_tpu.eval.probe import (
    LinearProbeTrainer,
    combine_streams,
    topk_accuracy,
)

__all__ = ["LinearProbeTrainer", "combine_streams", "topk_accuracy"]
