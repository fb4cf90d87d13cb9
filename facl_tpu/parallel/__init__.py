from facl_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_sharding,
    replicated,
    shard_train_state,
)
from facl_tpu.parallel.collectives import (
    cross_replica_mean,
    gather_negatives,
    psum_grads,
)
from facl_tpu.parallel.distributed import initialize

__all__ = [
    "batch_sharding",
    "make_mesh",
    "param_sharding",
    "replicated",
    "shard_train_state",
    "cross_replica_mean",
    "gather_negatives",
    "psum_grads",
    "initialize",
]
