"""Train state pytree: params, BN running stats, optimizer state, step —
plus the optional SwAV queue. Replaces the reference's implicit module state
and enables full checkpoint/resume (the reference saved params only, every
5 epochs — cn3d_train_apperance_GL.py:340-341; SURVEY §5.4)."""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Array                      # () int32 — global update count
    swav_queue: Optional[Array] = None   # (G-1, Q, D) or None

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def create_train_state(model, optimizer, sample_inputs, rng,
                       swav_queue: Optional[Array] = None) -> TrainState:
    variables = model.init(rng, *sample_inputs, train=False)
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
        swav_queue=swav_queue,
    )
