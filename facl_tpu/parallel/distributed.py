"""Multi-host initialization.

The reference never initializes a process group (SURVEY §2.9). For
multi-host TPU pods this wrapper is the one call needed before building the
global mesh: every host calls it, then ``jax.devices()`` spans the pod and
the same GSPMD code runs unchanged.
"""
from __future__ import annotations

import os
from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed when running multi-host; no-op on a
    single host (or when already initialized)."""
    import jax

    if num_processes in (None, 1) and "JAX_COORDINATOR_ADDRESS" not in os.environ \
            and coordinator_address is None:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        # Already initialized.
        pass
