"""Device-memory diagnostics for the batch-scaling story (BASELINE.md).

Three probes, one JSON line each (all opt-in via env, default all on):

1. ``step_temp``  — AOT-compile the flagship train step at several batch
   sizes and report XLA's own accounting (``memory_analysis()``): temp
   arena, argument, output bytes. This is what the program actually
   needs — independent of any runtime/allocator quirks.
2. ``alloc_cap``  — allocate independent 2 GB device buffers until
   failure: the chip's *cumulative* usable HBM.
3. ``arena_cap``  — run single programs whose temp arena is ~2/3/4 GB
   (big PRNG intermediates reduced to a scalar): the largest single
   program the runtime will execute. On a direct-attached v5e this
   equals free HBM; through the axon tunnel it is the binding
   constraint on large-batch steps (measured r4: B>=192 steps whose
   temp exceeds ~3 GB are refused with ResourceExhausted while the
   chip itself holds 12+ GB of buffers fine).

Usage: ``python tools/hbm_probe.py`` (TPU); select with
``HBM_PROBES=step_temp,alloc_cap,arena_cap``; ``HBM_BATCHES=64,128,192,256``.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe_step_temp(batches):
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from facl_tpu.config import Config
    from facl_tpu.train import Trainer

    out = []
    for B in batches:
        cfg = Config()
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, compute_dtype="bfloat16", sa_impl="pair3",
            channels_first=True))
        G, N, C = (cfg.model.num_crops, cfg.data.num_points,
                   cfg.model.in_features)
        rng = np.random.default_rng(0)
        batch = jnp.asarray(rng.normal(size=(G, B, N, C)).astype(np.float32))
        trainer = Trainer(cfg, steps_per_epoch=100)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        comp = trainer.step_fn.lower(
            state, batch, jax.random.PRNGKey(1),
            jnp.asarray(0, jnp.int32)).compile()
        ma = comp.memory_analysis()
        row = {"batch": B,
               "temp_gib": round(ma.temp_size_in_bytes / 2**30, 3),
               "args_mib": round(ma.argument_size_in_bytes / 2**20, 1),
               "out_mib": round(ma.output_size_in_bytes / 2**20, 1)}
        out.append(row)
        print(json.dumps({"probe": "step_temp", **row}), flush=True)
        del comp, state, trainer, batch
    return out


def probe_alloc_cap(max_gb=20):
    import jax
    import jax.random as jr

    bufs, gb = [], 0
    while gb < max_gb:
        try:
            x = jr.normal(jr.PRNGKey(gb), (512, 1024, 1024))  # 2 GB f32
            float(x.ravel()[0])
            bufs.append(x)
            gb += 2
        except Exception as e:
            print(json.dumps({"probe": "alloc_cap", "usable_gb": gb,
                              "fail": type(e).__name__}), flush=True)
            return gb
    print(json.dumps({"probe": "alloc_cap", "usable_gb": gb,
                      "fail": None}), flush=True)
    return gb


def probe_arena_cap(sizes_gb=(2.0, 3.0, 4.0)):
    import jax
    import jax.random as jr

    results = {}
    for gb in sizes_gb:
        n = int(gb * 2**30) // 4 // 2   # two f32 intermediates of n elems
        f = jax.jit(lambda k: ((jr.normal(k, (n,)) * 2.0 + 1.0).sum()
                               + (jr.normal(jr.fold_in(k, 1), (n,))
                                  * 3.0).sum()))
        try:
            float(f(jr.PRNGKey(0)))
            results[gb] = "ok"
        except Exception as e:
            results[gb] = type(e).__name__
        print(json.dumps({"probe": "arena_cap", "temp_gb": gb,
                          "result": results[gb]}), flush=True)
    return results


def main():
    which = os.environ.get(
        "HBM_PROBES", "step_temp,alloc_cap,arena_cap").split(",")
    batches = [int(b) for b in os.environ.get(
        "HBM_BATCHES", "64,128,192,256").split(",")]
    if "step_temp" in which:
        probe_step_temp(batches)
    if "arena_cap" in which:
        probe_arena_cap()
    if "alloc_cap" in which:
        probe_alloc_cap()


if __name__ == "__main__":
    main()
