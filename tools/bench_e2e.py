"""End-to-end pipeline benchmark: epoch-level clips/s over the real host
pipeline (native .npy batch loader -> CropLoader prefetch threads -> jit
crop factory -> device step) next to the device-step-only number that
bench.py reports.

The reference's real per-step cost includes its torch DataLoader
(cn3d_train_apperance_GL.py:171,223-333); this records our equivalent so
the step-level headline can't hide host-side overhead.

Writes ``bench_e2e.json`` at the repo root and prints it as one JSON line.

Env knobs: BENCH_E2E_VIDEOS (default 256), BENCH_E2E_EPOCHS (default 2),
BENCH_DTYPE (default bfloat16).
"""
from __future__ import annotations

import dataclasses
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    from facl_tpu.config import Config
    from facl_tpu.data import CropLoader, NTUPointDataset
    from facl_tpu.data.native import native_available
    from facl_tpu.data.synthetic import write_random_tree
    from facl_tpu.train import Trainer

    videos = int(os.environ.get("BENCH_E2E_VIDEOS", "1024"))
    epochs = int(os.environ.get("BENCH_E2E_EPOCHS", "2"))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")

    # Host->device link bandwidth probe: on this dev machine the TPU sits
    # behind a network tunnel (~50-60 MB/s), which dominates the epoch
    # rate; on a real TPU host (PCIe) the same transfers are negligible.
    # Recording it makes the epoch number interpretable.
    import jax.numpy as jnp
    probe = np.random.default_rng(0).normal(size=(4 << 20,)).astype(
        np.float32)                          # 16 MB
    # Scalar fetch is the only reliable sync on the tunnel backend
    # (block_until_ready returns early) — warm up, then take the best
    # of 3 timed transfers.
    float(jnp.asarray(probe)[0])
    times = []
    for i in range(3):
        probe[0] = i                         # defeat transfer caching
        t0 = time.perf_counter()
        float(jnp.asarray(probe)[0])
        times.append(time.perf_counter() - t0)
    link_mbps = probe.nbytes / 1e6 / min(times)

    root = tempfile.mkdtemp(prefix="facl_e2e_")
    try:
        t0 = time.perf_counter()
        write_random_tree(root, videos)
        t_tree = time.perf_counter() - t0

        cfg = Config()
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, compute_dtype=dtype),
            data=dataclasses.replace(cfg.data, root=root))
        ds = NTUPointDataset(root, cfg.data, train=True)
        B = min(cfg.train.batch_size, len(ds))
        steps_per_epoch = max(1, len(ds) // B)
        key = jax.random.PRNGKey(0)
        loader = CropLoader(ds, B, key)
        trainer = Trainer(cfg, steps_per_epoch=steps_per_epoch)

        sample = next(iter(loader.epoch(0)))[0]
        state = trainer.init_state(jax.random.PRNGKey(0), sample)

        # Warm-up epoch: compiles the step and fills the loader caches.
        state, _ = trainer.run_epoch(
            state, (b for b, _, _ in loader.epoch(0)), 0, key)

        epoch_rates = []
        for e in range(1, 1 + epochs):
            state, metrics = trainer.run_epoch(
                state, (b for b, _, _ in loader.epoch(e)), e,
                jax.random.fold_in(key, e))
            epoch_rates.append(metrics["clips_per_sec"])
        epoch_cps = float(np.median(epoch_rates))

        # Device-step-only rate on a preloaded batch (bench.py's method),
        # same shapes, for the host-overhead comparison.
        batch = sample
        ep = np.int32(0)
        for i in range(2):
            state, m = trainer.step_fn(state, batch,
                                       jax.random.fold_in(key, 100 + i), ep)
        float(m["loss"])
        steps = 3 * steps_per_epoch
        t0 = time.perf_counter()
        for i in range(steps):
            state, m = trainer.step_fn(state, batch,
                                       jax.random.fold_in(key, 200 + i), ep)
        float(m["loss"])
        step_cps = steps * B / (time.perf_counter() - t0)

        out = {
            "metric": "epoch_clips_per_sec",
            "value": round(epoch_cps, 3),
            "unit": "clips/s",
            "step_clips_per_sec": round(step_cps, 3),
            "host_overhead_pct": round(100.0 * (1.0 - epoch_cps / step_cps),
                                       2),
            "train_videos": len(ds),
            "batch": B,
            "steps_per_epoch": steps_per_epoch,
            "epochs_timed": epochs,
            "dtype": dtype,
            "native_loader": bool(native_available()),
            "tree_write_s": round(t_tree, 2),
            "h2d_link_mb_per_s": round(link_mbps, 1),
            "note": ("host_overhead is dominated by the H2D link on this "
                     "machine (TPU behind a tunnel at the recorded MB/s; "
                     "~17 MB of clip sources per 64-clip batch). A "
                     "direct-attached host moves the same batch in ~2 ms."
                     " Producer-thread device_put was tried for overlap "
                     "and deadlocks against main-thread compiles on the "
                     "remote backend (see data/dataset.py)."),
        }
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench_e2e.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
