"""Device benchmark: single-clip vs cross-clip-batched 3DV generation.

Times generate_clip (one clip per jit call) against generate_clips
(V clips vmapped through one program) at the real NTU workload shape
(60 frames x 424x512 depth), excluding compile. Prints ms/clip and the
batched speedup — the measurement VERDICT r2 item 6 asks for.

Usage:  python tools/bench_datagen.py [V ...]   (default V = 4 8)
Env:    DG_STEPS=<n> timed iterations (default 5), DG_FRAMES frame cap.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_frames(V, F, H, W, seed=0):
    rng = np.random.default_rng(seed)
    frames = np.zeros((V, F, H, W), np.float32)
    for v in range(V):
        for f in range(F):
            cy = min(100 + 3 * f + 5 * v, H - 121)
            cx = min(150 + 4 * f, W - 81)
            frames[v, f, cy:cy + 120, cx:cx + 80] = rng.uniform(
                900, 1400, size=(120, 80))
    return frames


def main() -> None:
    import jax
    import jax.numpy as jnp

    from facl_tpu.config import DatagenConfig
    from facl_tpu.datagen import generate_clip, generate_clips

    sizes = [int(a) for a in sys.argv[1:]] or [4, 8]
    steps = int(os.environ.get("DG_STEPS", "5"))
    F = int(os.environ.get("DG_FRAMES", "60"))
    cfg = DatagenConfig(max_frames=F)
    H, W = cfg.image_shape

    def sync(out):
        return float(np.asarray(out["raw"]).ravel()[0])

    # Single-clip baseline.
    frames1 = jnp.asarray(synth_frames(1, F, H, W)[0])
    n1 = jnp.asarray(F, jnp.int32)
    key = jax.random.PRNGKey(0)
    sync(generate_clip(key, frames1, n1, cfg, F))        # compile
    t0 = time.perf_counter()
    for i in range(steps):
        sync(generate_clip(jax.random.fold_in(key, i), frames1, n1, cfg, F))
    single_ms = (time.perf_counter() - t0) / steps * 1000
    print(f"single-clip: {single_ms:.1f} ms/clip")

    for V in sizes:
        framesV = jnp.asarray(synth_frames(V, F, H, W))
        keysV = jnp.stack([jax.random.fold_in(key, 1000 + v)
                           for v in range(V)])
        nsV = jnp.full((V,), F, jnp.int32)
        sync(generate_clips(keysV, framesV, nsV, cfg, F))  # compile
        t0 = time.perf_counter()
        for i in range(steps):
            sync(generate_clips(keysV, framesV, nsV, cfg, F))
        ms = (time.perf_counter() - t0) / steps * 1000
        print(f"batched V={V}: {ms:.1f} ms/batch = {ms / V:.1f} ms/clip "
              f"({single_ms / (ms / V):.2f}x vs single)")


if __name__ == "__main__":
    main()
