"""Benchmark: contrastive-pretrain throughput (clips/sec/chip).

Times the fused jit training step on the reference workload
(BASELINE.md "workload definition"): batch 64 videos x 10 crops x 512
points x 4 features; grouping S=64 centroids, K=64 neighbors; 512-d
embeddings; active losses global-local + circle InfoNCE; Adam update.

Prints ONE JSON line:
  {"metric": "clips_per_sec_per_chip", "value": N, "unit": "clips/s",
   "vs_baseline": R}

``vs_baseline``: the reference repo publishes no numbers (BASELINE.md), so
the denominator is produced by ``tools/bench_reference_torch.py`` — an
exact re-timing harness of the reference's per-step work in PyTorch on this
host — whose result is cached in ``baseline_local.json``. If that file is
missing, vs_baseline falls back to 1.0.  The baseline was timed
python-loop style; the default fori_loop_diff mode here is the same
per-step work (device-verified BENCH_LOOP=0/1 agreement, BASELINE.md) so
the ratio is like-for-like up to dispatch overhead, which the torch
number also excludes (CUDA-graph-free synchronous steps).
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def _probe_backend(timeout_s: int = 330) -> None:
    """Fail fast (bounded) if the accelerator backend is unreachable.

    A dead remote backend (e.g. a down axon tunnel) makes the first
    device op hang indefinitely; probing in a bounded subprocess turns
    that into a clean nonzero exit instead of eating the caller's whole
    time budget. Overridable with BENCH_SKIP_PROBE=1."""
    import subprocess
    import sys

    if os.environ.get("BENCH_SKIP_PROBE") == "1":
        return
    code = ("import jax, jax.numpy as jnp; "
            "print(float((jnp.ones((8, 8)) + 1).ravel()[0]))")
    try:
        subprocess.run([sys.executable, "-c", code], check=True,
                       timeout=timeout_s, stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL)
    except subprocess.TimeoutExpired:
        raise SystemExit(
            f"bench: accelerator backend unreachable (device probe hung "
            f">{timeout_s}s) — no measurement possible")
    except subprocess.CalledProcessError as e:
        raise SystemExit(f"bench: device probe failed (rc={e.returncode})")


def make_run_n(step_fn, batches, epoch):
    """Build the jitted n-step loop runner used by BENCH_LOOP=1.

    ``batches`` is a (R, G, B, N, C) stack of R >= 2 pre-staged batches; the
    fori_loop body selects batch ``i % R`` by dynamic slice, so the grouping
    input is iteration-dependent and the compiler cannot hoist or
    constant-fold the select/top_k chain out of the while body (the
    reference pays grouping every step — utils_my.py:255-291 runs per
    batch — so must the benchmark). tests/test_bench_loop.py asserts the
    compiled HLO keeps the grouping inside the loop.

    Returns run_n(state, metrics, key, n) -> (state, metrics); ``n`` is a
    traced int32 so one compilation serves calibration and measurement.
    """
    import jax
    import jax.numpy as jnp

    R = batches.shape[0]
    assert R >= 2, "need >= 2 staged batches to defeat loop-invariant elision"

    @jax.jit
    def run_n(state, metrics, key, n):
        def body(i, carry):
            st, _ = carry
            b = jax.lax.dynamic_index_in_dim(batches, i % R, 0,
                                             keepdims=False)
            # Fold the step index into the key — a constant key would make
            # the circle-loss crop permutation identical across steps.
            return step_fn(st, b, jax.random.fold_in(key, i), epoch)
        return jax.lax.fori_loop(0, n, body, (state, metrics))

    return run_n


def main() -> None:
    _probe_backend()

    import jax
    import jax.numpy as jnp

    from facl_tpu.config import Config
    from facl_tpu.train import Trainer

    import dataclasses

    cfg = Config()
    # Production TPU training config: bf16 compute in the encoder (params
    # and losses stay f32). BENCH_DTYPE=float32 measures strict-parity
    # mode; BENCH_BATCH scales the per-step videos (BASELINE config 4's
    # "large batch"); BENCH_PROFILE=<dir> captures a jax.profiler trace.
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    # BENCH_SA_IMPL: pair3 (paired-row full-lane-width layout + slim
    # 3-sweep backward — the single-chip flagship, docs/DESIGN.md
    # section 3; device-measured 3786 clips/s vs pair's 3285, round 3)
    # | pair | hybrid2 | reference (direct BN reduce) | hybrid |
    # analytic | covar | pallas.
    sa_impl = os.environ.get("BENCH_SA_IMPL", "pair3")
    # Channel-major neighborhoods feed the paired SA sweeps transpose-
    # free (BENCH_CF=0 to disable; only meaningful with sa_impl=pair*).
    cf = os.environ.get(
        "BENCH_CF", "1" if sa_impl in ("pair", "pair3") else "0") == "1"
    cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                compute_dtype=dtype,
                                                sa_impl=sa_impl,
                                                channels_first=cf))
    # BENCH_SELECT_IMPL / BENCH_GATHER_IMPL: auto | xla | pallas.
    cfg = cfg.replace(grouping=dataclasses.replace(
        cfg.grouping,
        select_impl=os.environ.get("BENCH_SELECT_IMPL",
                                   cfg.grouping.select_impl),
        gather_impl=os.environ.get("BENCH_GATHER_IMPL",
                                   cfg.grouping.gather_impl)))
    # BENCH_SPLIT=1: two-program step (TrainConfig.split_step) — halves
    # each program's scratch arena for large-batch runs on
    # scratch-capped runtimes. Forces python_loop timing (a fori_loop
    # wrapper would inline both programs back into one module).
    split = os.environ.get("BENCH_SPLIT", "0") == "1"
    if split:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                    split_step=True))
    G = cfg.model.num_crops              # 10
    B = int(os.environ.get("BENCH_BATCH", cfg.train.batch_size))  # 64
    N = cfg.data.num_points              # 512
    C = cfg.model.in_features            # 4

    rng = np.random.default_rng(0)
    # Two distinct pre-staged batches; every timed step consumes batch
    # (step % 2) so the grouping input is iteration-dependent in BOTH
    # timing modes (loop-invariant-elision-proof; see make_run_n).
    batches_np = rng.normal(size=(2, G, B, N, C)).astype(np.float32)
    batches = jnp.asarray(batches_np)
    batch = batches[0]

    trainer = Trainer(cfg, steps_per_epoch=100)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(1)
    epoch = jnp.asarray(0, jnp.int32)

    # Warm-up (compile + 2 steps). A scalar fetch is the only reliable
    # barrier here: block_until_ready returns early on the remote (axon)
    # backend.
    for i in range(2):
        state, metrics = trainer.step_fn(state, batches[i % 2],
                                         jax.random.fold_in(key, 1000 + i),
                                         epoch)
    float(metrics["loss"])

    steps = int(os.environ.get("BENCH_STEPS", "30"))
    from facl_tpu.utils.profiling import trace

    # BENCH_LOOP=1 (default): tunnel-immune timing — chain the steps
    # through ONE lax.fori_loop dispatch with a *dynamic* trip count
    # (one compile serves both calibration and measurement) and report
    # (t_steps - t_1) / (steps - 1). Through the axon tunnel each
    # Python-dispatched step pays a serialized round trip (measured
    # ~65 ms on 2026-08-19 — 5x the 16 ms step); on a direct-attached
    # host dispatch overlaps and both modes agree. BENCH_LOOP=0
    # restores the per-dispatch Python loop (the r1/r2 form). Both modes
    # rotate between two staged batches so per-step work is identical
    # and loop-invariant elision is impossible (make_run_n;
    # device-verified mode agreement recorded in BASELINE.md).
    loop_mode = (os.environ.get("BENCH_LOOP", "1") == "1" and steps > 1
                 and not split)
    mode = "fori_loop_diff" if loop_mode else "python_loop"

    if loop_mode:
        run_n = make_run_n(trainer.step_fn, batches, epoch)

        def timed(n, reps=2):
            t0 = time.perf_counter()
            for r in range(reps):
                st, m = run_n(state, metrics,
                              jax.random.fold_in(key, 7000 + r), n)
                float(m["loss"])
            return (time.perf_counter() - t0) / reps

        n1 = jnp.asarray(1, jnp.int32)
        nS = jnp.asarray(steps, jnp.int32)
        _ = timed(n1, reps=1)            # compile + warm
        with trace(os.environ.get("BENCH_PROFILE")):
            t_1 = timed(n1, reps=3)
            t_S = timed(nS)
        dt = (t_S - t_1) / (steps - 1) * steps
        if dt <= 0:
            # Tunnel jitter can make the 1-step calibration exceed
            # t_S/steps; fall back to the un-differenced loop total
            # (still dispatch-free, just includes one dispatch overhead).
            dt = t_S
            mode = "fori_loop_total"
    else:
        with trace(os.environ.get("BENCH_PROFILE")):
            t0 = time.perf_counter()
            for i in range(steps):
                state, metrics = trainer.step_fn(
                    state, batches[i % 2], jax.random.fold_in(key, i),
                    epoch)
            float(metrics["loss"])      # forces the whole chain
            dt = time.perf_counter() - t0

    n_chips = max(1, len(jax.devices()))
    clips_per_sec = steps * B / dt / n_chips

    baseline = None
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "baseline_local.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            baseline = json.load(f).get("clips_per_sec")

    vs = clips_per_sec / baseline if baseline else 1.0
    print(json.dumps({
        "metric": "clips_per_sec_per_chip",
        "value": round(clips_per_sec, 3),
        "unit": "clips/s",
        "vs_baseline": round(vs, 3),
        "mode": mode,
        "steps": steps,
    }))


if __name__ == "__main__":
    main()
