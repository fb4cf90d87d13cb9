"""Host-pipeline loopback benchmark: can the host side feed a ~3000+
clips/s device? (VERDICT r2 item 9.)

Isolates the host production path — native .npy batch loading + batch
stacking + the CropLoader producer thread — from the device and the H2D
link by consuming batches into a no-op sink. bench_e2e.json measures the
real end-to-end epoch (link included); this answers whether the HOST is
ever the bottleneck on a direct-attached machine.

Writes ``bench_host_pipeline.json`` at the repo root, one JSON line to
stdout.

Env: BENCH_HP_VIDEOS (default 1024), BENCH_HP_PASSES (default 3).
"""
from __future__ import annotations

import json
import os
import queue
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    from facl_tpu.config import Config
    from facl_tpu.data import NTUPointDataset
    from facl_tpu.data.native import native_available
    from facl_tpu.data.synthetic import write_random_tree

    videos = int(os.environ.get("BENCH_HP_VIDEOS", "1024"))
    passes = int(os.environ.get("BENCH_HP_PASSES", "3"))

    root = tempfile.mkdtemp(prefix="facl_hp_")
    try:
        write_random_tree(root, videos)
        cfg = Config()
        import dataclasses
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, root=root))
        ds = NTUPointDataset(root, cfg.data, train=True)
        B = min(cfg.train.batch_size, len(ds))
        nb = len(ds) // B
        batches = [list(range(i * B, (i + 1) * B)) for i in range(nb)]

        # Warm the page cache (the steady-state regime of a long run).
        for idxs in batches:
            ds.load_batch(idxs)

        # (a) Raw load_batch rate on the caller thread.
        t0 = time.perf_counter()
        for _ in range(passes):
            for idxs in batches:
                ds.load_batch(idxs)
        dt = time.perf_counter() - t0
        load_cps = passes * nb * B / dt

        # (b) The CropLoader producer pattern: one producer thread filling
        # a bounded queue, the consumer a no-op sink (stands in for a
        # device that keeps up) — measures sustained delivered clips/s
        # including queue/thread overhead.
        q: "queue.Queue" = queue.Queue(maxsize=2)

        def producer():
            try:
                for _ in range(passes):
                    for idxs in batches:
                        q.put(ds.load_batch(idxs))
            finally:
                # Always deliver the sentinel — an exception here must
                # not leave the consumer blocked on q.get() forever.
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t0 = time.perf_counter()
        t.start()
        n = 0
        while True:
            item = q.get()
            if item is None:
                break
            n += len(item[2])
        dt = time.perf_counter() - t0
        t.join()
        produced_cps = n / dt

        out = {
            "metric": "host_pipeline_clips_per_sec",
            "value": round(produced_cps, 1),
            "unit": "clips/s",
            "load_batch_clips_per_sec": round(load_cps, 1),
            "videos": len(ds),
            "batch": B,
            "passes": passes,
            "native_loader": bool(native_available()),
            "cpu_count": os.cpu_count(),
            "note": ("no-op-sink production rate of the CropLoader host "
                     "path (native .npy loader + stack + producer "
                     "thread/queue), page-cache warm. The device-side "
                     "crop factory and H2D transfer are excluded by "
                     "design — they belong to the device budget "
                     "(bench_e2e.json records the full path)."),
        }
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench_host_pipeline.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
