"""Capture a jax.profiler trace of the training step and print the
device-side op breakdown (top ops by self time) via xprof's converter.

Usage: python tools/profile_step.py [trace_dir]
Runs bench.py's workload with BENCH_PROFILE, then parses the newest
xplane.pb into op stats — the on-host answer to "where do the
milliseconds go" (no TensorBoard needed).
"""
from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/facl_prof"
    if not glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                     recursive=True):
        os.environ["BENCH_PROFILE"] = trace_dir
        os.environ.setdefault("BENCH_STEPS", "10")
        import bench
        bench.main()

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    assert paths, f"no xplane.pb under {trace_dir}"
    xplane = paths[-1]
    print(f"# parsing {xplane}")

    from xprof.convert import raw_to_tool_data

    params = {"tqx": "out:json;"}
    data, _ = raw_to_tool_data.xspace_to_tool_data([xplane], "op_profile",
                                                   params)
    if isinstance(data, bytes):
        data = data.decode()
    prof = json.loads(data)

    root = prof.get("byProgramExcludeIdle") or prof.get("byProgram") or prof
    total = float(root.get("metrics", {}).get("rawTime", 0.0)) or 1.0

    def walk(node, depth, out):
        m = node.get("metrics", {})
        name = node.get("name", "?")
        # xprof >= 2.x reports rawTime (ps); older builds a 'time' fraction.
        t = (float(m.get("rawTime", 0.0)) / total) or m.get("time", 0.0)
        out.append((t, depth, name, m.get("flops", 0.0)))
        for ch in node.get("children", []):
            walk(ch, depth + 1, out)

    out = []
    walk(root, 0, out)
    print(f"total device time: {total / 1e12 * 1e3:.1f} ms")
    print(f"{'time%':>7} {'flops%':>7}  op")
    for t, depth, name, fl in out:
        if depth <= 3 and t >= 0.005:
            print(f"{100*t:7.2f} {100*fl:7.2f}  {'  '*depth}{name}")


if __name__ == "__main__":
    main()
