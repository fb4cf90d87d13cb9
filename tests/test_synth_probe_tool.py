"""Unit tests for tools/train_synthetic_probe.py's orchestration layer:
per-seed result caching/resume and the pooled Wilson-CI significance
call — pure host logic, no datagen/TPU (run_seed is monkeypatched).

The tool itself is the stand-in for the reference's terminating metric
(linear_classify/linercls.py:137-150); these tests pin the statistics
around it so the artifact's significance flag is trustworthy.
"""
import importlib.util
import json
import os
import sys

import pytest

TOOL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "train_synthetic_probe.py")


def _load_tool():
    spec = importlib.util.spec_from_file_location("sp_tool", TOOL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_wilson_matches_closed_form():
    import math

    sp = _load_tool()
    lo, hi = sp.wilson(0, 0)
    assert (lo, hi) == (0.0, 100.0)
    lo, hi = sp.wilson(50, 100)
    assert lo < 50.0 < hi
    # Exact closed-form width for (k=50, n=100), z=1.96:
    # 2*z*sqrt(p(1-p)/n + z^2/(4n^2)) / (1 + z^2/n), p=1/2.
    z, n, p = 1.96, 100, 0.5
    width = 100 * 2 * z * math.sqrt(p * (1 - p) / n
                                    + z * z / (4 * n * n)) / (1 + z * z / n)
    assert hi - lo == pytest.approx(width, rel=1e-12)
    # Degenerate endpoints stay inside [0, 100].
    lo, hi = sp.wilson(100, 100)
    assert 90 < lo < hi <= 100.0


def _run_main(tmp_path, monkeypatch, curves_by_seed, n_test=20):
    """Drive main() with run_seed stubbed; returns (artifact, calls)."""
    sp = _load_tool()
    calls = []

    def fake_run_seed(seed, videos, actions, checkpoints, batch,
                      probe_epochs, keep_tree, lr=3e-4, **kw):
        calls.append(seed)
        curve = curves_by_seed[seed]
        counts = {ck: (int(round(v * n_test / 100.0)), n_test)
                  for ck, v in curve.items()}
        return curve, counts, 40, n_test, {}

    monkeypatch.setattr(sp, "run_seed", fake_run_seed)
    # Redirect every artifact next to tmp_path by relocating the module's
    # notion of the repo root (it derives paths from __file__).
    tool_copy = tmp_path / "tools" / "train_synthetic_probe.py"
    tool_copy.parent.mkdir(exist_ok=True)
    tool_copy.write_text(open(TOOL).read())
    monkeypatch.setattr(sp, "__file__", str(tool_copy))
    monkeypatch.setenv("SP_VIDEOS", "40")
    monkeypatch.setenv("SP_ACTIONS", "5")
    monkeypatch.setenv("SP_SEEDS", ",".join(str(s) for s in curves_by_seed))
    monkeypatch.setenv("SP_CHECKPOINTS", "0,2")
    sp.main()
    with open(tmp_path / "synth_probe.json") as fh:
        return json.load(fh), calls


def test_cache_write_and_resume(tmp_path, monkeypatch):
    curves = {0: {0: 40.0, 2: 80.0}, 1: {0: 45.0, 2: 85.0}}
    art, calls = _run_main(tmp_path, monkeypatch, curves)
    assert calls == [0, 1]
    # Each completed seed left a cache file stamped with its config.
    for s in (0, 1):
        with open(tmp_path / f"synth_probe_seed{s}.json") as fh:
            cache = json.load(fh)
        assert cache["stamp"]["videos"] == 40
        assert cache["curve"]["2"] == curves[s][2]

    # Second invocation: run_seed must not be called again, and the
    # pooled artifact must be identical.
    art2, calls2 = _run_main(tmp_path, monkeypatch, curves)
    assert calls2 == []
    assert art2 == art

    # A config change invalidates the stamp and re-runs.
    monkeypatch.setenv("SP_VIDEOS", "41")
    sp = _load_tool()
    # (re-drive via _run_main would reset SP_VIDEOS; do it inline)
    calls3 = []
    monkeypatch.setattr(sp, "run_seed",
                        lambda seed, *a, **k: (calls3.append(seed) or
                                               (curves[seed],
                                                {ck: (1, 2) for ck in
                                                 curves[seed]}, 4, 2, {})))
    monkeypatch.setattr(sp, "__file__",
                        str(tmp_path / "tools" / "train_synthetic_probe.py"))
    monkeypatch.setenv("SP_SEEDS", "0,1")
    monkeypatch.setenv("SP_CHECKPOINTS", "0,2")
    sp.main()
    assert calls3 == [0, 1]


def test_significance_flag(tmp_path, monkeypatch):
    # Big gap, enough n: significant.
    curves = {s: {0: 20.0, 2: 90.0} for s in (0, 1, 2)}
    art, _ = _run_main(tmp_path, monkeypatch, curves, n_test=60)
    assert art["gap_exceeds_ci"] is True
    assert art["value"] == pytest.approx(90.0)
    assert art["control_top1"] == pytest.approx(20.0)

    # Trained below control: never significant (the r4 regression shape).
    for f in tmp_path.glob("synth_probe_seed*.json"):
        f.unlink()
    curves = {s: {0: 80.0, 2: 25.0} for s in (0, 1, 2)}
    art, _ = _run_main(tmp_path, monkeypatch, curves, n_test=60)
    assert art["gap"] < 0
    assert art["gap_exceeds_ci"] is False
