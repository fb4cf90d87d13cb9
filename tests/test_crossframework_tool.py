"""Unit tests for tools/cross_framework_e2e.py's orchestration layer
(r5 upgrade, VERDICT r4 item 4): per-(seed, arm) result caching, the
xview test-count, and the pooled per-arm Wilson statistics — pure host
logic; the heavy phases are short-circuited by pre-seeded result files.

The tool itself compares the reference's five-stage flow
(/root/reference/README.md:16-37) against facl_tpu from identical
synthetic pixels; these tests pin the statistics the artifact reports.
"""
import importlib.util
import json
import os
import sys

import pytest

TOOL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools", "cross_framework_e2e.py")


def _load_tool():
    spec = importlib.util.spec_from_file_location("xfw_tool", TOOL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_png_tree(root, cameras):
    """Minimal NTU-layout PNG tree: one video dir per camera id."""
    for i, cam in enumerate(cameras):
        name = f"S001C{cam:03d}P001R001A{(i % 10) + 1:03d}_{i}"
        os.makedirs(os.path.join(root, "s001", "nturgb+d_depth_masked",
                                 name), exist_ok=True)


def test_count_xview_test(tmp_path):
    xfw = _load_tool()
    # xview: camera 1 is the TEST camera (cn3D_data_set.py:821).
    _fake_png_tree(str(tmp_path), [1, 2, 3, 1, 1, 2])
    assert xfw._count_xview_test(str(tmp_path)) == 3


def _seed_dir(work, seed, cameras, ref_top1, facl_top1):
    sdir = os.path.join(work, f"seed{seed}")
    os.makedirs(sdir, exist_ok=True)
    _fake_png_tree(os.path.join(sdir, "png_tree"), cameras)
    for arm, top1 in (("ref", ref_top1), ("facl", facl_top1)):
        with open(os.path.join(sdir, f"{arm}_result.json"), "w") as fh:
            json.dump({"framework": arm, "probe_top1": top1,
                       "probe_top1_best": top1 + 1.0,
                       "stage_seconds": {}}, fh)
    return sdir


def test_pooled_artifact(tmp_path, monkeypatch):
    xfw = _load_tool()
    work = str(tmp_path / "work")
    # seed 0: 4 test videos; seed 1: 2 test videos.
    _seed_dir(work, 0, [1, 1, 1, 1, 2, 3], ref_top1=25.0, facl_top1=50.0)
    _seed_dir(work, 1, [1, 1, 2, 3], ref_top1=50.0, facl_top1=100.0)
    calls = []
    monkeypatch.setattr(xfw, "_run", lambda *a, **k: calls.append(a))
    out = tmp_path / "out.json"
    monkeypatch.setattr(sys, "argv",
                        ["cross_framework_e2e.py", "--work", work,
                         "--seeds", "0,1", "--out", str(out)])
    xfw.main()
    assert calls == []          # every (seed, arm) was cached
    with open(out) as fh:
        art = json.load(fh)
    # Pooled: ref k = 1 + 1 = 2 of 6; facl k = 2 + 2 = 4 of 6.
    ref, facl = art["arms"]["reference_torch_cpu"], art["arms"]["facl_tpu"]
    assert ref["pooled_n"] == 6 and facl["pooled_n"] == 6
    assert ref["pooled_top1"] == pytest.approx(100 * 2 / 6, abs=0.01)
    assert facl["pooled_top1"] == pytest.approx(100 * 4 / 6, abs=0.01)
    assert art["delta_top1"] == pytest.approx(
        facl["pooled_top1"] - ref["pooled_top1"], abs=0.02)
    # Wilson interval brackets the point estimate and is honest about n=6.
    lo, hi = facl["pooled_ci95"]
    assert lo < facl["pooled_top1"] < hi
    assert hi - lo > 30.0       # tiny n -> wide interval
    assert art["per_seed"]["0"]["n_test"] == 4
    assert art["per_seed"]["1"]["n_test"] == 2
    assert art["workload"]["seeds"] == [0, 1]


def test_missing_arm_triggers_run(tmp_path, monkeypatch):
    xfw = _load_tool()
    work = str(tmp_path / "work")
    sdir = _seed_dir(work, 0, [1, 2], ref_top1=30.0, facl_top1=40.0)
    os.remove(os.path.join(sdir, "facl_result.json"))

    def fake_run(cmd, **kw):
        # The orchestrator re-runs ONLY the missing arm, then reads its
        # result file; fake the phase by writing it.
        assert "--phase" in cmd and cmd[-1] == "facl"
        with open(os.path.join(sdir, "facl_result.json"), "w") as fh:
            json.dump({"framework": "facl", "probe_top1": 40.0,
                       "probe_top1_best": 41.0, "stage_seconds": {}}, fh)
        fake_run.calls += 1

    fake_run.calls = 0
    monkeypatch.setattr(xfw, "_run", fake_run)
    out = tmp_path / "out.json"
    monkeypatch.setattr(sys, "argv",
                        ["cross_framework_e2e.py", "--work", work,
                         "--seeds", "0", "--out", str(out)])
    xfw.main()
    assert fake_run.calls == 1
    assert os.path.exists(out)
