"""Does the REFERENCE torch implementation collapse on the same
synthetic point tree where facl_tpu does?

The r5 scale study (BASELINE.md round-5 scale note) found the
contrastive pretrain collapsing at 504 videos (trained far below the
random-encoder control) while 144-video trees train green, robust to
batch/lr/checkpoint timing — on facl_tpu. This script runs the
reference's OWN pipeline (cn3d_train_motion_GL -> extract ->
linercls, imported in place from /root/reference with the
PARITY-documented defect patches, exactly like
tools/cross_framework_e2e.py) on the SAME generated tree:

* reference collapses too  -> the collapse is a property of the
  objective on this data regime, not a framework defect;
* reference learns         -> a real facl_tpu training defect exists at
  this scale and must be found.

Usage:
  python tools/diag_torch_504.py --tree /tmp/sp_full_trees/seed0 \
      --work /tmp/torch504 --epochs 15 --batch 16 --probe-epochs 21

Prints one JSON line: control (epoch-0 checkpoint) and trained probe
top-1 on the xview test split, like the facl-side probe tool.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, TOOLS)

import cross_framework_e2e as X  # noqa: E402  (shared shims/patches)


def sandbox(work: str, tree: str) -> str:
    """cwd sandbox whose relative paths satisfy the reference scripts,
    with the EXISTING generated tree symlinked in (no generate stage)."""
    run = os.path.join(work, "run")
    ntu = os.path.join(work, "ntu")
    os.makedirs(run, exist_ok=True)
    os.makedirs(os.path.join(ntu, "ntu60_new2", "model"), exist_ok=True)
    os.makedirs(os.path.join(work, "feat_motion_ref"), exist_ok=True)
    resl = os.path.join(ntu, "3DV_ntu60", "reslution")
    os.makedirs(os.path.dirname(resl), exist_ok=True)
    if not os.path.lexists(resl):
        os.symlink(tree, resl)
    # The dataset classes locate their split boundary by this exact file
    # name (cn3D_data_set.py:59); synthetic names sort before it.
    sent = os.path.join(tree, "Resolution60", "raw",
                        "S017C003P020R002A060.npy")
    if not os.path.exists(sent):
        import numpy as np
        np.save(sent, np.zeros((4, 8), np.float32))
    flat_raw = os.path.join(ntu, "3DV_ntu60", "raw")
    if not os.path.lexists(flat_raw):
        os.symlink(os.path.join("reslution", "Resolution60", "raw"),
                   flat_raw)
    return run


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tree", required=True)
    p.add_argument("--work", required=True)
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--probe-epochs", type=int, default=21)
    p.add_argument("--probe-batch", type=int, default=16)
    args = p.parse_args()

    sys.path.insert(0, os.path.join(X.REF, "training_code"))
    sys.path.insert(0, os.path.join(X.REF, "linear_classify"))
    X._np_compat()
    X._shim_torch_cpu()
    import types
    tv = types.ModuleType("torchvision")
    tv.transforms = types.ModuleType("torchvision.transforms")
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tv.transforms)
    import random

    import numpy as np
    import torch

    random.seed(1)
    np.random.seed(1)
    torch.manual_seed(1)

    run = sandbox(args.work, os.path.abspath(args.tree))
    os.chdir(run)

    import cn3D_data_set as DS
    X._patch_app_branch(DS)
    import cn3d_model_conbag as MODELL
    X._patch_forward4(MODELL)

    # ---- motion pretrain. The reference saves every 5 epochs INCL.
    # epoch 0, i.e. after ONE trained epoch — exactly the point where
    # the facl arm is already collapsed at this scale (ck1 = 9.4%), so
    # probing corr_GL_0.pth gives a matched early point; the random
    # control baseline comes from the facl tool's epoch-0 probe (60.1%
    # on this tree).
    import cn3d_train_motion_GL as TRAIN
    X._workers0(TRAIN)
    model_dir = "../ntu/ntu60_new2/model/"
    t0 = time.time()
    sys.argv = ["cn3d_train_motion_GL.py", "--batchSize", str(args.batch),
                "--nepoch", str(args.epochs), "--dataset", "ntu60",
                "--save_root_dir", model_dir, "--branch_choose", "0"]
    TRAIN.main()
    t_train = time.time() - t0
    print(f"# torch pretrain: {t_train:.0f}s", flush=True)

    # ---- extract + probe for (trained latest, epoch-0) checkpoints ----
    _real_exists = os.path.exists
    os.path.exists = (lambda pth, _e=_real_exists:
                      True if str(pth).startswith("/data/data1/ntu/feature")
                      else _e(pth))
    import extract_motion_feature as EX
    X._workers0(EX)
    import dataset_of_lin as DL
    import linercls as LIN
    X._workers0(LIN)

    def _getitem(self, idx):
        vid_id = self.vid_ids[idx]
        v_name = self.id_to_vidName[vid_id][:20]
        label = self.id_to_action[vid_id]
        m = np.load(os.path.join(self.opt.motion_feature, v_name + ".npy"))
        a = np.load(os.path.join(self.opt.appreance_feature,
                                 v_name + ".npy"))
        return np.concatenate((m, a), 0).astype(np.float32), label

    DL.LIner_NTU.__getitem__ = _getitem

    saved = sorted((f for f in os.listdir(model_dir)
                    if re.fullmatch(r"corr_GL_\d+\.pth", f)
                    and not os.path.islink(os.path.join(model_dir, f))),
                   key=lambda f: int(f[8:-4]))
    assert saved, "reference training saved no checkpoint"
    results = {}
    for tag, ck in (("control_ep0", saved[0]), ("trained", saved[-1])):
        link = os.path.join(model_dir, "corr_GL_.pth")
        if os.path.lexists(link):
            os.remove(link)
        os.symlink(ck, link)
        feat_dir = os.path.join(args.work, "feat_motion_ref")
        for f in os.listdir(feat_dir):
            os.remove(os.path.join(feat_dir, f))
        orig_save = EX.save_single_feature
        EX.save_single_feature = (
            lambda feature, save_path, name, num_crop=11:
            orig_save(feature, feat_dir + os.sep, name, num_crop))
        sys.argv = ["extract_motion_feature.py", "--batchSize",
                    str(args.batch), "--dataset", "ntu60",
                    "--branch_choose", "0", "--SAMPLE_NUM", "512"]
        EX.main()
        EX.save_single_feature = orig_save

        sys.argv = ["linercls.py", "--batchSize", str(args.probe_batch),
                    "--nepoch", str(args.probe_epochs), "--dataset",
                    "ntu60", "--root_path",
                    os.path.join(args.tree, "Resolution60", "raw") + os.sep,
                    "--motion_feature", feat_dir,
                    "--appreance_feature", feat_dir]
        import io
        from contextlib import redirect_stdout
        buf = io.StringIO()

        class _Tee(io.TextIOBase):
            def write(self, s):
                buf.write(s)
                sys.__stdout__.write(s)
                return len(s)

        with redirect_stdout(_Tee()):
            LIN.main()
        tops = re.findall(r"test top1:\s*tensor\(([\d.]+)", buf.getvalue())
        if not tops:
            tops = re.findall(r"test top1:\s*([\d.]+)", buf.getvalue())
        assert tops, "no test top1 lines in probe output"
        results[tag] = {"checkpoint": ck, "top1": float(tops[-1]),
                        "top1_best": max(float(t) for t in tops)}
        print(f"# {tag} ({ck}): top1={tops[-1]}", flush=True)

    out = {"framework": "reference_torch_cpu", "tree": args.tree,
           "epochs": args.epochs, "batch": args.batch, **results}
    with open(os.path.join(args.work, "torch504_result.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
