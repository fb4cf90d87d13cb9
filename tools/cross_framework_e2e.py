"""Cross-framework end-to-end comparison (VERDICT r3 item 4; upgraded
r5 per VERDICT r4 item 4: BOTH streams, >=128 videos, >=2 seeds, the
facl arm on the flagship TPU path, per-arm Wilson CIs).

Runs the five-stage flow (/root/reference/README.md:16-37) in BOTH
frameworks from the SAME synthetic PNG depth tree and the same xview
split, and compares linear-probe top-1 on motion+appearance features
combined exactly as the reference probe does (dataset_of_lin.py:94-107):

  reference (torch, this host's CPU):
    generate_data/generate_NTU.py
    -> training_code/cn3d_train_{motion,apperance}_GL.py
    -> training_code/extract_{motion,apperance}_feature.py
    -> linear_classify/linercls.py
  facl_tpu (flagship TPU path: sa_impl=auto -> pair3, bf16):
    cli.generate --data -> cli.pretrain --stream {motion,appearance}
    -> cli.extract x2 -> cli.probe

The reference modules are imported IN PLACE from /root/reference (never
copied). Its shipped defects are patched in-memory exactly as PARITY.md
documents ("Known intentional deviations"):

  #1 generate_NTU.save_npy references undefined module globals
     (generate_NTU.py:32-42 vs :267-275) -> the three output dirs are
     injected as module attributes. The shipped per-resolution loop then
     writes identical data three times to the same dirs (PARITY #2's
     finding); Resolution30/10 are symlinked to Resolution60 to give the
     dataset the tree the shipped generator produces.
  PointNet_Plus 1-output forward (cn3d_model_conbag.py:93-117) crashes
     the 4-way unpack in every driver -> replaced with the commented
     4-output body (:119-137), the documented intent (PARITY
     "Forward-signature inconsistency").
  #3/#7 the appearance branch is unrunnable as shipped: it loads
     app/<name>.npy where the generator saved <name>_app.npy
     (cn3D_data_set.py:125-128 vs generate_NTU.py:110), the (A, 2048, 4)
     app arrays crash the 2-D get_data_train indexing, and
     get_temporal_augment_data(points, 4) indexes a segment channel the
     4-column app arrays don't have (cn3D_data_set.py:656). Patched to
     the SAME documented intent facl_tpu implements
     (facl_tpu/data/dataset.py module docstring): the per-frame sets are
     flattened into one (A*N, 4) pool and the temporal views come from
     the raw 3DV cloud's segment channels.
  #4 LIner_NTU.__getitem__ loads the same file for every index
     (dataset_of_lin.py:103-105) -> features keyed by video name.

Environment pins (not semantics): torch.cuda shims for this CPU-only
torch build; DataLoader num_workers=0 (one core); np.float/np.int
aliases for the reference's numpy era; seeded random/np.random (the
reference is unseeded); feature/checkpoint output paths relocated into
the sandbox (the shipped absolute '/data/...' paths don't exist here,
and an os.path.exists shim stops the extract scripts from mkdir'ing
their unused hardcoded '/data/...' save dirs).

Usage:
  python tools/cross_framework_e2e.py --work /tmp/xfw --videos 128 \
      --seeds 0,1 --epochs 11 --probe-epochs 21 \
      --out crossframework_e2e.json

Each (seed, arm) result is cached as <work>/seed<N>/{ref,facl}_result.json
so an interrupted run resumes. The reference phase runs in a subprocess
(its numpy/torch monkeypatches must not leak into the facl_tpu phase).
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


# --------------------------------------------------------------------------
# reference-side phase (subprocess)
# --------------------------------------------------------------------------

def _shim_torch_cpu():
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.set_device = lambda *a, **k: None
    torch.cuda.synchronize = lambda *a, **k: None
    torch.cuda.empty_cache = lambda *a, **k: None
    torch.cuda.is_available = lambda: False
    torch.cuda.device_count = lambda: 0


def _np_compat():
    import numpy as np
    for name, alias in (("float", float), ("int", int), ("bool", bool),
                        ("object", object)):
        if not hasattr(np, name):
            setattr(np, name, alias)


def _workers0(module):
    """Force num_workers=0 on the module's DataLoader global (one core)."""
    import torch.utils.data as tud

    class _DL(tud.DataLoader):
        def __init__(self, *a, **k):
            k["num_workers"] = 0
            super().__init__(*a, **k)

    module.DataLoader = _DL


def _patch_forward4(MODELL):
    """The commented 4-output forward (cn3d_model_conbag.py:119-137) —
    the documented intent every driver unpacks (PARITY
    'Forward-signature inconsistency')."""
    import torch
    import torch.nn.functional as F

    def forward(self, xt, yt, loss_mode=0):
        B, d, N, k = xt.shape
        xt = self.net3DV_1(xt)
        xt = torch.cat((yt, xt), 1)
        xt_local = self.net3DV_3(xt)
        xt = self.my_max_pool(xt_local).squeeze(-1).squeeze(-1)
        x = xt.clone()
        x_global = xt_local.reshape(self.gost, -1, 1024,
                                    self.sample_num_level1)
        x_global = x_global.permute(1, 2, 0, 3).reshape(
            -1, 1024, self.gost * self.sample_num_level1, 1)
        x_global = self.gobaol_max_pool(x_global).squeeze(-1).squeeze(-1)
        x = self.netR_FC(x)
        x_global = self.netR_FC(x_global)
        x_nor = F.normalize(x, p=2, dim=1)
        code = self.mapping(x_nor)
        return x, code, x_nor, x_global

    MODELL.PointNet_Plus.forward = forward


def _patch_app_branch(DS):
    """Make the appearance branch (branch_choose='1') runnable per the
    documented intent (module docstring, PARITY #3/#7): load the
    <name>_app.npy files the generator actually wrote, flatten the
    (A, N, 4) per-frame sets into one (A*N, 4) pool, and take the
    temporal views from the raw 3DV cloud's segment channels (the app
    arrays have no segment channels to slice). Identical crop recipe to
    the shipped motion branch (cn3D_data_set.py:105-140) otherwise; the
    motion branch is delegated to the shipped code untouched."""
    import numpy as np
    orig = DS.NTU_RGBD_new.__getitem__

    def _getitem(self, idx):
        if self.opt.branch_choose == '0':
            return orig(self, idx)
        vid_id = self.vid_ids[idx]
        v_name = self.id_to_vidName[vid_id][:20]
        base = '../ntu/3DV_ntu60/reslution/'
        app = np.load(base + 'Resolution60/app/' + v_name
                      + '_app.npy').reshape(-1, 4)
        key_points = np.load(base + 'Resolution60/others/' + v_name
                             + '_key.npy')
        raw = np.load(base + 'Resolution60/raw/' + v_name + '.npy')
        res1 = np.load(base + 'Resolution30/app/' + v_name
                       + '_app.npy').reshape(-1, 4)
        res2 = np.load(base + 'Resolution10/app/' + v_name
                       + '_app.npy').reshape(-1, 4)
        time_seg2 = self.get_temporal_augment_data(raw, 4)
        time_seg4 = self.get_temporal_augment_data(raw, 7)
        out_points = self.get_data_train(
            app, key_points[:, :4], time_seg2[:, :4], time_seg4[:, :4],
            res1, res2, num_crop=10)
        return out_points, v_name, self.id_to_action[vid_id]

    DS.NTU_RGBD_new.__getitem__ = _getitem


def _link_newest(model_dir, pattern, link_name):
    """Symlink the fixed checkpoint name an extract script hardcodes to
    the newest epoch the (shorter) training run actually saved."""
    saved = sorted((f for f in os.listdir(model_dir)
                    if re.fullmatch(pattern, f)
                    # the appearance link NAME matches the pattern —
                    # never pick a previous run's link (self-loop)
                    and not os.path.islink(os.path.join(model_dir, f))),
                   key=lambda f: int(re.findall(r"\d+", f)[-1]))
    assert saved, f"no checkpoint matching {pattern} in {model_dir}"
    link = os.path.join(model_dir, link_name)
    if os.path.lexists(link):
        os.remove(link)
    os.symlink(saved[-1], link)


def _ref_sandbox(work, png_tree):
    """Create the cwd sandbox whose relative paths satisfy every
    hardcoded path in the reference scripts."""
    run = os.path.join(work, "run")
    ntu = os.path.join(work, "ntu")
    tree = os.path.join(ntu, "3DV_ntu60", "reslution")
    os.makedirs(run, exist_ok=True)
    os.makedirs(os.path.join(work, "feat_motion_ref"), exist_ok=True)
    os.makedirs(os.path.join(work, "feat_app_ref"), exist_ok=True)
    os.makedirs(os.path.join(ntu, "ntu60_new2", "model"), exist_ok=True)
    r60 = os.path.join(tree, "Resolution60")
    for sub in ("raw", "others", "app"):
        os.makedirs(os.path.join(r60, sub), exist_ok=True)
    # The shipped generator writes the three resolutions identically
    # (PARITY deviation #2): one real tree, two symlinks.
    for res in ("Resolution30", "Resolution10"):
        p = os.path.join(tree, res)
        if not os.path.exists(p):
            os.symlink("Resolution60", p)
    # extract_motion_feature lists videos from '../ntu/3DV_ntu60/raw'.
    flat_raw = os.path.join(ntu, "3DV_ntu60", "raw")
    if not os.path.exists(flat_raw):
        os.symlink(os.path.join("reslution", "Resolution60", "raw"),
                   flat_raw)
    # generate_NTU walks '../ntu120dataset/<chunk>/nturgb+d_depth_masked'.
    ds = os.path.join(work, "ntu120dataset")
    if not os.path.exists(ds):
        os.symlink(png_tree, ds)
    return run, r60


def ref_phase(args):
    sys.path.insert(0, os.path.join(REF, "generate_data"))
    sys.path.insert(0, os.path.join(REF, "training_code"))
    sys.path.insert(0, os.path.join(REF, "linear_classify"))
    _np_compat()
    _shim_torch_cpu()
    # torchvision isn't installed here; the reference imports
    # `from torchvision import transforms` but never uses it (env pin).
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

    run, r60 = _ref_sandbox(args.work, os.path.abspath(args.png_tree))
    os.chdir(run)

    t0 = time.time()
    # ---- stage 1: generate (PARITY defect #1 patched) -------------------
    if not os.path.exists(os.path.join(r60, "raw", "_GEN_DONE")):
        import generate_NTU as GEN
        GEN.save_path = os.path.join(r60, "raw") + os.sep
        GEN.key_save_path = os.path.join(r60, "others") + os.sep
        GEN.app_save_path = os.path.join(r60, "app") + os.sep
        GEN.main()
        open(os.path.join(r60, "raw", "_GEN_DONE"), "w").close()
    # The ntu60 dataset classes locate their slice boundary by this exact
    # file name (cn3D_data_set.py:59); our synthetic names all sort
    # before it, so it acts as a pure sentinel.
    sent = os.path.join(r60, "raw", "S017C003P020R002A060.npy")
    if not os.path.exists(sent):
        np.save(sent, np.zeros((4, 8), np.float32))
    os.remove(os.path.join(r60, "raw", "_GEN_DONE"))
    t_gen = time.time() - t0

    # The extract scripts mkdir their unused hardcoded '/data/...'
    # save dirs (extract_*_feature.py:157) before save_single_feature is
    # ever called; shim exists() so nothing is created outside the
    # sandbox (the patched save_single_feature never reads those paths).
    _real_exists = os.path.exists
    os.path.exists = (lambda p, _e=_real_exists:
                      True if str(p).startswith("/data/data1/ntu/feature")
                      else _e(p))

    # ---- stage 2: pretrain (motion, then appearance) --------------------
    t0 = time.time()
    import cn3D_data_set as DS
    _patch_app_branch(DS)
    import cn3d_model_conbag as MODELL
    _patch_forward4(MODELL)
    import cn3d_train_motion_GL as TRAIN
    _workers0(TRAIN)
    model_dir = "../ntu/ntu60_new2/model/"
    sys.argv = ["cn3d_train_motion_GL.py", "--batchSize", str(args.batch),
                "--nepoch", str(args.epochs), "--dataset", "ntu60",
                "--save_root_dir", model_dir, "--branch_choose", "0"]
    TRAIN.main()
    # extract loads the fixed names 'corr_GL_.pth' /
    # 'corr_GL_appereance_60.pth'; training saved per-epoch files every
    # 5 epochs — link the newest.
    _link_newest(model_dir, r"corr_GL_\d+\.pth", "corr_GL_.pth")

    import cn3d_train_apperance_GL as TRAIN_APP
    _workers0(TRAIN_APP)
    sys.argv = ["cn3d_train_apperance_GL.py", "--batchSize",
                str(args.batch), "--nepoch", str(args.epochs),
                "--dataset", "ntu60", "--save_root_dir", model_dir,
                "--branch_choose", "1"]
    TRAIN_APP.main()
    _link_newest(model_dir, r"corr_GL_appereance_\d+\.pth",
                 "corr_GL_appereance_60.pth")
    t_train = time.time() - t0

    # ---- stage 3: extract features (both streams) ------------------------
    t0 = time.time()
    import extract_motion_feature as EX
    _workers0(EX)
    feat_dir = os.path.join(args.work, "feat_motion_ref")
    orig_save = EX.save_single_feature
    EX.save_single_feature = (
        lambda feature, save_path, name, num_crop=11:
        orig_save(feature, feat_dir + os.sep, name, num_crop))
    sys.argv = ["extract_motion_feature.py", "--batchSize", str(args.batch),
                "--dataset", "ntu60", "--branch_choose", "0",
                "--SAMPLE_NUM", "512"]
    EX.main()

    import extract_apperance_feature as EXA
    _workers0(EXA)
    feat_app_dir = os.path.join(args.work, "feat_app_ref")
    orig_save_a = EXA.save_single_feature
    EXA.save_single_feature = (
        lambda feature, save_path, name, num_crop=11:
        orig_save_a(feature, feat_app_dir + os.sep, name, num_crop))
    sys.argv = ["extract_apperance_feature.py", "--batchSize",
                str(args.batch), "--dataset", "ntu60",
                "--branch_choose", "1", "--SAMPLE_NUM", "512"]
    EXA.main()
    t_extract = time.time() - t0

    # ---- stage 4: linear probe (PARITY defect #4 patched) ----------------
    t0 = time.time()
    import dataset_of_lin as DL
    import linercls as LIN
    _workers0(LIN)

    def _getitem(self, idx):
        vid_id = self.vid_ids[idx]
        v_name = self.id_to_vidName[vid_id][:20]
        label = self.id_to_action[vid_id]
        m = np.load(os.path.join(self.opt.motion_feature, v_name + ".npy"))
        a = np.load(os.path.join(self.opt.appreance_feature,
                                 v_name + ".npy"))
        return np.concatenate((m, a), 0).astype(np.float32), label

    DL.LIner_NTU.__getitem__ = _getitem
    sys.argv = ["linercls.py", "--batchSize", str(args.probe_batch),
                "--nepoch", str(args.probe_epochs), "--dataset", "ntu60",
                "--root_path", os.path.join(r60, "raw") + os.sep,
                "--motion_feature", feat_dir,
                "--appreance_feature", feat_app_dir]
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
    assert tops, "no test top1 lines in reference probe output"
    t_probe = time.time() - t0

    out = {
        "framework": "reference_torch_cpu",
        "probe_top1": float(tops[-1]),
        "probe_top1_best": max(float(t) for t in tops),
        "stage_seconds": {"generate": round(t_gen, 1),
                          "pretrain": round(t_train, 1),
                          "extract": round(t_extract, 1),
                          "probe": round(t_probe, 1)},
    }
    with open(os.path.join(args.work, "ref_result.json"), "w") as f:
        json.dump(out, f)
    print("REF RESULT", json.dumps(out))


# --------------------------------------------------------------------------
# facl_tpu-side phase
# --------------------------------------------------------------------------

def _run(cmd, platform=None, **kw):
    print("+", " ".join(cmd), flush=True)
    if platform:
        kw.setdefault("env", {**os.environ, "FACL_PLATFORM": platform})
    subprocess.run(cmd, check=True, **kw)


def facl_phase(args):
    work = args.work
    tree = os.path.join(work, "facl_tree")
    t0 = time.time()
    if not os.path.isdir(os.path.join(tree, "Resolution60", "raw")):
        # CPU-pinned datagen: identical outputs (PRNG-keyed per video);
        # at toy clip shapes the axon tunnel round-trips dominate the
        # TPU path (~20 s/video vs ~10 on this host's CPU core).
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            f"import sys; sys.path.insert(0, {REPO!r})\n"
            "from facl_tpu.config import DatagenConfig\n"
            "from facl_tpu.datagen import generate_dataset\n"
            f"n = generate_dataset({args.png_tree!r}, {tree!r}, "
            "DatagenConfig(), seed=0, clip_batch=4)\n"
            "print('generated', n, 'clips')\n")
        _run([sys.executable, "-c", code], cwd=REPO)
    t_gen = time.time() - t0

    # Pretrain + extract BOTH streams on the process-default backend —
    # the flagship TPU path (sa_impl auto -> pair3, bf16) unless
    # --facl-platform pins otherwise.
    t_train = t_extract = 0.0
    feats = {}
    for stream in ("motion", "appearance"):
        ckpt = os.path.join(work, f"facl_ckpt_{stream}")
        feat = os.path.join(work, f"facl_feat_{stream}")
        feats[stream] = feat
        # Per-stage resume: a killed run (e.g. a TPU-tunnel outage)
        # keeps its finished checkpoints/features; only missing stages
        # re-run.
        done = lambda d, suffix: (os.path.isdir(d) and any(
            f.endswith(suffix) for f in os.listdir(d)))
        t0 = time.time()
        if not done(ckpt, ".msgpack"):
            _run([sys.executable, "-m", "facl_tpu.cli.pretrain", "--root",
                  tree, "--stream", stream, "--epochs", str(args.epochs),
                  "--batch-size", str(args.batch), "--out", ckpt],
                 cwd=REPO, platform=args.facl_platform)
        t_train += time.time() - t0
        t0 = time.time()
        if not done(feat, ".npy"):
            _run([sys.executable, "-m", "facl_tpu.cli.extract", "--root",
                  tree, "--stream", stream, "--checkpoint", ckpt,
                  "--out", feat, "--batch-size", str(args.batch)],
                 cwd=REPO, platform=args.facl_platform)
        t_extract += time.time() - t0

    # Probe: motion + appearance features combined, as the reference
    # probe does (dataset_of_lin.py:94-107 intent).
    t0 = time.time()
    env = dict(os.environ)
    if args.facl_platform:
        env["FACL_PLATFORM"] = args.facl_platform
    res = subprocess.run(
        [sys.executable, "-m", "facl_tpu.cli.probe", "--root", tree,
         "--motion-features", feats["motion"],
         "--appearance-features", feats["appearance"],
         "--epochs", str(args.probe_epochs)],
        cwd=REPO, check=True, capture_output=True, text=True, env=env)
    print(res.stdout[-2000:])
    tops = re.findall(r"top1=([\d.]+)", res.stdout + res.stderr)
    assert tops, f"no top1 in facl probe output: {res.stdout[-500:]}"
    t_probe = time.time() - t0

    out = {
        "framework": "facl_tpu",
        "platform": args.facl_platform or "default (flagship TPU path)",
        "probe_top1": float(tops[-1]),
        "probe_top1_best": max(float(t) for t in tops),
        "stage_seconds": {"generate": round(t_gen, 1),
                          "pretrain": round(t_train, 1),
                          "extract": round(t_extract, 1),
                          "probe": round(t_probe, 1)},
    }
    with open(os.path.join(work, "facl_result.json"), "w") as f:
        json.dump(out, f)
    print("FACL RESULT", json.dumps(out))


# --------------------------------------------------------------------------
# orchestration
# --------------------------------------------------------------------------

def _count_xview_test(png_tree):
    """Number of xview TEST videos (camera C001; cn3D_data_set.py:821 —
    train cameras are {2, 3}) in the PNG tree: the probe's test n."""
    n = 0
    for setup in os.listdir(png_tree):
        d = os.path.join(png_tree, setup, "nturgb+d_depth_masked")
        if os.path.isdir(d):
            n += sum(1 for v in os.listdir(d) if "C001" in v)
    return n


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--work", required=True, help="sandbox dir")
    p.add_argument("--videos", type=int, default=128)
    p.add_argument("--seed", type=int, default=0,
                   help="(single-phase invocations) the seed in play")
    p.add_argument("--seeds", default=None,
                   help="comma-separated seeds; one full two-arm run "
                        "each (default: just --seed)")
    p.add_argument("--epochs", type=int, default=11,
                   help="pretrain epochs (reference saves every 5)")
    p.add_argument("--probe-epochs", type=int, default=21,
                   help="probe epochs (the reference evaluates only "
                        "after epoch 15, linercls.py:139)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--probe-batch", type=int, default=4)
    p.add_argument("--out", default="crossframework_e2e.json")
    p.add_argument("--phase", choices=["all", "ref", "facl"], default="all")
    p.add_argument("--facl-platform", default=None,
                   help="pin the facl CLIs' JAX platform (e.g. cpu); "
                        "default: the process default — the flagship "
                        "TPU path (pair3/bf16)")
    p.add_argument("--png-tree", default=None)
    args = p.parse_args()
    os.makedirs(args.work, exist_ok=True)
    if args.png_tree is None:
        args.png_tree = os.path.join(args.work, "png_tree")

    if args.phase == "ref":
        return ref_phase(args)
    if args.phase == "facl":
        return facl_phase(args)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from train_synthetic_probe import wilson

    seeds = ([int(s) for s in args.seeds.split(",")]
             if args.seeds else [args.seed])
    per_seed = {}
    for seed in seeds:
        sdir = os.path.join(args.work, f"seed{seed}")
        os.makedirs(sdir, exist_ok=True)
        png_tree = os.path.join(sdir, "png_tree")
        # stage 0: one PNG tree for both frameworks.
        if not os.path.isdir(png_tree):
            sys.path.insert(0, REPO)
            from facl_tpu.data.synthetic import write_synthetic_png_tree
            names = write_synthetic_png_tree(png_tree, args.videos, seed)
            print(f"seed {seed}: wrote {len(names)} synthetic PNG videos")

        base = [sys.executable, os.path.abspath(__file__),
                "--work", sdir, "--png-tree", png_tree,
                ] + (["--facl-platform", args.facl_platform]
                     if args.facl_platform else []) + [
                "--videos", str(args.videos), "--epochs", str(args.epochs),
                "--probe-epochs", str(args.probe_epochs),
                "--batch", str(args.batch),
                "--probe-batch", str(args.probe_batch),
                "--seed", str(seed)]
        # Each (seed, arm) is cached by its result file: a rerun resumes.
        if not os.path.exists(os.path.join(sdir, "facl_result.json")):
            _run(base + ["--phase", "facl"])
        if not os.path.exists(os.path.join(sdir, "ref_result.json")):
            _run(base + ["--phase", "ref"])

        with open(os.path.join(sdir, "ref_result.json")) as f:
            ref = json.load(f)
        with open(os.path.join(sdir, "facl_result.json")) as f:
            facl = json.load(f)
        per_seed[seed] = {"reference_torch_cpu": ref, "facl_tpu": facl,
                          "n_test": _count_xview_test(png_tree)}

    # Pool the final-epoch top-1 over seeds per arm (each seed is an
    # independent dataset + run); Wilson 95% CI on the pooled test n.
    arms = {}
    for arm in ("reference_torch_cpu", "facl_tpu"):
        k = sum(int(round(per_seed[s][arm]["probe_top1"]
                          * per_seed[s]["n_test"] / 100.0))
                for s in seeds)
        n = sum(per_seed[s]["n_test"] for s in seeds)
        lo, hi = wilson(k, n)
        arms[arm] = {
            "pooled_top1": round(100.0 * k / n, 2),
            "pooled_ci95": [round(lo, 2), round(hi, 2)],
            "pooled_n": n,
            "per_seed_top1": {str(s): per_seed[s][arm]["probe_top1"]
                              for s in seeds},
            "per_seed_top1_best": {
                str(s): per_seed[s][arm]["probe_top1_best"]
                for s in seeds},
        }

    result = {
        "workload": {"videos_per_seed": args.videos,
                     "split": "ntu60 xview",
                     "streams": "motion + appearance features combined "
                                "in the probe (dataset_of_lin.py:94-107)",
                     "pretrain_epochs": args.epochs,
                     "probe_epochs": args.probe_epochs,
                     "batch": args.batch, "probe_batch": args.probe_batch,
                     "seeds": seeds,
                     "facl_platform": args.facl_platform
                     or "default (flagship TPU path: pair3/bf16)"},
        "arms": arms,
        "per_seed": {str(s): per_seed[s] for s in seeds},
        "delta_top1": round(arms["facl_tpu"]["pooled_top1"]
                            - arms["reference_torch_cpu"]["pooled_top1"],
                            2),
        "chance_top1": 10.0,
        "note": ("five-stage flow (generate -> pretrain both streams -> "
                 "extract both -> probe on combined features) run in "
                 "BOTH frameworks from the SAME synthetic PNG depth "
                 "tree and xview split, one independent tree+run per "
                 "seed; facl arm on its process-default backend "
                 "(flagship TPU path unless pinned). probe_top1 = "
                 "final-epoch checkpoint (pooled); *_best = best "
                 "eval epoch, reported per seed only."),
    }
    out_path = os.path.join(REPO, args.out)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
