"""Controlled bisection of the synthetic-probe learning regression.

VERDICT r4 item 1: hold the DATA fixed (one generated tree) and vary only
the compute path — {sa_impl} x {compute_dtype} on one platform — so a
failing arm isolates a kernel/precision bug while all-arms-failing points
at the objective/data. Each arm trains the MOTION stream for a few epochs,
snapshots at checkpoints, and reports per-checkpoint:

* linear-probe top-1 on motion-only features (trained vs the epoch-0
  frozen-random control — the regression's signature is trained < control);
* embedding-collapse stats on the test split's global embeddings
  (mean pairwise cosine -> 1.0 == constant prediction) and per-crop rows;
* BatchNorm running-stat health (min/max running var, fraction < 1e-6,
  max |running mean|) — eval mode divides by rsqrt(running_var + eps), so
  degenerate running stats corrupt extraction while train-mode loss looks
  healthy.

Env knobs: DC_TREE (dataset root; must exist), DC_ARMS
("impl:dtype,..."), DC_EPOCHS (15), DC_CHECKPOINTS ("0,5,15"), DC_BATCH
(16), DC_PLATFORM ("" = process default; "cpu" pins CPU), DC_OUT
(json path). Run arms needing a different platform as separate processes —
jax's backend is process-global.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def feature_stats(f: np.ndarray) -> dict:
    """Collapse signature on (B, D) features: pairwise cosine ~1 and
    per-dim std ~0 mean every video maps to the same vector."""
    f = np.asarray(f, np.float32)
    norms = np.linalg.norm(f, axis=1)
    fn = f / np.maximum(norms[:, None], 1e-9)
    cos = fn @ fn.T
    iu = np.triu_indices(f.shape[0], 1)
    return {
        "mean_norm": round(float(norms.mean()), 4),
        "std_norm": round(float(norms.std()), 4),
        "mean_dim_std": round(float(f.std(axis=0).mean()), 6),
        "mean_pairwise_cos": round(float(cos[iu].mean()), 4),
        "min_pairwise_cos": round(float(cos[iu].min()), 4),
        "nonfinite_frac": round(float((~np.isfinite(f)).mean()), 6),
    }


def bn_health(batch_stats) -> dict:
    import jax
    flat = jax.tree_util.tree_leaves_with_path(batch_stats)
    vs, ms = [], []
    for path, leaf in flat:
        p = jax.tree_util.keystr(path).lower()
        arr = np.asarray(leaf, np.float32).ravel()
        if "var" in p:
            vs.append(arr)
        elif "mean" in p:
            ms.append(arr)
    out = {}
    if vs:
        allv = np.concatenate(vs)
        out.update(var_min=float(allv.min()), var_max=float(allv.max()),
                   var_frac_tiny=round(float((allv < 1e-6).mean()), 4),
                   var_nonfinite=int((~np.isfinite(allv)).sum()))
    if ms:
        allm = np.concatenate(ms)
        out.update(mean_absmax=float(np.abs(allm).max()),
                   mean_nonfinite=int((~np.isfinite(allm)).sum()))
    return out


def run_arm(tree: str, sa_impl: str, dtype: str, epochs: int,
            checkpoints, batch: int) -> dict:
    import jax

    from facl_tpu.config import Config, ProbeConfig
    from facl_tpu.data import CropLoader, NTUPointDataset
    from facl_tpu.eval.probe import LinearProbeTrainer
    from facl_tpu.train import Trainer
    from facl_tpu.train.extract import features_from_outputs
    from facl_tpu.train.trainer import make_eval_step

    cfg = Config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, sa_impl=sa_impl,
                                  compute_dtype=dtype),
        data=dataclasses.replace(cfg.data, root=tree, stream="motion"),
        train=dataclasses.replace(cfg.train, batch_size=batch))
    ds = NTUPointDataset(tree, cfg.data, train=True)
    steps = max(1, len(ds) // batch)
    key = jax.random.PRNGKey(0)
    print(f"# arm {sa_impl}/{dtype}: {len(ds)} train videos, "
          f"{steps} steps/epoch", flush=True)
    trainer = Trainer(cfg, steps_per_epoch=steps)
    loader = CropLoader(ds, batch, key)
    sample = next(iter(loader.epoch(0)))[0]
    print(f"# arm {sa_impl}/{dtype}: first batch loaded", flush=True)
    state = trainer.init_state(jax.random.PRNGKey(0), sample)
    print(f"# arm {sa_impl}/{dtype}: state initialized", flush=True)
    snap = lambda s: jax.tree.map(np.asarray, {
        "params": s.params, "batch_stats": s.batch_stats})
    snaps = {0: snap(state)}
    losses = []
    t0 = time.perf_counter()
    for ep in range(epochs):
        state, metrics = trainer.run_epoch(
            state, (b for b, _, _ in loader.epoch(ep)), ep,
            jax.random.fold_in(key, ep))
        losses.append(round(float(metrics["loss"]), 1))
        if ep == 0:
            print(f"# arm {sa_impl}/{dtype}: epoch 0 done "
                  f"({time.perf_counter() - t0:.0f}s) "
                  f"loss={losses[-1]}", flush=True)
        if ep + 1 in checkpoints:
            snaps[ep + 1] = snap(state)
    print(f"# arm {sa_impl}/{dtype}: {epochs} epochs in "
          f"{time.perf_counter() - t0:.0f}s losses={losses}", flush=True)

    eval_step = make_eval_step(trainer.model, trainer.cfg,
                               grouping=trainer.g_cfg)
    G = trainer.cfg.model.num_crops
    splits = {}
    for split, train in (("train", True), ("test", False)):
        dse = NTUPointDataset(tree, cfg.data, train=train)
        le = CropLoader(dse, min(batch, len(dse)), jax.random.PRNGKey(0),
                        shuffle=False, drop_last=False)
        cached = [(crops, bnames) for crops, _, bnames in le.epoch(0)]
        labels = {dse.names[i]: dse.infos[i].label for i in dse.indices}
        splits[split] = (cached, labels)

    result = {"arm": f"{sa_impl}/{dtype}", "losses": losses,
              "checkpoints": {}}
    for ck in sorted(snaps):
        variables = snaps[ck]
        ck_out = {"bn": bn_health(variables["batch_stats"])}
        feats = {}
        for split, (cached, labels) in splits.items():
            f = {}
            for crops, bnames in cached:
                x, xg = eval_step(variables, crops)
                fb = features_from_outputs(np.asarray(x), np.asarray(xg), G)
                for i, n in enumerate(bnames):
                    f[n] = fb[i]
            feats[split] = (f, labels)
        # Collapse stats on the test split's GLOBAL embedding (last D
        # of the 11xD per-video feature) and on the full 11xD rows.
        ftest, ltest = feats["test"]
        rows = np.stack(list(ftest.values()))
        D = rows.shape[1] // (G + 1)
        ck_out["global_emb"] = feature_stats(rows[:, -D:])
        ck_out["full_rows"] = feature_stats(rows)
        # Motion-only linear probe (the regression reproduces per-stream).
        trf = np.stack(list(feats["train"][0].values()))
        trl = np.asarray([feats["train"][1][n]
                          for n in feats["train"][0]], np.int32)
        tef = rows
        tel = np.asarray([ltest[n] for n in ftest], np.int32)
        n_classes = int(max(trl.max(), tel.max())) + 1
        pcfg = ProbeConfig(num_classes=n_classes, num_epochs=40,
                           eval_after_epoch=13,
                           batch_size=min(16, trf.shape[0]))
        probe = LinearProbeTrainer(pcfg, feature_dim=trf.shape[1], seed=1)
        best = probe.fit(trf, trl, tef, tel, rng=np.random.default_rng(1))
        ck_out["probe_top1"] = round(best["top1"], 2)
        result["checkpoints"][ck] = ck_out
        print(f"# arm {sa_impl}/{dtype} ck {ck}: top1={best['top1']:.1f}% "
              f"cos={ck_out['global_emb']['mean_pairwise_cos']} "
              f"bn_var_tiny={ck_out['bn'].get('var_frac_tiny')}", flush=True)
    return result


def main() -> None:
    tree = os.environ.get("DC_TREE", "")
    if not tree or not os.path.isdir(tree):
        raise SystemExit(f"DC_TREE {tree!r} is not a directory")
    arms = [a.split(":") for a in os.environ.get(
        "DC_ARMS", "pair3:bfloat16,reference:bfloat16,"
        "pair3:float32,reference:float32").split(",")]
    epochs = int(os.environ.get("DC_EPOCHS", "15"))
    checkpoints = sorted({0} | {int(e) for e in os.environ.get(
        "DC_CHECKPOINTS", "0,5,15").split(",")})
    batch = int(os.environ.get("DC_BATCH", "16"))
    platform = os.environ.get("DC_PLATFORM", "")

    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    out = {"tree": tree, "platform": platform or "default",
           "epochs": epochs, "arms": []}
    for impl, dtype in arms:
        out["arms"].append(run_arm(tree, impl, dtype, epochs,
                                   checkpoints, batch))
    path = os.environ.get("DC_OUT", "/tmp/diag_collapse.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
