"""What does the collapsed 504-video embedding actually encode?

Trains the motion stream briefly on an existing synthetic tree, then
ridge-regresses the TEST-split global embeddings against every known
per-clip generative factor (class angle, within-class jitters, per-blob
geometry) and reports R^2 per factor plus a linear class probe — the
direct answer to "which nuisance did instance discrimination align to"
(BASELINE.md round-5 scale note).

Usage: DF_ROOT=/tmp/sp_q_trees/seed0 DF_EPOCHS=5 python tools/diag_factors.py
Env: DF_ROOT (tree), DF_EPOCHS (default 5), DF_BATCH (16), DF_QUANT
("1" if the tree used the quantized instance style — factor replay must
match the generator's rng draw order), DF_SEED (0).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def clip_factors(clip_rng: np.random.Generator, action: int,
                 num_actions: int, H: int, W: int, quant: bool) -> dict:
    """Replay data/synthetic.py::synthetic_depth_clip's rng draw order
    (instance style, class-conditioned) and return the drawn factors."""
    out = {}
    for b in range(2):
        h = int(clip_rng.integers(H // 4, H // 2))
        w = int(clip_rng.integers(W // 10, W // 5))
        depth = float(clip_rng.uniform(1500, 3500))
        ang = (2.0 * np.pi * (action - 1) / max(num_actions, 1)
               + float(clip_rng.uniform(-0.15, 0.15)))
        speed = (3.0 if action % 2 else 6.0) * float(
            clip_rng.uniform(0.85, 1.15))
        x0 = int(clip_rng.integers(W // 4, max(W // 4 + 1, W // 2)))
        y0 = int(clip_rng.integers(H // 4, max(H // 4 + 1, H // 2)))
        if quant:
            depth = float(clip_rng.choice([1800.0, 2400.0, 3000.0]))
            h = int(clip_rng.choice([H // 4, 3 * H // 8, H // 2 - 1]))
            w = int(clip_rng.choice([W // 10, W // 7, W // 5]))
            x0 = int(clip_rng.choice([W // 4, 3 * W // 8, W // 2 - 1]))
            y0 = int(clip_rng.choice([H // 4, 3 * H // 8, H // 2 - 1]))
        out.update({f"b{b}_h": h, f"b{b}_w": w, f"b{b}_depth": depth,
                    f"b{b}_ang_jit": ang - 2.0 * np.pi * (action - 1)
                    / max(num_actions, 1),
                    f"b{b}_speed": speed, f"b{b}_x0": x0, f"b{b}_y0": y0})
    out["class_cos"] = np.cos(2.0 * np.pi * (action - 1) / num_actions)
    out["class_sin"] = np.sin(2.0 * np.pi * (action - 1) / num_actions)
    out["parity"] = action % 2
    return out


def ridge_r2_multi(X: np.ndarray, Y: np.ndarray, lam: float = 1e-1
                   ) -> np.ndarray:
    """Held-out R^2 of ridge Y~X per column of Y (2-fold; D can exceed
    n, so in-sample R^2 would be vacuously ~1). Kernel (dual) form: the
    n x n system solves once per fold for every target column."""
    n = len(Y)
    half = n // 2
    r2s = np.zeros((2, Y.shape[1]))
    for fi, (tr, te) in enumerate(((slice(0, half), slice(half, n)),
                                   (slice(half, n), slice(0, half)))):
        mu, sd = X[tr].mean(0), np.maximum(X[tr].std(0), 1e-9)
        Xtr, Xte = (X[tr] - mu) / sd, (X[te] - mu) / sd
        ym = Y[tr].mean(0)
        ntr = Xtr.shape[0]
        K = Xtr @ Xtr.T + lam * ntr * np.eye(ntr)
        alpha = np.linalg.solve(K, Y[tr] - ym)          # (ntr, F)
        pred = Xte @ (Xtr.T @ alpha) + ym
        num = ((Y[te] - pred) ** 2).sum(0)
        den = np.maximum(((Y[te] - Y[te].mean(0)) ** 2).sum(0), 1e-12)
        r2s[fi] = 1.0 - num / den
    return r2s.mean(0)


def class_probe_acc(X: np.ndarray, y: np.ndarray, epochs: int = 200,
                    lr: float = 0.5) -> float:
    """Multinomial logistic probe (L2-normalized X), in-sample top-1."""
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-9)
    K = int(y.max()) + 1
    W = np.zeros((X.shape[1], K))
    Y = np.eye(K)[y]
    for _ in range(epochs):
        z = Xn @ W
        z -= z.max(1, keepdims=True)
        p = np.exp(z)
        p /= p.sum(1, keepdims=True)
        W -= lr * Xn.T @ (p - Y) / len(y)
    return float((np.argmax(Xn @ W, 1) == y).mean() * 100)


def main() -> None:
    import dataclasses

    import jax

    from facl_tpu.config import Config
    from facl_tpu.data import CropLoader, NTUPointDataset
    from facl_tpu.train import Trainer
    from facl_tpu.train.trainer import make_eval_step

    root = os.environ["DF_ROOT"]
    epochs = int(os.environ.get("DF_EPOCHS", "5"))
    batch = int(os.environ.get("DF_BATCH", "16"))
    quant = os.environ.get("DF_QUANT", "1") == "1"
    seed = int(os.environ.get("DF_SEED", "0"))

    cfg = Config()
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, root=root,
                                               stream="motion"),
                      train=dataclasses.replace(cfg.train,
                                                batch_size=batch))
    ds = NTUPointDataset(root, cfg.data, train=True)
    steps = max(1, len(ds) // batch)
    key = jax.random.PRNGKey(seed)
    trainer = Trainer(cfg, steps_per_epoch=steps)
    loader = CropLoader(ds, batch, key)
    sample = next(iter(loader.epoch(0)))[0]
    state = trainer.init_state(jax.random.PRNGKey(seed), sample)
    snaps = {0: jax.tree.map(np.asarray, {"params": state.params,
                                          "batch_stats": state.batch_stats})}
    for ep in range(epochs):
        state, metrics = trainer.run_epoch(
            state, (b for b, _, _ in loader.epoch(ep)), ep,
            jax.random.fold_in(key, ep))
        print(f"# epoch {ep}: loss={metrics['loss']:.1f}", flush=True)
        if ep + 1 in (1, epochs):
            snaps[ep + 1] = jax.tree.map(
                np.asarray, {"params": state.params,
                             "batch_stats": state.batch_stats})

    # All generated video names in tree order -> index for rng replay.
    gen_names = sorted(
        os.path.splitext(f)[0]
        for f in os.listdir(os.path.join(root, "Resolution60", "raw")))
    name_idx = {n: i for i, n in enumerate(gen_names)}

    eval_step = make_eval_step(trainer.model, trainer.cfg,
                               grouping=trainer.g_cfg)
    dse = NTUPointDataset(root, cfg.data, train=False)
    le = CropLoader(dse, min(batch, len(dse)), jax.random.PRNGKey(seed),
                    shuffle=False, drop_last=False)
    cached = [(crops, bnames) for crops, _, bnames in le.epoch(0)]
    labels = {dse.names[i]: dse.infos[i].label for i in dse.indices}

    from facl_tpu.train.extract import features_from_outputs

    H, W = 128, 160            # write_synthetic_dataset's image_shape
    G = trainer.cfg.model.num_crops
    report = {}
    for ck, variables in snaps.items():
        embs, names = [], []
        for crops, bnames in cached:
            x, xg = eval_step(variables, crops)
            # The probe's own feature layout: 10 local crops + global,
            # (B, 11*512) — the collapse question must be asked of the
            # features the probe actually consumes.
            fb = features_from_outputs(np.asarray(x), np.asarray(xg), G)
            embs.append(fb[: len(bnames)])
            names.extend(bnames)
        X = np.concatenate(embs)[: len(names)]
        y = np.array([labels[n] for n in names])
        facs = [clip_factors(np.random.default_rng(seed * 1000
                                                   + name_idx[n]),
                             int(n[-3:]), 10, H, W, quant)
                for n in names]
        keys = list(facs[0])
        Y = np.array([[f[k] for k in keys] for f in facs], np.float64)
        r2v = ridge_r2_multi(X.astype(np.float64), Y)
        r2 = {k: round(float(v), 3) for k, v in zip(keys, r2v)}
        fn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-9)
        cosm = float((fn @ fn.T)[np.triu_indices(len(X), 1)].mean())
        report[ck] = {"factor_r2": r2,
                      "class_probe_top1": round(class_probe_acc(X, y), 1),
                      "mean_pairwise_cos": round(cosm, 3)}
        print(f"# ck{ck}: {json.dumps(report[ck])}", flush=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
