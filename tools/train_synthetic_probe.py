"""End-to-end UNSUPERVISED LEARNING demonstration on synthetic data.

The reference's purpose terminates in a linear-probe top-1 on NTU
(linear_classify/linercls.py:150), which is license-gated here. This
script produces the strongest obtainable stand-in: class-conditioned
synthetic depth clips (each action id = a distinct motion signature,
data/synthetic.py) run through the REAL five-stage pipeline — datagen ->
contrastive pretrain x2 streams -> extract x2 -> linear probe — and the
probe must beat chance by a wide margin purely from unsupervised
contrastive embeddings. A frozen-encoder control (probe on an UNTRAINED
encoder's features) isolates how much the pretraining itself learned.

Writes ``synth_probe.json`` at the repo root; prints one JSON line.

Env knobs: SP_VIDEOS (default 96), SP_ACTIONS (5), SP_EPOCHS (12),
SP_BATCH (8), SP_PROBE_EPOCHS (40), SP_SEED (0).
"""
from __future__ import annotations

import dataclasses
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    from facl_tpu.config import Config, ProbeConfig
    from facl_tpu.data import CropLoader, NTUPointDataset
    from facl_tpu.data.synthetic import write_synthetic_dataset
    from facl_tpu.eval.probe import LinearProbeTrainer, combine_streams
    from facl_tpu.train import Trainer
    from facl_tpu.train.extract import extract_features
    from facl_tpu.train.trainer import make_eval_step

    videos = int(os.environ.get("SP_VIDEOS", "96"))
    actions = int(os.environ.get("SP_ACTIONS", "5"))
    epochs = int(os.environ.get("SP_EPOCHS", "12"))
    batch = int(os.environ.get("SP_BATCH", "8"))
    probe_epochs = int(os.environ.get("SP_PROBE_EPOCHS", "40"))
    seed = int(os.environ.get("SP_SEED", "0"))

    root = tempfile.mkdtemp(prefix="facl_synth_")
    t_start = time.perf_counter()
    try:
        names = write_synthetic_dataset(root, videos, seed=seed,
                                        class_conditioned=True,
                                        num_actions=actions)
        t_gen = time.perf_counter() - t_start
        print(f"# generated {len(names)} class-conditioned videos "
              f"({t_gen:.0f}s)", flush=True)

        feats = {}          # (stream, trained?) -> {split -> dict}
        meta = {}           # split -> (names, labels)
        for stream in ("motion", "appearance"):
            cfg = Config()
            cfg = cfg.replace(
                model=dataclasses.replace(cfg.model,
                                          compute_dtype="bfloat16"),
                data=dataclasses.replace(cfg.data, root=root,
                                         stream=stream),
                train=dataclasses.replace(cfg.train, batch_size=batch))
            ds = NTUPointDataset(root, cfg.data, train=True)
            steps = max(1, len(ds) // batch)
            key = jax.random.PRNGKey(seed)
            trainer = Trainer(cfg, steps_per_epoch=steps)
            loader = CropLoader(ds, batch, key)
            sample = next(iter(loader.epoch(0)))[0]
            state = trainer.init_state(jax.random.PRNGKey(seed), sample)
            # Snapshot to host BEFORE training: the train step donates its
            # input state, so device buffers of the initial params are
            # invalidated by the first step.
            untrained = jax.tree.map(
                np.asarray, {"params": state.params,
                             "batch_stats": state.batch_stats})

            t0 = time.perf_counter()
            for ep in range(epochs):
                state, metrics = trainer.run_epoch(
                    state, (b for b, _, _ in loader.epoch(ep)), ep,
                    jax.random.fold_in(key, ep))
                print(f"# {stream} epoch {ep}: loss={metrics['loss']:.2f} "
                      f"({metrics['clips_per_sec']:.0f} clips/s)",
                      flush=True)
            t_train = time.perf_counter() - t0

            eval_step = make_eval_step(trainer.model, trainer.cfg,
                                       grouping=trainer.g_cfg)
            for split, train in (("train", True), ("test", False)):
                dse = NTUPointDataset(root, cfg.data, train=train)
                le = CropLoader(dse, min(batch, len(dse)),
                                jax.random.PRNGKey(seed), shuffle=False,
                                drop_last=False)
                meta.setdefault(split, ([], []))
                if not meta[split][0]:
                    for i in dse.indices:
                        meta[split][0].append(dse.names[i])
                        meta[split][1].append(dse.infos[i].label)
                for tag, variables in (("trained", state.variables),
                                       ("untrained", untrained)):
                    f = extract_features(trainer.model, variables,
                                         trainer.cfg, le.epoch(0),
                                         eval_step=eval_step)
                    feats[(stream, tag, split)] = f
            print(f"# {stream}: trained {epochs} epochs in {t_train:.0f}s",
                  flush=True)

        out = {"metric": "synthetic_probe_top1", "unit": "%",
               "chance_pct": round(100.0 / actions, 1),
               "videos": videos, "actions": actions,
               "pretrain_epochs": epochs,
               "train_videos": len(meta["train"][0]),
               "test_videos": len(meta["test"][0])}
        for tag in ("trained", "untrained"):
            split_feats = {}
            for split in ("train", "test"):
                f, l = combine_streams(
                    feats[("motion", tag, split)],
                    feats[("appearance", tag, split)],
                    meta[split][0], meta[split][1])
                split_feats[split] = (f, l)
            trf, trl = split_feats["train"]
            tef, tel = split_feats["test"]
            pcfg = ProbeConfig(num_classes=actions,
                               num_epochs=probe_epochs,
                               eval_after_epoch=probe_epochs // 3,
                               batch_size=min(16, trf.shape[0]))
            probe = LinearProbeTrainer(pcfg, feature_dim=trf.shape[1],
                                       seed=1)
            best = probe.fit(trf, trl, tef, tel,
                             rng=np.random.default_rng(1))
            key_name = "value" if tag == "trained" else "untrained_top1"
            out[key_name] = round(best["top1"], 2)
            if tag == "trained":
                out["top5"] = round(best["top5"], 2)
        out["note"] = (
            "linear-probe top-1 on class-conditioned synthetic actions "
            "through the full unsupervised pipeline (datagen -> 2-stream "
            "contrastive pretrain -> extract -> probe); 'untrained_top1' "
            "is the frozen-random-encoder control on identical data.")
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "synth_probe.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
