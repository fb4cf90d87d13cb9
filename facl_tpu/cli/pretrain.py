"""Contrastive pretraining entry point — the equivalent of
cn3d_train_{motion,apperance}_GL.py (which are byte-identical except for
data dir / branch / checkpoint name; here one script + ``--stream``).

Usage:
  python -m facl_tpu.cli.pretrain --root <generated-tree> --stream motion \
      --epochs 100 --batch-size 64 --out checkpoints/motion
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os

import jax
import numpy as np

from facl_tpu.config import Config
from facl_tpu.data import CropLoader, NTUPointDataset
from facl_tpu.train import Trainer, restore_latest, save_checkpoint
from facl_tpu.utils.logging import setup_logging


def add_common_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--root", required=True, help="generated point-cloud tree")
    p.add_argument("--stream", choices=("motion", "appearance"),
                   default="motion")
    p.add_argument("--dataset", choices=("ntu60", "ntu120"), default="ntu60")
    p.add_argument("--protocol", choices=("xsub", "xview", "xset"),
                   default="xview")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--dtype", choices=("bfloat16", "float32"),
                   default="bfloat16",
                   help="encoder compute dtype; bfloat16 is the production "
                        "TPU config (~1.6x faster), float32 is strict "
                        "reference parity")
    p.add_argument("--config", help="JSON config file overriding defaults")
    from facl_tpu.models import SA_IMPLS
    p.add_argument("--sa-impl", choices=SA_IMPLS, default=None,
                   help="SA-stage implementation (default: keep the config "
                        "value; the config default 'auto' picks the "
                        "flagship paired-row Pallas path wherever it is "
                        "GSPMD-safe — see models.resolve_model_config)")
    p.add_argument("--mesh", action="store_true",
                   help="run over a device mesh (cfg.mesh: dp x mp; "
                        "dp=-1 uses all devices). Batch is sharded over "
                        "dp; the wide FC kernels over mp when mp>1. "
                        "Batch size must divide by dp.")


def build_config(args) -> Config:
    cfg = Config()
    if getattr(args, "config", None):
        with open(args.config) as f:
            cfg = Config.from_json(f.read())
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, root=args.root,
                                 stream=args.stream, dataset=args.dataset,
                                 protocol=args.protocol),
        train=dataclasses.replace(cfg.train, batch_size=args.batch_size),
    )
    if getattr(args, "dtype", None):
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, compute_dtype=args.dtype))
    if getattr(args, "sa_impl", None):
        # Forcing the impl from the CLI re-opens channels_first to auto so
        # the grouping layout follows the chosen path.
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, sa_impl=args.sa_impl, channels_first=None))
    return cfg


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--out", default=None,
                   help="checkpoint dir (default: cfg.train.checkpoint_dir)")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--resume", action="store_true")
    args = p.parse_args(argv)

    setup_logging()
    log = logging.getLogger("pretrain")
    cfg = build_config(args)
    if args.out is None:
        args.out = cfg.train.checkpoint_dir

    ds = NTUPointDataset(args.root, cfg.data, train=True)
    if len(ds) < args.batch_size:
        raise SystemExit(
            f"pretrain: the train split has {len(ds)} video(s) — fewer "
            f"than --batch-size {args.batch_size} (batches are "
            "drop_last). Reduce --batch-size or generate more videos.")
    steps_per_epoch = max(1, len(ds) // args.batch_size)
    log.info("train videos=%d steps/epoch=%d devices=%s",
             len(ds), steps_per_epoch, jax.devices())

    mesh = None
    if getattr(args, "mesh", False):
        from facl_tpu.parallel import batch_sharding, make_mesh
        mesh = make_mesh(cfg.mesh)
        if args.batch_size % mesh.shape["dp"]:
            raise SystemExit(
                f"--mesh: batch size {args.batch_size} must divide by "
                f"dp={mesh.shape['dp']}")
        log.info("mesh: dp=%d mp=%d", mesh.shape["dp"], mesh.shape["mp"])

    key = jax.random.PRNGKey(args.seed)
    loader = CropLoader(
        ds, args.batch_size, key,
        sharding=(batch_sharding(mesh, batch_axis=1)
                  if mesh is not None else None))

    if cfg.model.name == "slow_fast":
        # Plain GSPMD data parallelism: the slow/fast jit step consumes
        # the dp-sharded batches directly (parity asserted by
        # tests/test_sharding.py::test_slowfast_sharded_step...).
        _run_slowfast(args, cfg, loader, steps_per_epoch, log)
        return

    trainer = Trainer(cfg, steps_per_epoch, mesh=mesh)

    sample = next(iter(loader.epoch(0)))[0]
    state = trainer.init_state(jax.random.PRNGKey(args.seed), sample)
    start_epoch = 0
    if args.resume:
        restored = restore_latest(args.out, state)
        if restored is not None:
            state = restored
            start_epoch = int(state.step) // steps_per_epoch
            log.info("resumed at epoch %d (step %d)", start_epoch,
                     int(state.step))
    if mesh is not None:
        from facl_tpu.parallel import shard_train_state
        state = shard_train_state(mesh, state)

    for epoch in range(start_epoch, args.epochs):
        batches = (b for b, _, _ in loader.epoch(epoch))
        state, metrics = trainer.run_epoch(
            state, batches, epoch, jax.random.fold_in(key, epoch),
            log_fn=lambda m: log.info("%s", json.dumps(m)))
        log.info("epoch %d done: %s", epoch,
                 {k: round(v, 4) for k, v in metrics.items()})
        if epoch % cfg.train.checkpoint_every_epochs == 0:
            path = save_checkpoint(args.out, state, epoch)
            log.info("checkpoint %s", path)
    save_checkpoint(args.out, state, args.epochs - 1)


def _run_slowfast(args, cfg, loader, steps_per_epoch, log) -> None:
    """Train the two-pathway encoder (``"name": "slow_fast"`` in --config).

    The reference defines PointNet_Slow_Fast but never wired a driver
    (cn3d_model_conbag.py:237-387); SlowFastTrainer supplies the pair-
    InfoNCE pathway-alignment recipe. Crops are flattened to (G*B, N, C)
    single clouds — each crop is one training sample for both pathways.
    """
    from facl_tpu.train import save_checkpoint
    from facl_tpu.train.slowfast_trainer import SlowFastTrainer

    trainer = SlowFastTrainer(cfg, steps_per_epoch)
    key = jax.random.PRNGKey(args.seed)

    sample = next(iter(loader.epoch(0)))[0]
    G, B, N, C = sample.shape
    state = trainer.init_state(jax.random.PRNGKey(args.seed),
                               sample.reshape(G * B, N, C))
    for epoch in range(args.epochs):
        losses = []
        for batch, _, _ in loader.epoch(epoch):
            key, sub = jax.random.split(key)
            g, b, n, c = batch.shape
            state, metrics = trainer.step_fn(
                state, batch.reshape(g * b, n, c), sub)
            losses.append(metrics["loss"])
        mean = float(np.mean([float(x) for x in losses])) if losses else 0.0
        log.info("slow_fast epoch %d done: loss=%.4f", epoch, mean)
        if epoch % cfg.train.checkpoint_every_epochs == 0:
            log.info("checkpoint %s", save_checkpoint(args.out, state, epoch))
    save_checkpoint(args.out, state, args.epochs - 1)


if __name__ == "__main__":
    main()
