"""Feature extraction entry point — the equivalent of
extract_{apperance,motion}_feature.py (one script + ``--stream``).

Usage:
  python -m facl_tpu.cli.extract --root <tree> --stream motion \
      --checkpoint checkpoints/motion --out features/motion
"""
from __future__ import annotations

import argparse
import logging

import jax

from facl_tpu.cli.pretrain import add_common_args, build_config
from facl_tpu.data import CropLoader, NTUPointDataset
from facl_tpu.train import Trainer, restore_latest
from facl_tpu.train.extract import extract_features
from facl_tpu.utils.logging import setup_logging


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args(argv)

    setup_logging()
    log = logging.getLogger("extract")
    cfg = build_config(args)

    from facl_tpu.train import latest_checkpoint
    if latest_checkpoint(args.checkpoint) is None:
        raise SystemExit(f"no checkpoint found in {args.checkpoint!r} "
                         "(expected index.json written by pretrain)")

    # Extraction runs on BOTH splits, sequentially, without shuffling
    # (extract_apperance_feature.py:112-136,163,192). One Trainer / one
    # restore / one eval_step compile is shared by both splits — compiles
    # cost 60-120 s each on remote TPU backends.
    from facl_tpu.train.trainer import make_eval_step

    mesh = None
    shard = None
    if getattr(args, "mesh", False):
        from facl_tpu.parallel import batch_sharding, make_mesh
        mesh = make_mesh(cfg.mesh)
        shard = batch_sharding(mesh, batch_axis=1)
        log.info("mesh: dp=%d mp=%d", mesh.shape["dp"], mesh.shape["mp"])

    trainer = None
    eval_step = None
    restored = None
    for split, train in (("train", True), ("test", False)):
        ds = NTUPointDataset(args.root, cfg.data, train=train)
        if len(ds) == 0:
            log.warning("empty %s split", split)
            continue
        # Ragged/tail batches are padded to a shardable size by the
        # loader (pad rows discarded at write time — keyed by names).
        bs = min(args.batch_size, len(ds))
        loader = CropLoader(ds, bs,
                            jax.random.PRNGKey(args.seed), shuffle=False,
                            drop_last=False, sharding=shard)
        if trainer is None:
            trainer = Trainer(cfg, steps_per_epoch=1, mesh=mesh)
            sample = next(iter(loader.epoch(0)))[0]
            state = trainer.init_state(jax.random.PRNGKey(args.seed), sample)
            restored = restore_latest(args.checkpoint, state)
            if restored is None:
                raise SystemExit(f"no checkpoint in {args.checkpoint}")
            # trainer.cfg, not cfg: the Trainer resolved sa_impl="auto" /
            # channels_first=None to concrete values and the eval step's
            # grouping layout must match the model's.
            eval_step = make_eval_step(trainer.model, trainer.cfg,
                                       grouping=trainer.g_cfg, mesh=mesh)
        feats = extract_features(trainer.model, restored.variables,
                                 trainer.cfg,
                                 loader.epoch(0), out_dir=args.out,
                                 eval_step=eval_step)
        log.info("%s split: wrote %d feature files to %s", split,
                 len(feats), args.out)


if __name__ == "__main__":
    main()
