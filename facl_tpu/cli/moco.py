"""MoCo pretraining entry point — the operational form of the reference's
MoCo scaffold (cn3d_model_conbag.py:429-570; its contrastive body was
shipped commented out). Trains a query encoder against a momentum key
encoder over 2-view SimCLR crops with a ring-buffer negative queue.

Usage:
  python -m facl_tpu.cli.moco --root <tree> --stream motion \
      --epochs 100 --batch-size 64 --out checkpoints/moco
"""
from __future__ import annotations

import argparse
import logging

import jax
import jax.numpy as jnp
import numpy as np

from facl_tpu.cli.pretrain import add_common_args, build_config
from facl_tpu.data import NTUPointDataset, make_simclr_crops, ClipSources
from facl_tpu.train.checkpoint import save_checkpoint
from facl_tpu.train.moco_trainer import MoCoTrainer
from facl_tpu.utils.logging import setup_logging


def simclr_batches(ds, batch_size, key, num_points, epoch):
    """Yield (2, B, N, 4) two-view batches."""
    ekey = jax.random.fold_in(key, epoch)
    rng = np.random.default_rng(np.asarray(jax.random.key_data(ekey))[-1])
    order = rng.permutation(len(ds))
    for i in range(len(order) // batch_size):
        idxs = order[i * batch_size:(i + 1) * batch_size].tolist()
        srcs, labels, names = ds.load_batch(idxs)
        bkey = jax.random.fold_in(ekey, i)
        keys = jax.random.split(bkey, len(idxs))
        views = jax.vmap(
            lambda k, p, kp, t, r30, r10: make_simclr_crops(
                k, ClipSources(p, kp, t, r30, r10), num_points)
        )(keys, *(jnp.asarray(f) for f in srcs))
        yield jnp.moveaxis(views, 0, 1)          # (B,2,N,4) -> (2,B,N,4)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--out", default="checkpoints/moco")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--queue-len", type=int, default=9600,
                   help="negative queue length (reference default)")
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--temperature", type=float, default=1.0)
    args = p.parse_args(argv)

    setup_logging()
    log = logging.getLogger("moco")
    cfg = build_config(args)

    ds = NTUPointDataset(args.root, cfg.data, train=True)
    steps_per_epoch = max(1, len(ds) // args.batch_size)
    log.info("train videos=%d steps/epoch=%d", len(ds), steps_per_epoch)

    mesh = None
    # The EFFECTIVE batch (a small dataset caps it below --batch-size)
    # is what gets sharded and what the kernels see.
    eff_batch = min(args.batch_size, len(ds))
    if getattr(args, "mesh", False):
        from facl_tpu.parallel import make_mesh
        mesh = make_mesh(cfg.mesh)
        dp = mesh.shape["dp"]
        if eff_batch % dp:
            raise SystemExit(
                f"--mesh: effective batch size {eff_batch} "
                f"(min of --batch-size and {len(ds)} train videos) must "
                f"divide by dp={dp}")
        from facl_tpu.models import resolve_model_config
        if (resolve_model_config(cfg.model, mesh=mesh).sa_impl
                in ("pair", "pair3") and (eff_batch // dp) % 2):
            # The paired-row SA kernels process rows two at a time;
            # MoCo encodes one view per call (num_crops=1), so the
            # per-shard row count is exactly eff_batch/dp.
            raise SystemExit(
                f"--mesh: per-shard batch {eff_batch}//{dp}="
                f"{eff_batch // dp} must be even for the paired-row SA "
                "kernels; pick a batch size divisible by 2*dp or set "
                '"sa_impl": "reference" in --config')
        log.info("mesh: dp=%d mp=%d", dp, mesh.shape["mp"])

    key = jax.random.PRNGKey(args.seed)
    trainer = MoCoTrainer(cfg, steps_per_epoch, queue_len=args.queue_len,
                          momentum=args.momentum,
                          temperature=args.temperature, mesh=mesh)
    sample = next(simclr_batches(ds, min(args.batch_size, len(ds)), key,
                                 cfg.data.num_points, 0))
    state = trainer.init_state(jax.random.PRNGKey(args.seed), sample)
    if mesh is not None:
        from facl_tpu.train.moco_trainer import shard_moco_state
        state = shard_moco_state(mesh, state)

    for epoch in range(args.epochs):
        losses = []
        for views in simclr_batches(ds, min(args.batch_size, len(ds)), key,
                                    cfg.data.num_points, epoch):
            if mesh is not None:
                from facl_tpu.parallel import batch_sharding
                views = jax.device_put(views,
                                       batch_sharding(mesh, batch_axis=1))
            state, m = trainer.step_fn(state, views,
                                       jax.random.fold_in(key, epoch))
            losses.append(m["loss"])
        mean = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
        log.info("epoch %d done: loss=%.4f", epoch, mean)
        if epoch % cfg.train.checkpoint_every_epochs == 0:
            save_checkpoint(args.out, state, epoch)
    save_checkpoint(args.out, state, args.epochs - 1)


if __name__ == "__main__":
    main()
