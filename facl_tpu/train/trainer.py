"""Contrastive pretraining: one fused jit step + the epoch loop.

The reference's per-batch pipeline (cn3d_train_apperance_GL.py:223-333) —
H2D copy, grouping, forward, four losses, backward, Adam, scheduler — is a
single jit-compiled function here. Under a device mesh the batch enters
sharded over ``dp`` and XLA handles grad psum / negative all-gather /
cross-replica BN (SURVEY §5.8).
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from facl_tpu.config import Config
from facl_tpu.losses import (
    circle_infonce,
    cld_loss,
    global_local_infonce,
    swav_loss,
    swav_queue_init,
)
from facl_tpu.models import resolve_model
from facl_tpu.ops.grouping import (group_points, resolve_gather_impl,
                                   resolve_select_impl)
from facl_tpu.train.optim import make_optimizer
from facl_tpu.train.state import TrainState

Array = jax.Array


def make_grouping_fn(g_cfg, mesh=None, layout: str = "bskc",
                     batch_axis: int = 1) -> Callable:
    """Grouping over a 4-D batch of point clouds.

    ``batch_axis`` names the dp-sharded axis: 1 for (V, B, N, C)
    view-major batches (MoCo's 2-view input), 0 for (B, G, N, C)
    batch-major crop batches (the contrastive trainer — batch-major keeps
    the (B*G) row merge GSPMD-representable, see models/pointnet.py).

    Single device: plain group_points (Pallas gather on TPU). With a
    multi-device ``mesh``: shard_map over the batch axis — grouping is
    row-independent, so each shard runs the single-device kernel on its
    slice and the Pallas gather stays usable on pods. Without a mesh but
    with multiple devices visible, ``gather_impl="auto"`` resolves to the
    XLA gather (GSPMD can partition it; the Pallas kernel can't) — but an
    explicit ``gather_impl`` from the config is always honored.
    ``layout="bcsk"`` yields channel-major neighborhoods (see
    ops.grouping.group_points)."""
    def group4d(points4d, gather_impl=g_cfg.gather_impl,
                select_impl=g_cfg.select_impl):
        A0, A1, N, C = points4d.shape
        flat = points4d.reshape(A0 * A1, N, C)
        neigh, cent = group_points(
            flat, g_cfg.num_centroids, g_cfg.knn_k, g_cfg.radius_sq,
            g_cfg.method, gather_impl, select_impl, layout)
        return (neigh.reshape(A0, A1, *neigh.shape[1:]),
                cent.reshape(A0, A1, -1, 3))

    if mesh is not None and mesh.size > 1:
        from jax.sharding import PartitionSpec as P

        spec = P("dp") if batch_axis == 0 else P(None, "dp")

        def grouped(points4d):
            # check_vma=False: pallas_call inside shard_map cannot declare
            # varying-mesh-axes metadata on its outputs (caught by
            # tests/test_sharding.py with the fused kernel forced on the
            # CPU mesh); the body is purely per-shard so the check adds
            # nothing here.
            out = jax.shard_map(
                group4d, mesh=mesh,
                in_specs=spec,
                out_specs=(spec, spec),
                check_vma=False,
            )(points4d)
            return out

        return grouped
    # No-mesh: resolve "auto" ONCE at build time (the only path where
    # GSPMD — rather than shard_map — would partition the kernels).
    gi = resolve_gather_impl(g_cfg)
    si = resolve_select_impl(g_cfg)
    return lambda p: group4d(p, gi, si)


def make_train_step(model, optimizer, cfg: Config,
                    donate: bool = True, mesh=None,
                    grouping=None, split: bool = False) -> Callable:
    """Build the jit-compiled training step.

    step(state, points, key, epoch) -> (state, metrics)
      points: (G, B, N, C) crop-major batch of 10-crop clips.
      epoch:  () int32 — drives the SwAV queue gate.
      grouping: effective GroupingConfig (defaults to cfg.grouping; the
        fine model variant overrides S/K via models.resolve_model).
      split: execute as TWO jit programs — forward+loss, then
        backward+Adam — instead of one fused program
        (``TrainConfig.split_step``). The ``jax.vjp`` residuals cross
        the seam as explicit device buffers (``jax.tree_util.Partial``
        is a pytree, so the vjp function itself flows through the jit
        boundary), which roughly halves each side's XLA scratch arena:
        the unlock for large per-chip batches on runtimes that cap one
        program's scratch (BASELINE.md round-4 batch-scaling note).
        Identical math, one extra dispatch per step; single-device only.
    """
    if split and mesh is not None and getattr(mesh, "size", 1) > 1:
        raise ValueError("split_step targets single-device large-batch "
                         "runs; use the fused step under a mesh (GSPMD "
                         "already bounds per-shard scratch)")
    g_cfg = grouping or cfg.grouping
    l_cfg = cfg.loss
    layout = "bcsk" if cfg.model.channels_first else "bskc"
    grouping_fn = make_grouping_fn(g_cfg, mesh, layout, batch_axis=0)

    def loss_fn(params, batch_stats, points, key, epoch, swav_queue):
        G, B, N, C = points.shape
        # Batch-major from here on: (B, G, ...) so every merge/split of
        # the row axis keeps the dp-sharded B as the MAJOR factor —
        # GSPMD-representable, no redistribution of the big neighborhood
        # tensor (models/pointnet.py docstring; ROADMAP item 7). The
        # transpose itself touches only the (G, B, N, C) points (~10 MB
        # at the reference workload) and is sharding-preserving.
        points_bm = jnp.swapaxes(points, 0, 1)               # (B, G, N, C)
        neigh5, cent4 = grouping_fn(points_bm)
        neigh = neigh5.reshape(B * G, *neigh5.shape[2:])
        cent = cent4.reshape(B * G, *cent4.shape[2:])
        (x, code, x_nor, x_global), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            neigh, cent, train=True, mutable=["batch_stats"])

        # The losses consume crop-major (G, B, D) — transposing at the
        # embedding level is (G*B, D) small, unlike the neighborhoods.
        xg = jnp.swapaxes(x.reshape(B, G, -1), 0, 1)
        metrics = {}
        loss = jnp.zeros((), jnp.float32)

        if l_cfg.use_global:
            lc = global_local_infonce(xg, x_global)
            metrics["loss_global"] = lc
            loss = loss + lc
        if l_cfg.use_circle:
            key, sub = jax.random.split(key)
            lcir = circle_infonce(sub, xg)
            metrics["loss_circle"] = lcir
            loss = loss + lcir

        new_queue = swav_queue
        if l_cfg.use_swav:
            code_g = jnp.swapaxes(code.reshape(B, G, -1), 0, 1)
            xn_g = jnp.swapaxes(x_nor.reshape(B, G, -1), 0, 1)
            w = params["mapping"]["kernel"]          # (D, P)
            queue_on = jnp.logical_and(
                epoch >= l_cfg.swav_queue_start_epoch,
                jnp.any(jnp.abs(swav_queue[:, -1, :]) > 0)
            ) if swav_queue is not None else jnp.asarray(False)
            lswa, new_queue = swav_loss(
                code_g, xn_g, w, swav_queue, queue_on,
                temp_code=l_cfg.swav_temp_code,
                temp_pred=l_cfg.swav_temp_pred,
                num_iters=l_cfg.swav_sinkhorn_iters)
            # The queue only starts filling once epoch >= start (reference
            # allocates it lazily at that epoch, :215-220).
            if swav_queue is not None:
                new_queue = jnp.where(epoch >= l_cfg.swav_queue_start_epoch,
                                      new_queue, swav_queue)
            metrics["loss_swav"] = lswa
            loss = loss + l_cfg.swav_weight * lswa
        if l_cfg.use_cld:
            xn_g = jnp.swapaxes(x_nor.reshape(B, G, -1), 0, 1)
            lcld = cld_loss(xn_g, temp=l_cfg.cld_temp,
                            num_clusters=l_cfg.cld_clusters,
                            num_iters=l_cfg.cld_kmeans_iters)
            metrics["loss_cld"] = lcld
            loss = loss + lcld

        metrics["loss"] = loss
        return loss, (mutated["batch_stats"], metrics, new_queue)

    if split:
        @jax.jit
        def fwd_step(state, points, key, epoch):
            _, vjp_fn, (new_stats, metrics, new_queue) = jax.vjp(
                lambda p: loss_fn(p, state.batch_stats, points, key,
                                  epoch, state.swav_queue),
                state.params, has_aux=True)
            return vjp_fn, new_stats, metrics, new_queue

        @jax.jit
        def bwd_step(vjp_fn, state, new_stats, new_queue):
            (grads,) = vjp_fn(jnp.ones((), jnp.float32))
            updates, new_opt = optimizer.update(grads, state.opt_state,
                                                state.params)
            new_params = optax.apply_updates(state.params, updates)
            return state.replace(
                params=new_params, batch_stats=new_stats,
                opt_state=new_opt, step=state.step + 1,
                swav_queue=new_queue)

        def train_step_split(state, points, key, epoch):
            # NOT re-jitted as a whole: wrapping the pair in one jit
            # would inline both programs back into a single XLA module
            # and restore the fused arena peak.
            vjp_fn, new_stats, metrics, new_queue = fwd_step(
                state, points, key, epoch)
            new_state = bwd_step(vjp_fn, state, new_stats, new_queue)
            return new_state, metrics

        return train_step_split

    def train_step(state: TrainState, points: Array, key: Array,
                   epoch: Array) -> Tuple[TrainState, Dict[str, Array]]:
        grads, (new_stats, metrics, new_queue) = jax.grad(
            loss_fn, has_aux=True)(
            state.params, state.batch_stats, points, key, epoch,
            state.swav_queue)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params, batch_stats=new_stats, opt_state=new_opt,
            step=state.step + 1, swav_queue=new_queue)
        return new_state, metrics

    donate_args = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_args)


def make_eval_step(model, cfg: Config, grouping=None,
                   mesh=None) -> Callable:
    """Jit extraction step: points (G,B,N,C) -> (x (B*G,D) batch-major,
    x_global (B,D)) using running BN stats (extract_*_feature.py:171-182).

    ``mesh``: shard_map the grouping over dp (same as the train step —
    the Pallas select/gather kernels stay usable per shard); the model
    forward itself runs under GSPMD.

    The grouping layout follows the MODEL's resolved config when the
    module carries one (PointNetPlus.cfg) — callers often hold the
    pre-resolution Config (``channels_first=None``), and deriving the
    layout from that while the model was resolved to channel-major fed
    the encoder transposed neighborhoods (caught by the round-3 verify
    drive on the TPU backend, where ``sa_impl="auto"`` resolves to the
    channel-major pair path; on CPU both resolve channels-last and the
    mismatch is invisible)."""
    g_cfg = grouping or cfg.grouping
    model_cfg = getattr(model, "cfg", cfg.model)
    layout = "bcsk" if model_cfg.channels_first else "bskc"
    grouping_fn = make_grouping_fn(g_cfg, mesh, layout, batch_axis=0)

    def eval_step(variables, points):
        G, B, N, C = points.shape
        points_bm = jnp.swapaxes(points, 0, 1)               # (B, G, N, C)
        neigh5, cent4 = grouping_fn(points_bm)
        neigh = neigh5.reshape(B * G, *neigh5.shape[2:])
        cent = cent4.reshape(B * G, *cent4.shape[2:])
        x, code, x_nor, x_global = model.apply(
            variables, neigh, cent, train=False)
        return x, x_global

    return jax.jit(eval_step)


class Trainer:
    """Epoch-loop orchestration: build model/optimizer/state, run the jit
    step over a data iterator, track throughput, checkpoint periodically."""

    def __init__(self, cfg: Config, steps_per_epoch: int,
                 mesh=None, model=None):
        # Resolve sa_impl="auto"/channels_first=None ONCE here so the
        # grouping layout, the jit step and the model all agree
        # (models.resolve_model_config; rules in its docstring).
        from facl_tpu.models import resolve_model_config
        cfg = cfg.replace(model=resolve_model_config(cfg.model, mesh=mesh))
        self.cfg = cfg
        self.steps_per_epoch = steps_per_epoch
        self.mesh = mesh
        if model is None:
            self.model, self.g_cfg = resolve_model(cfg, mesh=mesh)
        else:
            self.model, self.g_cfg = model, cfg.grouping
        self.optimizer = make_optimizer(cfg.train.optim, steps_per_epoch)
        self.step_fn = make_train_step(self.model, self.optimizer, cfg,
                                       mesh=mesh, grouping=self.g_cfg,
                                       split=cfg.train.split_step)

    def init_state(self, rng: Array, sample_points: Array) -> TrainState:
        """sample_points: (G, B, N, C) — used for shape inference only."""
        G, B, N, C = sample_points.shape
        flat = jnp.swapaxes(sample_points, 0, 1).reshape(B * G, N, C)
        neigh, cent = group_points(
            flat, self.g_cfg.num_centroids, self.g_cfg.knn_k,
            self.g_cfg.radius_sq, self.g_cfg.method,
            layout="bcsk" if self.cfg.model.channels_first else "bskc")
        variables = self.model.init(rng, neigh, cent, train=False)
        queue = None
        if self.cfg.loss.use_swav:
            queue = swav_queue_init(
                self.cfg.model.num_crops,
                self.cfg.train.batch_size * self.cfg.loss.swav_queue_factor,
                self.cfg.model.embed_dim)
        return TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.optimizer.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
            swav_queue=queue,
        )

    def run_epoch(self, state: TrainState, batches: Iterable[Array],
                  epoch: int, rng: Array,
                  log_fn: Optional[Callable[[Dict], None]] = None):
        """Run one epoch; returns (state, mean-metrics dict).

        Metrics stay on device during the epoch — fetching a scalar per
        step would synchronize the host with every step and destroy the
        dispatch pipeline. Only the periodic log line (every
        ``log_every_steps``) and the end-of-epoch means materialize.
        """
        device_metrics = []
        count = 0
        clips = 0
        t0 = time.perf_counter()
        epoch_arr = jnp.asarray(epoch, jnp.int32)
        for i, points in enumerate(batches):
            rng, sub = jax.random.split(rng)
            state, metrics = self.step_fn(state, points, sub, epoch_arr)
            count += 1
            clips += points.shape[1]
            device_metrics.append(metrics)
            if log_fn is not None and (i % self.cfg.train.log_every_steps == 0):
                m = {k: float(v) for k, v in metrics.items()}
                m.update(step=int(state.step), epoch=epoch)
                log_fn(m)
        # One sync for the whole epoch.
        if device_metrics:
            stacked = {k: float(jnp.mean(jnp.stack(
                [m[k] for m in device_metrics])))
                for k in device_metrics[0]}
        else:
            stacked = {}
        dt = time.perf_counter() - t0
        stacked["clips_per_sec"] = clips / dt if dt > 0 else 0.0
        return state, stacked
