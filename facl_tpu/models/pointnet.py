"""Set-abstraction point encoders.

TPU-native re-design of the reference encoders (cn3d_model_conbag.py):

* ``PointNetPlus``   — cn3d_model_conbag.py:22-137, with the *canonical
  4-output forward* (the one the drivers unpack; active verbatim in
  ``PointNet_Plus_fine.forward`` at :213-234 — SURVEY §2 flags the shipped
  ``PointNet_Plus.forward`` as dead-coded to 1 output).
* ``resolve_model``   — name-based selection incl. the 'fine' variant
  (cn3d_model_conbag.py:141-234; S=32, K=128 grouping, identical layers).
* Grouping happens *outside* the module (facl_tpu.ops.grouping), mirroring
  the reference split between ``group_points_3DV`` and the nn.Module.

Layout: channels-last throughout. Inputs:
  neighborhoods: (B*G, S, K, C)   — BATCH-major flattening: crop g of video
                                     b sits at row b*G + g. The reference
                                     flattens crop-major (g*B + b,
                                     cn3d_train_apperance_GL.py:224-226);
                                     the row set — and therefore the BN
                                     statistics, per-row outputs, and
                                     per-video pools — is identical, but
                                     batch-major keeps every merge/split of
                                     the row axis GSPMD-representable when
                                     the batch is sharded over dp: the
                                     sharded factor is the MAJOR factor of
                                     the merged dim, so the neighborhood
                                     tensor never needs a cross-device
                                     redistribution (ROADMAP item 7;
                                     asserted by tests/test_sharding.py's
                                     HLO collective scan).
  centers:       (B*G, S, 3)

The "global" branch max-pools the stage-2 features over all G crops of a
video jointly (cn3d_model_conbag.py:225-226) — with batch-major rows that
is a pure reshape (B, G*S, F) -> max over G*S, no transpose at all.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from facl_tpu.config import GroupingConfig, ModelConfig
from facl_tpu.models.layers import EmbedHead, PointMLP, l2_normalize
from facl_tpu.models.sa_stage import SetAbstractionStage

Array = jax.Array


class PointNetPlus(nn.Module):
    """Single-level set-abstraction encoder with local + global heads.

    ``mesh``: optional device mesh — forwarded to the SA stage so the
    pair/pair3 Pallas path runs per-shard under shard_map with global
    BN statistics (sa_stage.SetAbstractionStage.mesh)."""
    cfg: ModelConfig
    mesh: Any = None

    def setup(self):
        dtype = jnp.dtype(self.cfg.compute_dtype)
        self.sa_stage = SetAbstractionStage(
            self.cfg.sa_widths, bn_momentum=self.cfg.bn_momentum,
            dtype=dtype, impl=self.cfg.sa_impl,
            channels_first=self.cfg.channels_first,
            mesh=self.mesh)
        self.stage2_mlp = PointMLP(self.cfg.stage2_widths,
                                   bn_momentum=self.cfg.bn_momentum, dtype=dtype)
        self.head = EmbedHead(self.cfg.fc_hidden, self.cfg.embed_dim,
                              bn_momentum=self.cfg.bn_momentum, dtype=dtype)
        # Prototype scores; no bias (cn3d_model_conbag.py:91).
        self.mapping = nn.Dense(self.cfg.num_prototypes, use_bias=False,
                                dtype=dtype, name="mapping")

    def __call__(self, neighborhoods: Array, centers: Array,
                 train: bool = True) -> Tuple[Array, Array, Array, Array]:
        """Returns (x, code, x_nor, x_global):
          x        (B*G, D)  per-crop embedding (batch-major rows, see
                             module docstring)
          code     (B*G, P)  prototype logits of the normalized embedding
          x_nor    (B*G, D)  L2-normalized x
          x_global (B, D)    per-video global embedding
        """
        G = self.cfg.num_crops
        if self.cfg.channels_first:
            GB, C, S, K = neighborhoods.shape
        else:
            GB, S, K, C = neighborhoods.shape
        B = GB // G
        if C != self.cfg.in_features:
            raise ValueError(
                f"encoder configured for in_features={self.cfg.in_features} "
                f"but got {C}-channel neighborhoods (INPUT_FEATURE_NUM, "
                "cn3d_model_conbag.py:15)")

        dtype = jnp.dtype(self.cfg.compute_dtype)
        h = self.sa_stage(neighborhoods.astype(dtype), train=train)  # (GB,S,256)
        h = jnp.concatenate([centers.astype(dtype), h], axis=-1)   # (GB,S,259)
        local_feat = self.stage2_mlp(h, train=train)               # (GB,S,1024)

        x = jnp.max(local_feat, axis=1)                            # (GB,1024)

        # Global branch: joint max over all crops of the same video. With
        # batch-major rows a video's G crops are contiguous, so this is a
        # pure reshape — and when rows are dp-sharded the split keeps B
        # sharded with no data movement.
        gfeat = local_feat.reshape(B, G * S, local_feat.shape[-1])
        x_global = jnp.max(gfeat, axis=1)                          # (B,1024)

        x = self.head(x, train=train)                              # (GB,D)
        x_global = self.head(x_global, train=train)                # (B,D)

        x = x.astype(jnp.float32)
        x_global = x_global.astype(jnp.float32)
        x_nor = l2_normalize(x, axis=1)
        code = self.mapping(x_nor).astype(jnp.float32)
        return x, code, x_nor, x_global


#: Every accepted ModelConfig.sa_impl value ("auto" resolves to one of the
#: others via :func:`resolve_model_config`).
SA_IMPLS = ("auto", "reference", "covar", "pallas", "analytic", "hybrid",
            "hybrid2", "pair", "pair3")


def resolve_model_config(model_cfg: ModelConfig, mesh=None, *,
                         backend: str = None,
                         n_devices: int = None) -> ModelConfig:
    """Resolve ``sa_impl="auto"`` / ``channels_first=None`` to concrete values.

    The flagship paired-row Pallas path is the default wherever it is safe;
    the resolution is decided ONCE at trainer-build time from the mesh/config
    (not re-probed inside traced code):

    * an explicit ``sa_impl`` is always honored;
    * ``"auto"`` resolves to ``"pair3"`` on a TPU backend when single-device
      OR when an explicit ``mesh`` is passed (the SA stage then runs
      ``sa_pair.make_sharded_pair`` per-shard under shard_map with global,
      psum'd BN statistics — tests/test_sharding.py). pair3 = the paired-row
      layout with the slim 3-sweep backward — device-measured round 3 at
      3786 clips/s full-step vs pair's 3285 (BASELINE.md measurement table);
    * ``"auto"`` resolves to ``"reference"`` on CPU/GPU backends (the Pallas
      kernels would run interpreted) and in the no-mesh multi-device case,
      where GSPMD must partition the whole graph and ``pallas_call`` is a
      single-device program;
    * ``channels_first=None`` resolves to True exactly when the resolved
      impl consumes the channel-major grouping layout natively
      (``"pair"``/``"pair3"``), else False.

    ``backend``/``n_devices`` default to the live JAX runtime and exist so
    the rules are unit-testable without that runtime
    (tests/test_sa_resolution.py).
    """
    import dataclasses

    impl = model_cfg.sa_impl
    if impl not in SA_IMPLS:
        raise ValueError(f"unknown sa_impl {impl!r}; expected one of "
                         f"{SA_IMPLS}")
    if impl == "auto":
        if backend is None:
            backend = jax.default_backend()
        if n_devices is None:
            n_devices = len(jax.devices())
        on_tpu = backend not in ("cpu", "gpu")   # axon counts as TPU
        if on_tpu and (mesh is not None or n_devices == 1):
            impl = "pair3"
        else:
            impl = "reference"
    cf = model_cfg.channels_first
    if cf is None:
        cf = impl in ("pair", "pair3")
    if impl == model_cfg.sa_impl and cf == model_cfg.channels_first:
        return model_cfg
    return dataclasses.replace(model_cfg, sa_impl=impl, channels_first=cf)


def resolve_model(cfg, mesh=None) -> Tuple[nn.Module, "GroupingConfig"]:
    """Select the encoder + its *effective* grouping from ``ModelConfig.name``.

    The reference's 'fine' variant (``PointNet_Plus_fine``,
    cn3d_model_conbag.py:141-234) differs from ``PointNet_Plus`` only in
    grouping geometry — sample_num_level1=32, knn_K=128 (:142) — the layer
    stack is identical and our pooling is shape-polymorphic, so both names
    map to :class:`PointNetPlus` grouped with the right (S, K).

    Args:
      cfg: the full :class:`facl_tpu.config.Config`.
      mesh: optional device mesh, forwarded to the encoder (the
        pair/pair3 SA path then runs per-shard under shard_map).
    Returns:
      (flax module, GroupingConfig actually used for this model).
    Raises:
      ValueError: unknown name, or ``slow_fast`` (two-pathway forward —
        train it with ``facl_tpu.train.slowfast_trainer.SlowFastTrainer``).
    """
    import dataclasses

    name = cfg.model.name
    model_cfg = resolve_model_config(cfg.model, mesh=mesh)
    if name == "pointnet_plus":
        return PointNetPlus(model_cfg, mesh=mesh), cfg.grouping
    if name == "pointnet_plus_fine":
        g = dataclasses.replace(cfg.grouping,
                                num_centroids=cfg.model.fine_num_centroids,
                                knn_k=cfg.model.fine_knn_k)
        return PointNetPlus(model_cfg, mesh=mesh), g
    if name == "slow_fast":
        raise ValueError(
            "model name 'slow_fast' has a two-pathway forward; use "
            "facl_tpu.train.slowfast_trainer.SlowFastTrainer (the pretrain "
            "CLI dispatches automatically)")
    raise ValueError(f"unknown model name {name!r}; expected pointnet_plus, "
                     "pointnet_plus_fine or slow_fast")
