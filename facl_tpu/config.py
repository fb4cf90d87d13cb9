"""Typed configuration for the whole framework.

One config object shared by every entry point (datagen, pretrain, extract,
probe) — replaces the reference's ~25 duplicated argparse flags per script
(reference: training_code/cn3d_train_apperance_GL.py:75-137). Unlike the
reference, every knob here is honored: the reference hard-codes knn_K=64 and
ball_radius=0.06 inside its grouping op (training_code/utils_my.py:260-261),
overriding the CLI; we default to those values but let them be changed.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple


@dataclass(frozen=True)
class GroupingConfig:
    """kNN + ball-query grouping (semantics of utils_my.py:255-291).

    ``radius_sq`` is compared against the *squared* euclidean distance, which
    is what the reference does (it never takes a sqrt): utils_my.py:268-272.
    """
    num_centroids: int = 64      # sample_num_level1 (first S points are centroids)
    knn_k: int = 64
    radius_sq: float = 0.06
    method: str = "exact"        # "exact" (lax.top_k) | "approx" (lax.approx_min_k)
    # Neighbor *selection* implementation for method="exact":
    # "xla" = pairwise dists -> lax.top_k -> radius override;
    # "pallas" = the fused in-VMEM select kernel (ops/pallas/select.py) —
    # same index SET (exact, deterministic ties), order within the K
    # selected differs (downstream is order-invariant: Dense is per-point,
    # BN stats and the K max-pool reduce over the neighbor axis);
    # "auto" picks pallas on TPU, xla elsewhere.
    select_impl: str = "auto"
    # Neighborhood gather implementation: "auto" picks the Pallas in-VMEM
    # one-hot kernel on TPU and XLA's take_along_axis elsewhere (incl. the
    # no-mesh multi-device case, where GSPMD must partition the gather);
    # "pallas"/"xla" force one. This is THE knob — no code path may probe
    # jax.devices() to silently downgrade an explicit choice.
    gather_impl: str = "auto"


@dataclass(frozen=True)
class ModelConfig:
    """Encoder hyper-parameters (cn3d_model_conbag.py:15-17, 22-137)."""
    name: str = "pointnet_plus"  # pointnet_plus | pointnet_plus_fine | slow_fast
    in_features: int = 4         # INPUT_FEATURE_NUM: x, y, z, motion
    sa_widths: Tuple[int, ...] = (64, 64, 256)      # nstates_plus_1
    stage2_widths: Tuple[int, ...] = (256, 512, 1024)  # nstates_plus_3[:3]
    fc_hidden: int = 1024        # nstates_plus_3[4]
    embed_dim: int = 512         # dim
    num_prototypes: int = 64     # num_clusters (the `mapping` head)
    num_crops: int = 10          # gost
    bn_momentum: float = 0.9     # torch BatchNorm default (momentum=0.1 on the update)
    # fine variant (cn3d_model_conbag.py:141-234)
    fine_num_centroids: int = 32
    fine_knn_k: int = 128
    # slow/fast variant (cn3d_model_conbag.py:237-387)
    slow_widths1: Tuple[int, ...] = (16, 64, 128)
    slow_widths3: Tuple[int, ...] = (128, 256, 512)
    fast_widths1: Tuple[int, ...] = (64, 128, 256)
    fast_widths3: Tuple[int, ...] = (256, 512, 1024)
    compute_dtype: str = "float32"  # "bfloat16" for speed; params stay f32
    # SA-stage implementation. "auto" (default) resolves at trainer-build
    # time (models.resolve_model_config) to the flagship "pair" path
    # wherever it is GSPMD-safe — single-device TPU, or any explicit
    # device mesh (per-shard shard_map sweeps with psum'd global BN
    # stats) — and to "reference" on CPU/GPU backends and in the no-mesh
    # multi-device case (GSPMD cannot partition pallas_call).
    # Explicit values: "reference" = the XLA path; "analytic" = same
    # forward, hand-derived backward that collapses the
    # BatchNorm-backward reductions into Gram-matrix algebra
    # (ops/analytic_sa.py); "hybrid" = XLA forward + 2-sweep Pallas
    # backward (ops/pallas/sa_bwd.py); "hybrid2" = Pallas forward sweeps
    # + the same backward (ops/pallas/sa_fwd.py); "pallas" opts into the
    # fused sweep kernels (ops/pallas/sa_kernel.py) and "covar" into
    # Gram-matrix forward statistics; "pair" = hybrid2 in the paired-row
    # full-lane-width layout (ops/pallas/sa_pair.py) — the flagship;
    # "pair3" = pair with the slim 3-sweep backward (layer-1
    # dy-contraction formed directly instead of via third-order
    # moments). All golden-tested; measured standings in
    # docs/DESIGN.md section 3.
    sa_impl: str = "auto"
    # Channel-major (B, C, S, K) neighborhoods through grouping + the SA
    # stage — the fused select+gather kernel's native layout, removing
    # the full-tensor transpose between it and the paired SA sweeps.
    # None (default) = auto: True exactly when the resolved sa_impl is
    # "pair"/"pair3" (the only train paths that consume it natively);
    # other impls (and eval) transpose back, so forcing it elsewhere is
    # correct but wasteful.
    channels_first: Optional[bool] = None


@dataclass(frozen=True)
class LossConfig:
    """Loss gates mirror the reference's *_if flags
    (cn3d_train_apperance_GL.py:238,265,290,319) and the combination
    loss = circle + 0.6*swav + cld + global (line 329)."""
    use_global: bool = True
    use_circle: bool = True
    use_swav: bool = False
    use_cld: bool = False
    swav_weight: float = 0.6
    swav_temp_code: float = 0.03     # po / 0.03 (line 253)
    swav_temp_pred: float = 0.1      # softmax(code / 0.1) (line 259)
    swav_sinkhorn_iters: int = 3     # distributed_sinkhorn(po, 3) (line 256)
    swav_queue_start_epoch: int = 10
    swav_queue_factor: int = 32      # queue_length = batch * 32 (line 190)
    cld_temp: float = 0.05
    cld_clusters: int = 60
    cld_kmeans_iters: int = 5
    # NOTE: the reference passes k_eigen=10 into its CLD ``grouping()``
    # (utils_my.py:159,164) but the parameter is dead there — only the
    # k-means branch exists ("Default: k-Means"). No knob here.


@dataclass(frozen=True)
class DataConfig:
    """Dataset / augmentation (cn3D_data_set.py)."""
    dataset: str = "ntu60"       # ntu60 | ntu120
    protocol: str = "xview"      # xsub | xview | xset
    sample_num: int = 2048       # SAMPLE_NUM: points per stored cloud
    num_points: int = 512        # NUM_POINT: points per crop
    num_crops: int = 10
    stream: str = "motion"       # motion (branch '0') | appearance (branch '1')
    jitter_sigma: float = 0.01
    jitter_clip: float = 0.05
    rotate_range: float = 0.8    # angle = (U-0.5) * pi * rotate_range
    temporal_channels: Tuple[int, int] = (4, 7)  # columns for ti1/ti2 crops
    root: str = ""               # directory holding generated .npy trees


@dataclass(frozen=True)
class DatagenConfig:
    """Offline 3DV generation (generate_data/generate_NTU.py)."""
    # Kinect-v2 intrinsics (generate_NTU.py:14-17)
    fx: float = 365.481
    fy: float = 365.481
    cx: float = 257.346
    cy: float = 210.347
    voxel_size: float = 30.0     # generate_NTU.py:19
    num_splits: int = 5          # M temporal rank-pool channels (:20)
    max_frames: int = 60         # K frame cap (:30)
    sample_num: int = 2048
    # motion localisation thresholds (generate_NTU.py:356-359)
    motion_low: float = 50.0
    motion_high: float = 300.0
    # border + boundary masking (generate_NTU.py:31, 339-351)
    boundary_seg: Tuple[int, int, int, int] = (60, 29, 10, 10)
    # density denoise thresholds (applied generate_NTU.py:190-191)
    denoise_key_threshold: int = 6
    denoise_raw_threshold: int = 5
    # fixed voxel-grid capacity (TPU static shapes; indices are clamped)
    grid_shape: Tuple[int, int, int] = (128, 96, 96)
    # depth image shape (NTU masked depth maps)
    image_shape: Tuple[int, int] = (424, 512)
    num_appearance_frames: int = 10
    resolutions: Tuple[int, ...] = (60, 30, 10)


@dataclass(frozen=True)
class OptimConfig:
    """Adam + step decay (cn3d_train_apperance_GL.py:180-181)."""
    learning_rate: float = 3e-4
    b1: float = 0.5
    b2: float = 0.999
    eps: float = 1e-6
    lr_decay_epochs: int = 4
    lr_decay_gamma: float = 0.7


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 64         # per-step videos (global, before sharding)
    num_epochs: int = 100
    seed: int = 1
    checkpoint_every_epochs: int = 5
    checkpoint_dir: str = "checkpoints"
    log_every_steps: int = 50
    optim: OptimConfig = field(default_factory=OptimConfig)
    # Execute the train step as TWO jit programs (forward+loss | backward
    # +Adam) instead of one fused program. Numerically identical (the vjp
    # residuals cross the seam as explicit device buffers); the win is
    # peak *per-program* scratch — each side's XLA temp arena is roughly
    # halved, which unlocks large per-chip batches on runtimes that cap a
    # single program's scratch allocation (measured: the axon-tunnel v5e
    # caps one program's temp at ~2-3 GB while the chip itself has
    # ~13 GB free — BASELINE.md round-4 batch-scaling note). Costs one
    # extra dispatch per step; keep False where batch 64-128 fits.
    split_step: bool = False


@dataclass(frozen=True)
class ProbeConfig:
    """Linear probe (linear_classify/linercls.py, fc_model.py)."""
    num_classes: int = 120
    feature_dim: int = 512
    crops_per_stream: int = 11   # 10 local + 1 global embeddings per video
    num_streams: int = 2         # motion + appearance
    learning_rate: float = 5e-3
    lr_decay_epochs: int = 5
    lr_decay_gamma: float = 0.7
    num_epochs: int = 50
    eval_after_epoch: int = 15
    batch_size: int = 64


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout. ``dp`` shards the batch (the reference's only
    active parallelism was single-process DataParallel —
    cn3d_train_apperance_GL.py:176); ``mp`` optionally shards the wide FC
    layers. Contrastive negatives always span the *global* batch: under
    GSPMD the all-gather the dead reference code hinted at
    (cn3d_model_conbag.py:559-570) is inserted automatically by XLA."""
    dp: int = -1                 # -1: use all remaining devices
    mp: int = 1


@dataclass(frozen=True)
class Config:
    grouping: GroupingConfig = field(default_factory=GroupingConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    data: DataConfig = field(default_factory=DataConfig)
    datagen: DatagenConfig = field(default_factory=DatagenConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    probe: ProbeConfig = field(default_factory=ProbeConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    @staticmethod
    def from_json(text: str) -> "Config":
        raw = json.loads(text)

        def build(cls, d):
            kwargs = {}
            for f in dataclasses.fields(cls):
                if f.name not in d:
                    continue
                v = d[f.name]
                if dataclasses.is_dataclass(f.type) or f.name in _SUBCONFIGS:
                    kwargs[f.name] = build(_SUBCONFIGS[f.name], v)
                elif isinstance(v, list):
                    kwargs[f.name] = tuple(v)
                else:
                    kwargs[f.name] = v
            return cls(**kwargs)

        return build(Config, raw)


_SUBCONFIGS = {
    "grouping": GroupingConfig,
    "model": ModelConfig,
    "loss": LossConfig,
    "data": DataConfig,
    "datagen": DatagenConfig,
    "train": TrainConfig,
    "probe": ProbeConfig,
    "mesh": MeshConfig,
    "optim": OptimConfig,
}
