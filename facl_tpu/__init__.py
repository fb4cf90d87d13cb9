"""facl_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of tangent-T/FACL: unsupervised 3D action representation
learning from point-cloud sequences (NTU-60/120).

Layer map (bottom-up), mirroring SURVEY.md §1 with one copy of everything:
  ops/      geometry + point-op primitives (grouping, FPS, transforms)
  datagen/  offline depth -> 3DV point-cloud generation
  data/     datasets, splits, the 10-crop augmentation factory
  models/   set-abstraction encoders, MoCo, linear probe
  losses/   global-local + circle InfoNCE, SwAV/sinkhorn, CLD
  parallel/ device mesh + sharding rules (GSPMD)
  train/    jit-compiled contrastive pretrain, extraction, checkpointing
  eval/     linear-probe evaluation
  cli/      entry points matching the reference scripts
"""
__version__ = "0.1.0"

from facl_tpu.config import Config
