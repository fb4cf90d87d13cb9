"""Feature extraction: per-video 11x512 embedding dumps.

Re-derivation of extract_{apperance,motion}_feature.py:34-221: run the
trained encoder in eval mode over train+test splits; per video concatenate
the 10 per-crop embeddings with the global embedding (11 x 512 = 5632-d)
and write one .npy per video.
"""
from __future__ import annotations

import os
from typing import Dict, Iterable, Optional, Tuple

import jax
import numpy as np

from facl_tpu.config import Config
from facl_tpu.train.trainer import make_eval_step

Array = jax.Array


def features_from_outputs(x: np.ndarray, x_global: np.ndarray,
                          num_crops: int) -> np.ndarray:
    """(B*G, D) batch-major + (B, D) -> (B, (G+1)*D): per-video crop
    embeddings in crop order followed by the global embedding — the
    semantics of ``cat([x, x_global])`` + ``save_single_feature``'s
    reshape (extract_apperance_feature.py:182, :217-221). The eval step
    emits batch-major rows (models/pointnet.py), so a video's crops are
    already contiguous: one reshape + one concat."""
    GB, D = x.shape
    B = GB // num_crops
    per_crop = x.reshape(B, num_crops, D)
    stacked = np.concatenate([per_crop, x_global[:, None]], axis=1)
    return stacked.reshape(B, (num_crops + 1) * D)


def extract_features(model, variables, cfg: Config,
                     batches: Iterable[Tuple[Array, np.ndarray, list]],
                     out_dir: Optional[str] = None,
                     grouping=None, eval_step=None
                     ) -> Dict[str, np.ndarray]:
    """Run extraction over an iterator of (crops (G,B,N,C), labels, names).

    Returns {video_name: (11*D,) feature}; also writes one .npy per video
    under ``out_dir`` when given (the reference's on-disk contract).

    ``grouping`` is the model's effective GroupingConfig (fine variant);
    pass a prebuilt ``eval_step`` to reuse one compile across calls.
    """
    if eval_step is None:
        eval_step = make_eval_step(model, cfg, grouping=grouping)
    G = cfg.model.num_crops
    feats: Dict[str, np.ndarray] = {}
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    for crops, labels, names in batches:
        x, x_global = eval_step(variables, crops)
        f = features_from_outputs(np.asarray(x), np.asarray(x_global), G)
        for i, name in enumerate(names):
            feats[name] = f[i]
            if out_dir:
                np.save(os.path.join(out_dir, name + ".npy"), f[i])
    return feats
