"""Linear-probe evaluation (linear_classify/linercls.py + fc_model.py).

Trains a single FC layer on concatenated motion+appearance per-video
features (2 streams x 11 crops x 512 = 11,264-d) and reports top-1/top-5.
Fixes the reference's dataset defect (dataset_of_lin.py:103-105 loads the
same two files for every index): features are keyed by video name.

Hyper-parameters match linercls.py: Adam(5e-3, betas (0.5,0.999), eps
1e-6), StepLR(5, 0.7) [epoch-indexed], 50 epochs, eval after epoch 15.
"""
from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from facl_tpu.config import ProbeConfig
from facl_tpu.losses.infonce import cross_entropy
from facl_tpu.models.probe import LinearProbe

Array = jax.Array


def topk_accuracy(logits: np.ndarray, labels: np.ndarray,
                  ks: Sequence[int] = (1, 5)) -> List[float]:
    """Percentage top-k accuracies (linercls.py:158-172)."""
    order = np.argsort(-logits, axis=1)
    out = []
    for k in ks:
        hit = (order[:, :k] == labels[:, None]).any(axis=1)
        out.append(100.0 * hit.mean())
    return out


def combine_streams(motion: Dict[str, np.ndarray],
                    appearance: Dict[str, np.ndarray],
                    names: Sequence[str], labels: Sequence[int]
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Concatenate per-video motion + appearance features
    (dataset_of_lin.py:103-107 intent)."""
    feats, labs = [], []
    for n, l in zip(names, labels):
        if n in motion and n in appearance:
            feats.append(np.concatenate([motion[n], appearance[n]]))
            labs.append(l)
    return np.stack(feats), np.asarray(labs, np.int32)


class LinearProbeTrainer:
    def __init__(self, cfg: ProbeConfig, feature_dim: Optional[int] = None,
                 seed: int = 1):
        self.cfg = cfg
        dim = feature_dim or cfg.feature_dim * cfg.crops_per_stream * \
            cfg.num_streams
        self.model = LinearProbe(num_classes=cfg.num_classes)
        self.params = self.model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, dim), jnp.float32))

        def schedule(step_epoch):
            return cfg.learning_rate * cfg.lr_decay_gamma ** (
                step_epoch // cfg.lr_decay_epochs)

        self._sched = schedule
        self.opt = optax.adam(cfg.learning_rate, b1=0.5, b2=0.999, eps=1e-6)
        self.opt_state = self.opt.init(self.params)

        def step(params, opt_state, feats, labels, lr_scale):
            def loss_fn(p):
                logits = self.model.apply(p, feats)
                return cross_entropy(logits, labels)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            # Scale the Adam step to follow the epoch-indexed StepLR.
            updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._step = jax.jit(step)
        self._predict = jax.jit(self.model.apply)

    def fit(self, feats: np.ndarray, labels: np.ndarray,
            test_feats: Optional[np.ndarray] = None,
            test_labels: Optional[np.ndarray] = None,
            rng: Optional[np.random.Generator] = None,
            log_fn=None) -> Dict[str, float]:
        cfg = self.cfg
        rng = rng or np.random.default_rng(1)
        n = feats.shape[0]
        B = min(cfg.batch_size, n)
        feats_j = jnp.asarray(feats)
        labels_j = jnp.asarray(labels)
        best = {"top1": -1.0, "top5": 0.0, "epoch": -1}
        for epoch in range(cfg.num_epochs):
            order = rng.permutation(n)
            lr_scale = self._sched(epoch) / cfg.learning_rate
            for i in range(n // B):
                idx = jnp.asarray(order[i * B:(i + 1) * B])
                self.params, self.opt_state, loss = self._step(
                    self.params, self.opt_state, feats_j[idx],
                    labels_j[idx], lr_scale)
            # Reference gate: eval after epoch 15 (linercls.py:137) — but
            # always evaluate the final epoch so short runs report a score.
            if test_feats is not None and (epoch > cfg.eval_after_epoch
                                           or epoch == cfg.num_epochs - 1):
                top1, top5 = self.evaluate(test_feats, test_labels)
                if log_fn:
                    log_fn({"epoch": epoch, "loss": float(loss),
                            "top1": top1, "top5": top5})
                if top1 > best["top1"]:
                    best = {"top1": top1, "top5": top5, "epoch": epoch}
        return best

    def evaluate(self, feats: np.ndarray, labels: np.ndarray
                 ) -> Tuple[float, float]:
        logits = np.asarray(self._predict(self.params, jnp.asarray(feats)))
        t1, t5 = topk_accuracy(logits, np.asarray(labels), (1, 5))
        return t1, t5
