"""Supervised mel-classifier training: shared engine for VGGishish & Melception.

Parity targets: the standalone trainers that produce the perceptual/eval
networks (``Codebook/specvqgan/modules/losses/vggishish/train_vggishish.py``,
``train_melception.py``, ``loss.py`` WeightedCrossEntropy,
``metrics.py`` accuracy@k / mAP / d-prime).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct
import optax

__all__ = ["weighted_cross_entropy", "classification_metrics",
           "ClassifierTrainState", "make_classifier_train_step"]


def weighted_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray,
                           weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """sum(w_y * ce) / sum(w_y) — the reference WeightedCrossEntropy (loss.py)."""
    ce = optax.softmax_cross_entropy_with_integer_labels(logits.astype(jnp.float32), targets)
    if weights is None:
        return ce.mean()
    w = weights[targets]
    return jnp.sum(ce * w) / jnp.sum(w)


def classification_metrics(targets: np.ndarray, logits: np.ndarray,
                           topk=(1, 5)) -> Dict[str, float]:
    """accuracy@k, mAP, mean ROC-AUC, d-prime (metrics.py:10-60)."""
    out: Dict[str, float] = {}
    order = np.argsort(-logits, axis=1)
    for k in topk:
        hit = (order[:, :k] == targets[:, None]).any(axis=1)
        out[f"accuracy_{k}"] = float(hit.mean())

    num_cls = logits.shape[1]
    probs = np.exp(logits - logits.max(1, keepdims=True))
    probs /= probs.sum(1, keepdims=True)
    onehot = np.eye(num_cls)[targets]

    aps, aucs = [], []
    for c in range(num_cls):
        y, s = onehot[:, c], probs[:, c]
        if y.sum() == 0 or y.sum() == len(y):
            continue
        aps.append(_average_precision(y, s))
        aucs.append(_roc_auc(y, s))
    if aps:
        out["mAP"] = float(np.mean(aps))
    if aucs:
        mauc = float(np.mean(aucs))
        out["mROCAUC"] = mauc
        from scipy.stats import norm

        out["dprime"] = float(norm.ppf(np.clip(mauc, 1e-6, 1 - 1e-6)) * np.sqrt(2))
    return out


def _average_precision(y: np.ndarray, scores: np.ndarray) -> float:
    order = np.argsort(-scores)
    y = y[order]
    cum_pos = np.cumsum(y)
    precision = cum_pos / np.arange(1, len(y) + 1)
    return float((precision * y).sum() / max(y.sum(), 1))


def _roc_auc(y: np.ndarray, scores: np.ndarray) -> float:
    # Mann-Whitney with AVERAGE ranks for ties (sklearn semantics): ordinal
    # ranks make tied positive/negative scores contribute 1.0 or 0.0 by
    # argsort order instead of the correct 0.5
    order = np.argsort(scores)
    ranks = np.empty(len(scores))
    ranks[order] = np.arange(1, len(scores) + 1)
    s = scores[order]
    i = 0
    while i < len(s):
        j = i
        while j + 1 < len(s) and s[j + 1] == s[i]:
            j += 1
        if j > i:
            ranks[order[i:j + 1]] = (i + j) / 2 + 1
        i = j + 1
    n_pos, n_neg = y.sum(), (1 - y).sum()
    return float((ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


class ClassifierTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    variables: Any   # params (+ batch_stats for BN variants)
    opt_state: Any

    @classmethod
    def create(cls, variables, tx):
        return cls(jnp.zeros((), jnp.int32), variables, tx.init(variables["params"]))


def make_classifier_train_step(model, tx: optax.GradientTransformation,
                               class_weights: Optional[jnp.ndarray] = None,
                               donate: bool = True) -> Callable:
    """jitted ``step(state, mel, target) -> (state, metrics)``; handles models
    with or without BatchNorm batch_stats."""

    def step_fn(state: ClassifierTrainState, mel, target):
        has_bn = "batch_stats" in state.variables

        def loss_fn(params):
            variables = dict(state.variables, params=params)
            if has_bn:
                logits, mut = model.apply(variables, mel, train=True,
                                          mutable=["batch_stats"])
            else:
                logits, mut = model.apply(variables, mel), {}
            loss = weighted_cross_entropy(logits, target, class_weights)
            return loss, (logits, mut)

        (loss, (logits, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.variables["params"]
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.variables["params"])
        variables = dict(state.variables,
                         params=optax.apply_updates(state.variables["params"], updates),
                         **mut)
        acc = jnp.mean((jnp.argmax(logits, -1) == target).astype(jnp.float32))
        new_state = state.replace(step=state.step + 1, variables=variables,
                                  opt_state=opt_state)
        return new_state, {"loss": loss, "accuracy": acc}

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
