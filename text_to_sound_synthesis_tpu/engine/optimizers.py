"""Optimizer construction with the reference's decay/no-decay split.

Parity target: the minGPT-style parameter bucketing
(``diffusion_transformer.py:483-537``): weight decay applies ONLY to Linear
weights; biases, LayerNorm affine, and all embedding tables (incl. positional
height/width embeddings) are excluded. In our flax naming that is exactly the
leaves named ``kernel`` under Dense modules — embeddings are ``embedding`` and
norms are ``scale``/``bias``.

The learning rate is an ``optax.inject_hyperparams`` scalar so the host-side
plateau scheduler can update it without re-jitting.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import optax

__all__ = ["decay_mask", "build_optimizer"]


def decay_mask(params) -> Any:
    """True (apply weight decay) for Dense/Conv kernels only."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def leaf_decision(path) -> bool:
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        return names[-1] == "kernel"

    structure = jax.tree_util.tree_structure(params)
    decisions = [leaf_decision(path) for path, _ in flat]
    return jax.tree_util.tree_unflatten(structure, decisions)


def build_optimizer(optimizer_config: Mapping[str, Any], base_lr: float) -> optax.GradientTransformation:
    """Config schema mirrors the reference solver block (caps.yaml:109-120):
    ``{'target': 'torch.optim.AdamW'|'adamw', 'params': {betas, weight_decay}}``."""
    params = dict(optimizer_config.get("params") or {})
    target = str(optimizer_config.get("target", "adamw")).lower()
    betas = tuple(params.get("betas", (0.9, 0.96)))
    wd = float(params.get("weight_decay", 0.0))
    eps = float(params.get("eps", 1e-8))

    if "adamw" in target:
        tx = optax.inject_hyperparams(optax.adamw, static_args=("mask",))(
            learning_rate=base_lr, b1=betas[0], b2=betas[1], eps=eps,
            weight_decay=wd, mask=decay_mask,
        )
    elif "adam" in target:
        tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=base_lr, b1=betas[0], b2=betas[1], eps=eps
        )
    else:
        raise ValueError(f"unsupported optimizer target {optimizer_config.get('target')!r}")
    return tx


def set_learning_rate(opt_state, lr: float):
    """Update the injected lr hyperparameter in-place on the state pytree."""
    opt_state.hyperparams["learning_rate"] = jax.numpy.asarray(lr, dtype=jax.numpy.float32)
    return opt_state
