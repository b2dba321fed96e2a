"""Iteration-windowed global-norm gradient clipping.

Parity target: ``ClipGradNorm`` (``Diffsound/sound_synthesis/engine/clip_grad_norm.py:8-35``):
clip to ``max_norm`` only while ``start_iteration <= iter < end_iteration``
(caps.yaml: 0..5000, max_norm 0.5). Implemented as a pure pytree transform with
the window as a traced predicate (branch-free under jit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.config import register

__all__ = ["ClipGradNorm", "clip_by_global_norm"]


def clip_by_global_norm(grads, max_norm: float, active) -> tuple:
    """Returns (clipped_grads, global_norm). ``active`` gates the clipping."""
    leaves = jax.tree_util.tree_leaves(grads)
    gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
    scale = jnp.where(jnp.asarray(active), scale, 1.0)
    return jax.tree_util.tree_map(lambda g: g * scale.astype(g.dtype), grads), gnorm


@register(
    "text_to_sound_synthesis_tpu.engine.ClipGradNorm",
    "sound_synthesis.engine.clip_grad_norm.ClipGradNorm",
)
class ClipGradNorm:
    def __init__(self, start_iteration: int = 0, end_iteration: int = 5000,
                 max_norm: float = 0.5):
        self.start_iteration = start_iteration
        self.end_iteration = end_iteration
        self.max_norm = max_norm

    def __call__(self, grads, iteration):
        """iteration may be a traced scalar; returns (grads, global_norm)."""
        active = jnp.logical_and(
            iteration >= self.start_iteration, iteration < self.end_iteration
        )
        return clip_by_global_norm(grads, self.max_norm, active)
