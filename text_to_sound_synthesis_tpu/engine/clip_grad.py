"""Iteration-windowed global-norm gradient clipping.

Parity target: ``ClipGradNorm`` (``Diffsound/sound_synthesis/engine/clip_grad_norm.py:8-35``).
NOTE the reference's conditions are OR-ed, not a window: clip when
``iter >= start_iteration`` OR (``end_iteration > 0`` AND
``iter < end_iteration``) — so with the flagship caps.yaml params
(start 0, end 5000, max_norm 0.5) it clips at EVERY iteration forever, and
with the constructor default ``end_iteration=-1`` it is also always on
(via ``start=0``). Reproduced faithfully (a plain [start, end) window would
silently stop clipping at iter 5000). Implemented as a pure pytree transform
with the predicate traced (branch-free under jit).
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
    def __init__(self, start_iteration: int = 0, end_iteration: int = -1,
                 max_norm: float = 0.5):
        self.start_iteration = start_iteration
        self.end_iteration = end_iteration
        self.max_norm = max_norm

    def __call__(self, grads, iteration):
        """iteration may be a traced scalar; returns (grads, global_norm).

        Reference semantics (clip_grad_norm.py:20-28): the two conditions are
        OR-ed — see the module docstring."""
        active = iteration >= self.start_iteration
        if self.end_iteration > 0:  # static config value
            active = jnp.logical_or(active, iteration < self.end_iteration)
        return clip_by_global_norm(grads, self.max_norm, active)
