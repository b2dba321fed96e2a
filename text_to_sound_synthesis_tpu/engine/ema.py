"""EMA of parameters as a functional pytree update.

Parity target: ``EMA`` (``Diffsound/sound_synthesis/engine/ema.py:8-70``):
decay 0.99 applied every ``update_interval`` (25) optimizer steps to the
diffusion transformer's parameters only; inference prefers EMA weights.

TPU-native: the shadow tree lives in device HBM inside the train state (the
reference shuttles a CPU copy every 25 steps — a pointless D2H round trip on
an accelerator with enough memory).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ema_update"]


def ema_update(ema_params, params, decay: float, do_update) -> object:
    """shadow <- decay*shadow + (1-decay)*params where ``do_update`` (scalar
    bool) gates the step; identity otherwise. Safe inside jit."""
    do = jnp.asarray(do_update)

    def _upd(e, p):
        new = decay * e + (1.0 - decay) * p.astype(e.dtype)
        return jnp.where(do, new, e)

    return jax.tree_util.tree_map(_upd, ema_params, params)
