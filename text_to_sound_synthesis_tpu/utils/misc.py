"""Misc utilities: seeding, parameter-count reporting.

Parity targets: ``Diffsound/sound_synthesis/utils/misc.py`` —
``seed_everything:9``, ``get_model_parameters_info:57`` (per-submodule
trainable/non-trainable parameter table).
"""

from __future__ import annotations

import random
from typing import Any, Dict

import numpy as np

__all__ = ["seed_everything", "get_model_parameters_info", "format_parameters_info"]


def seed_everything(seed: int | None) -> None:
    """Seed python/numpy. JAX randomness is explicit-key based; pass the same
    seed to ``jax.random.PRNGKey`` where keys are created."""
    if seed is None:
        return
    random.seed(seed)
    np.random.seed(seed)


def _count(tree) -> int:
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def get_model_parameters_info(params: Any) -> Dict[str, Dict[str, int]]:
    """{'<top-level-module>': {'total': n}, ..., 'overall': {...}} for a params
    pytree (or a dict of pytrees like the Diffsound composite's)."""
    info: Dict[str, Dict[str, int]] = {}
    total = 0
    items = params.items() if isinstance(params, dict) else [("params", params)]
    for name, sub in items:
        if sub is None:
            continue
        n = _count(sub)
        info[name] = {"total": n}
        total += n
    info["overall"] = {"total": total}
    return info


def format_parameters_info(info: Dict[str, Dict[str, int]]) -> str:
    lines = []
    for name, d in info.items():
        lines.append(f"{name}: {d['total'] / 1e6:.2f} M params")
    return "\n".join(lines)
