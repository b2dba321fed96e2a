"""Token-grid permuters: factorization orders for the (H, W) code grid.

Parity target: ``Codebook/specvqgan/modules/transformer/permuter.py`` —
``ColumnMajor`` (time-major order used by both the AR baseline and Diffsound,
caps.yaml:26-30), ``Identity``, ``Subsample`` (hierarchical 2x2), ``ZCurve``
(Morton order). Pure index arrays; applied with a static gather.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..utils.config import register

__all__ = ["Identity", "ColumnMajor", "Subsample", "ZCurve"]


class _IndexPermuter:
    """Precomputed forward/backward index permutation over L = H*W tokens."""

    def __init__(self, idx: np.ndarray):
        self.forward_idx = jnp.asarray(idx, jnp.int32)
        self.backward_idx = jnp.asarray(np.argsort(idx), jnp.int32)

    def __call__(self, x, reverse: bool = False):
        """x: (..., L) token ids (or any per-position array)."""
        idx = self.backward_idx if reverse else self.forward_idx
        return jnp.take(x, idx, axis=-1)


@register(
    "text_to_sound_synthesis_tpu.ops.permuter.Identity",
    "specvqgan.modules.transformer.permuter.Identity",
)
class Identity(_IndexPermuter):
    def __init__(self, H: int = 1, W: int = 1):
        super().__init__(np.arange(H * W))

    def __call__(self, x, reverse: bool = False):
        return x


@register(
    "text_to_sound_synthesis_tpu.ops.permuter.ColumnMajor",
    "specvqgan.modules.transformer.permuter.ColumnMajor",
)
class ColumnMajor(_IndexPermuter):
    """Row-major (H, W) grid -> time-major order: column by column
    (permuter.py:21-55). For specs: emit all mel bins of frame 0, then frame 1, ..."""

    def __init__(self, H: int, W: int):
        self.H, self.W = H, W
        super().__init__(np.arange(H * W).reshape(H, W).T.ravel())


@register(
    "text_to_sound_synthesis_tpu.ops.permuter.Subsample",
    "specvqgan.modules.transformer.permuter.Subsample",
)
class Subsample(_IndexPermuter):
    """Coarse-to-fine 2x2 hierarchical order (permuter.py:57-80)."""

    def __init__(self, H: int, W: int):
        C = 1
        idx = np.arange(H * W).reshape(C, H, W)
        while min(H, W) > 1:
            idx = idx.reshape(C, H // 2, 2, W // 2, 2)
            idx = idx.transpose(0, 2, 4, 1, 3)
            idx = idx.reshape(C * 4, H // 2, W // 2)
            H, W, C = H // 2, W // 2, C * 4
        assert H == W == 1, "Subsample requires power-of-two square-reducible grids"
        super().__init__(idx.ravel())


def _morton(i: int, j: int) -> int:
    z = 0
    for bit in range(32):
        z |= ((j >> bit) & 1) << (2 * bit)
        z |= ((i >> bit) & 1) << (2 * bit + 1)
    return z


@register(
    "text_to_sound_synthesis_tpu.ops.permuter.ZCurve",
    "specvqgan.modules.transformer.permuter.ZCurve",
)
class ZCurve(_IndexPermuter):
    """Morton (Z-order) curve (permuter.py:98-115)."""

    def __init__(self, H: int, W: int):
        codes = [_morton(i, j) for i in range(H) for j in range(W)]
        super().__init__(np.argsort(codes))
