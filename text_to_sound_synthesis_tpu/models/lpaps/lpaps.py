"""LPAPS: learned perceptual loss on spectrograms (LPIPS adapted to audio).

Parity target: ``LPAPS`` (``Codebook/specvqgan/modules/losses/lpaps.py:17-97``):
per-frequency standardization (``ScalingLayer``: train-set mean/std mapped from
[0,1] stats to the model's [-1,1] domain), frozen VGGishish 5-slice features,
unit-normalization over channels, squared diffs through 1x1 no-bias "lin"
heads, spatial mean, summed over slices. Output (B, 1, 1, 1)-equivalent scalar
per sample.

The AudioSet variant (``lpaps_audioset.py`` ``LPLoss``) is the same computation
with AudioSet-trained weights — same module, different converted checkpoint.
"""

from __future__ import annotations



import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from ...utils.config import register

__all__ = ["LPAPS"]

_CHNS = (64, 128, 256, 512, 512)


@register(
    "text_to_sound_synthesis_tpu.models.lpaps.LPAPS",
    "specvqgan.modules.losses.lpaps.LPAPS",
    "specvqgan.modules.losses.lpaps_audioset.LPLoss",
)
class LPAPS(nn.Module):
    n_mels: int = 80
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        from .vggishish import VGGishish

        self.net = VGGishish(dtype=self.dtype, name="net")
        # per-frequency shift/scale; converted from the released
        # vggishish_mean_std file ([0,1] stats -> shift=2m-1, scale=2s)
        self.shift = self.param("shift", nn.initializers.zeros, (self.n_mels,))
        self.scale = self.param("scale", nn.initializers.ones, (self.n_mels,))
        self.lins = [
            self.param(f"lin{i}", nn.initializers.ones, (c, 1)) for i, c in enumerate(_CHNS)
        ]

    def _scaled(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 1) in [-1,1] -> standardized per mel bin (freq = H axis)."""
        return (x - self.shift[None, :, None, None]) / self.scale[None, :, None, None]

    def __call__(self, inputs: jnp.ndarray, reconstructions: jnp.ndarray) -> jnp.ndarray:
        """Both (B, H, W, 1) in [-1, 1]; returns (B,) perceptual distances."""
        f0 = self.net(self._scaled(inputs)[..., 0], return_features=True)
        f1 = self.net(self._scaled(reconstructions)[..., 0], return_features=True)
        total = 0.0
        for i, (a, b) in enumerate(zip(f0, f1)):
            na = a / (jnp.sqrt(jnp.sum(a**2, axis=-1, keepdims=True)) + 1e-10)
            nb = b / (jnp.sqrt(jnp.sum(b**2, axis=-1, keepdims=True)) + 1e-10)
            diff = (na - nb) ** 2
            head = jnp.einsum("bhwc,co->bhwo", diff, self.lins[i].astype(diff.dtype))
            total = total + jnp.mean(head, axis=(1, 2, 3))
        return total
