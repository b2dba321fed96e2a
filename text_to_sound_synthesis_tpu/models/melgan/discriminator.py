"""MelGAN multi-scale discriminator.

Parity target: ``NLayerDiscriminator``/``Discriminator``
(``Diffsound/vocoder/modules.py:133-199``): 3 discriminators at 1x/2x/4x
average-pooled scales, each a stack of grouped strided convs returning ALL
intermediate feature maps (used by the feature-matching loss).
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
from flax import linen as nn

from ...utils.config import register
from .generator import reflect_pad_1d

__all__ = ["MelGANDiscriminator", "NLayerDiscriminator1d"]


class NLayerDiscriminator1d(nn.Module):
    ndf: int = 16
    n_layers: int = 4
    downsampling_factor: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        """wav (B, T, 1) -> list of feature maps, last entry is the logit map."""
        feats = []
        h = reflect_pad_1d(x, 7)
        h = nn.Conv(self.ndf, (15,), padding="VALID", dtype=self.dtype, name="layer_0")(h)
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)

        nf = self.ndf
        stride = self.downsampling_factor
        for n in range(1, self.n_layers + 1):
            nf_prev = nf
            nf = min(nf * stride, 1024)
            h = nn.Conv(
                nf, (stride * 10 + 1,), strides=(stride,), padding=stride * 5,
                feature_group_count=nf_prev // 4, dtype=self.dtype, name=f"layer_{n}",
            )(h)
            h = nn.leaky_relu(h, 0.2)
            feats.append(h)

        nf = min(nf * 2, 1024)
        h = nn.Conv(nf, (5,), padding=2, dtype=self.dtype, name=f"layer_{self.n_layers + 1}")(h)
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)
        h = nn.Conv(1, (3,), padding=1, dtype=self.dtype, name=f"layer_{self.n_layers + 2}")(h)
        feats.append(h)
        return feats


@register(
    "text_to_sound_synthesis_tpu.models.melgan.MelGANDiscriminator",
    "vocoder.modules.Discriminator",
)
class MelGANDiscriminator(nn.Module):
    num_D: int = 3
    ndf: int = 16
    n_layers: int = 4
    downsampling_factor: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[List[jnp.ndarray]]:
        """wav (B, T, 1) -> per-scale lists of feature maps."""
        results = []
        for i in range(self.num_D):
            results.append(
                NLayerDiscriminator1d(
                    self.ndf, self.n_layers, self.downsampling_factor,
                    self.dtype, name=f"disc_{i}",
                )(x)
            )
            # AvgPool1d(4, stride=2, padding=1, count_include_pad=False)
            padded = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
            ones = jnp.pad(jnp.ones_like(x), ((0, 0), (1, 1), (0, 0)))
            summed = nn.pooling.avg_pool(padded, (4,), strides=(2,), padding="VALID") * 4
            counts = nn.pooling.avg_pool(ones, (4,), strides=(2,), padding="VALID") * 4
            x = summed / counts
        return results
