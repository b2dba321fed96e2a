"""PatchGAN discriminators for Stage-1 adversarial training.

Parity target: ``Codebook/specvqgan/modules/discriminator/model.py`` —
``NLayerDiscriminator`` (pix2pix: 4x4 stride-2 convs, BatchNorm or ActNorm,
LeakyReLU 0.2, 1-channel logit map) and ``ActNorm:5`` (per-channel affine with
data-dependent init). The 1-channel spectrogram variant is the production
configuration (audioset_codebook.yaml: disc_in_channels=1, n_layers=3, ndf=64).

BatchNorm runs on batch statistics during GAN training (the reference enables
SyncBatchNorm across GPUs; under SPMD the batch axis is already global when the
train step is jitted over the mesh with sharded inputs and XLA lowers the
batch-stat reductions to cross-replica collectives).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..utils.config import register

__all__ = ["NLayerDiscriminator", "ActNorm"]


class ActNorm(nn.Module):
    """Per-channel affine; the reference's data-dependent init is replaced by a
    converted checkpoint or standard init (logdet path unused by the GAN)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        loc = self.param("loc", nn.initializers.zeros, (C,))
        scale = self.param("scale", nn.initializers.ones, (C,))
        return scale * (x + loc)


@register(
    "text_to_sound_synthesis_tpu.models.NLayerDiscriminator",
    "specvqgan.modules.discriminator.model.NLayerDiscriminator",
)
class NLayerDiscriminator(nn.Module):
    input_nc: int = 1
    ndf: int = 64
    n_layers: int = 3
    use_actnorm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = True) -> jnp.ndarray:
        """(B, H, W, input_nc) -> (B, h, w, 1) patch logits."""

        def norm(h, name):
            if self.use_actnorm:
                return ActNorm(dtype=self.dtype, name=name)(h)
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name)(h)

        use_bias = self.use_actnorm  # BatchNorm has affine -> conv bias off
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=1, dtype=self.dtype,
                    name="conv_0")(x)
        h = nn.leaky_relu(h, 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2**n, 8)
            h = nn.Conv(self.ndf * nf, (4, 4), strides=(2, 2), padding=1,
                        use_bias=use_bias, dtype=self.dtype, name=f"conv_{n}")(h)
            h = norm(h, f"norm_{n}")
            h = nn.leaky_relu(h, 0.2)
        nf = min(2**self.n_layers, 8)
        h = nn.Conv(self.ndf * nf, (4, 4), strides=(1, 1), padding=1,
                    use_bias=use_bias, dtype=self.dtype, name=f"conv_{self.n_layers}")(h)
        h = norm(h, f"norm_{self.n_layers}")
        h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4), strides=(1, 1), padding=1, dtype=self.dtype,
                       name="conv_out")(h)
