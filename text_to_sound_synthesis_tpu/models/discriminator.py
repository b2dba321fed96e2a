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

__all__ = [
    "NLayerDiscriminator",
    "NLayerDiscriminator1dFeats",
    "NLayerDiscriminator1dSpecs",
    "ActNorm",
]


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


class _Disc1dBase(nn.Module):
    """Shared plumbing for the 1-D PatchGAN variants: sequence of
    (channels, stride) 4-wide convs with BatchNorm1d/ActNorm + LeakyReLU 0.2,
    operating on (B, L, C) NWC sequences."""

    input_nc: int = 1
    ndf: int = 64
    n_layers: int = 3
    use_actnorm: bool = False
    dtype: jnp.dtype = jnp.float32

    def _stages(self):
        """-> list of (out_channels, stride) for the normed middle convs."""
        raise NotImplementedError

    def _first_channels(self) -> int:
        raise NotImplementedError

    def _run(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        """Body shared by the variants; call only from a compact method."""

        def norm(h, name):
            if self.use_actnorm:
                return ActNorm(dtype=self.dtype, name=name)(h)
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name)(h)

        use_bias = self.use_actnorm
        h = nn.Conv(self._first_channels(), (4,), strides=(2,), padding=1,
                    dtype=self.dtype, name="conv_0")(x)
        h = nn.leaky_relu(h, 0.2)
        for i, (ch, stride) in enumerate(self._stages(), start=1):
            h = nn.Conv(ch, (4,), strides=(stride,), padding=1,
                        use_bias=use_bias, dtype=self.dtype, name=f"conv_{i}")(h)
            h = norm(h, f"norm_{i}")
            h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4,), strides=(1,), padding=1, dtype=self.dtype,
                       name="conv_out")(h)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = True) -> jnp.ndarray:
        return self._run(x, train)


@register(
    "text_to_sound_synthesis_tpu.models.NLayerDiscriminator1dFeats",
    "specvqgan.modules.discriminator.model.NLayerDiscriminator1dFeats",
)
class NLayerDiscriminator1dFeats(_Disc1dBase):
    """1-D PatchGAN over feature sequences (B, L, input_nc) — channel count
    HALVES down to a floor of 8 (reference ``model.py:149-203``; note its
    channel arithmetic divides by ``2**n`` with ``n`` frozen at the loop
    index, reproduced exactly)."""

    input_nc: int = 2048

    def _first_channels(self) -> int:
        return self.input_nc // 2

    def _stages(self):
        stages = []
        nf = self.input_nc // 2
        n = 1
        for n in range(1, self.n_layers):
            nf = max(nf // (2 ** n), 8)
            stages.append((nf, 2))
        for _ in range(2):  # two stride-1 tail convs (model.py:186-200)
            nf = max(nf // (2 ** n), 8)
            stages.append((nf, 1))
        return stages


@register(
    "text_to_sound_synthesis_tpu.models.NLayerDiscriminator1dSpecs",
    "specvqgan.modules.discriminator.model.NLayerDiscriminator1dSpecs",
)
class NLayerDiscriminator1dSpecs(_Disc1dBase):
    """1-D PatchGAN over spectrogram sequences: mel bins are the channel axis
    (reference ``model.py:205-259``). Accepts (B, L, input_nc) NWC or the
    codec's (B, input_nc, L, 1) NHWC mel layout (the reference squeezes the
    1-channel dim and treats mel bins as channels)."""

    input_nc: int = 80

    def _first_channels(self) -> int:
        return self.ndf

    def _stages(self):
        stages = []
        for n in range(1, self.n_layers):
            stages.append((self.ndf * min(2 ** n, 8), 2))
        stages.append((self.ndf * min(2 ** self.n_layers, 8), 1))
        return stages

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = True) -> jnp.ndarray:
        if x.ndim == 4:  # (B, mel, T, 1) codec layout -> (B, T, mel)
            x = jnp.swapaxes(x[..., 0], 1, 2)
        return self._run(x, train)
