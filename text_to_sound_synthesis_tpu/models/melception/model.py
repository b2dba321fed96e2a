"""Melception: InceptionV3 retrained on 1-channel mel spectrograms.

Parity target: ``Melception`` (``Codebook/evaluation/feature_extractors/melception.py:5``)
— torchvision Inception3 with (a) a 1-channel stem conv, (b) both stem max-pools
removed (mel height is 80, not 299), (c) 309 VGGSound classes, and feature taps
['logits_unbiased', '2048', 'logits'] used by the FID/ISc/KID/KL suite.

TPU-native: NHWC; eval-mode BatchNorm folded into per-channel scale/shift at
checkpoint conversion (torchvision BasicConv2d = conv(no bias) + BN(eps=1e-3) +
ReLU), so inference is pure conv+affine — no batch statistics anywhere.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...utils.config import register

__all__ = ["Melception"]


class BasicConv2d(nn.Module):
    """conv (no bias) + folded-BN affine + relu."""

    out_channels: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_channels, self.kernel_size, strides=self.strides,
                    padding=[(self.padding[0],) * 2, (self.padding[1],) * 2],
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.out_channels,))
        shift = self.param("bn_shift", nn.initializers.zeros, (self.out_channels,))
        return nn.relu(x * scale + shift)


def _avgpool3(x):
    # torch avg_pool2d(kernel=3, stride=1, padding=1, count_include_pad=True)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return nn.avg_pool(xp, (3, 3), strides=(1, 1), padding="VALID")


def _maxpool3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")


class InceptionA(nn.Module):
    pool_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), dtype=self.dtype, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), dtype=self.dtype, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=self.dtype, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=self.dtype, name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=self.dtype, name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), dtype=self.dtype, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=self.dtype, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), dtype=self.dtype, name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _maxpool3s2(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), dtype=self.dtype, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=self.dtype, name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=self.dtype, name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), dtype=self.dtype, name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=self.dtype, name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=self.dtype, name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=self.dtype, name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=self.dtype, name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), dtype=self.dtype, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=self.dtype, name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=self.dtype, name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), dtype=self.dtype, name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _maxpool3s2(x)], axis=-1)


class InceptionE(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=self.dtype, name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=self.dtype, name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), dtype=self.dtype, name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=self.dtype, name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=self.dtype, name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = BasicConv2d(192, (1, 1), dtype=self.dtype, name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


@register(
    "text_to_sound_synthesis_tpu.models.melception.Melception",
    "evaluation.feature_extractors.melception.Melception",
)
class Melception(nn.Module):
    num_classes: int = 309
    features_list: Sequence[str] = ("logits_unbiased", "2048", "logits")
    dtype: jnp.dtype = jnp.float32
    feature_extractor_weights_path: str | None = None  # config parity; loaded via convert

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """mel (B, 80, T) standardized -> requested feature dict."""
        feats: Dict[str, jnp.ndarray] = {}
        x = mel[..., None]  # NHWC
        x = BasicConv2d(32, (3, 3), strides=(2, 2), dtype=self.dtype, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), dtype=self.dtype, name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), dtype=self.dtype, name="Conv2d_2b_3x3")(x)
        # maxpool1 removed (melception.py:15-16)
        if "64" in self.features_list:
            feats["64"] = jnp.mean(x, axis=(1, 2))
        x = BasicConv2d(80, (1, 1), dtype=self.dtype, name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), dtype=self.dtype, name="Conv2d_4a_3x3")(x)
        # maxpool2 removed
        if "192" in self.features_list:
            feats["192"] = jnp.mean(x, axis=(1, 2))
        x = InceptionA(32, self.dtype, name="Mixed_5b")(x)
        x = InceptionA(64, self.dtype, name="Mixed_5c")(x)
        x = InceptionA(64, self.dtype, name="Mixed_5d")(x)
        x = InceptionB(self.dtype, name="Mixed_6a")(x)
        x = InceptionC(128, self.dtype, name="Mixed_6b")(x)
        x = InceptionC(160, self.dtype, name="Mixed_6c")(x)
        x = InceptionC(160, self.dtype, name="Mixed_6d")(x)
        x = InceptionC(192, self.dtype, name="Mixed_6e")(x)
        if "768" in self.features_list:
            feats["768"] = jnp.mean(x, axis=(1, 2))
        x = InceptionD(self.dtype, name="Mixed_7a")(x)
        x = InceptionE(self.dtype, name="Mixed_7b")(x)
        x = InceptionE(self.dtype, name="Mixed_7c")(x)
        pooled = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
        if "2048" in self.features_list:
            feats["2048"] = pooled
        fc_kernel = self.param("fc_kernel", nn.initializers.lecun_normal(), (2048, self.num_classes))
        fc_bias = self.param("fc_bias", nn.initializers.zeros, (self.num_classes,))
        logits_unbiased = pooled @ fc_kernel.astype(pooled.dtype)
        if "logits_unbiased" in self.features_list:
            feats["logits_unbiased"] = logits_unbiased
        if "logits" in self.features_list:
            feats["logits"] = logits_unbiased + fc_bias.astype(pooled.dtype)
        return feats
