"""SpecVQGAN conv encoder/decoder stacks — flax.linen, NHWC, TPU-first.

Capability parity with the taming-style stacks in
``Codebook/specvqgan/modules/diffusionmodules/model.py`` (Encoder:410, Decoder:570,
ResnetBlock:92, AttnBlock:174, Upsample:37, Downsample:60, Normalize:34): GroupNorm(32)
+ swish ResNet blocks, single-head self-attention at the coarsest time resolution,
stride-2 conv downsampling with the (0,1,0,1) asymmetric pad, nearest-neighbor 2x
upsampling.

TPU-native redesign notes:
* NHWC activations / HWIO kernels (XLA's native conv layout on TPU) instead of NCHW.
* attention is a batched ``jnp.einsum`` over the flattened (H*W) grid — XLA maps it
  onto the MXU; no 1x1-conv-qkv reshuffling.
* ``resolution`` tracks the time axis (848 -> 53 at 16x downsampling), matching how
  the reference's ``curr_res`` interacts with ``attn_resolutions=[53]``.
* optional ``dtype`` (e.g. bfloat16) for activations; params stay float32.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["Encoder", "Decoder", "ResnetBlock", "AttnBlock", "Upsample", "Downsample"]


def swish(x):
    return x * nn.sigmoid(x)


class GroupNorm32(nn.Module):
    """GroupNorm(32, eps=1e-6, affine) — the ``Normalize`` helper (model.py:34).

    Production channel counts are multiples of 32; for smaller test configs the
    group count degrades gracefully to gcd(C, 32).
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import math as _math

        groups = _math.gcd(x.shape[-1], 32)
        return nn.GroupNorm(num_groups=groups, epsilon=1e-6, dtype=self.dtype, name="norm")(x)


class ResnetBlock(nn.Module):
    """norm-swish-conv x2 with projection shortcut (model.py:92-151).

    The reference's timestep-embedding slot (``temb``) is never used by the
    SpecVQGAN encoder/decoder (temb_channels=0), so it is omitted entirely.
    """

    out_channels: int | None = None
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        out_ch = self.out_channels or x.shape[-1]
        h = GroupNorm32(dtype=self.dtype, name="norm1")(x)
        h = swish(h)
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(dtype=self.dtype, name="norm2")(h)
        h = swish(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != out_ch:
            x = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head self-attention over the (H, W) grid (model.py:174-226)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GroupNorm32(dtype=self.dtype, name="norm")(x)
        q = nn.Conv(C, (1, 1), dtype=self.dtype, name="q")(h).reshape(B, H * W, C)
        k = nn.Conv(C, (1, 1), dtype=self.dtype, name="k")(h).reshape(B, H * W, C)
        v = nn.Conv(C, (1, 1), dtype=self.dtype, name="v")(h).reshape(B, H * W, C)
        att = jnp.einsum("bic,bjc->bij", q, k) * (C ** -0.5)
        att = nn.softmax(att.astype(jnp.float32), axis=-1).astype(v.dtype)
        h = jnp.einsum("bij,bjc->bic", att, v).reshape(B, H, W, C)
        h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return x + h


class Downsample(nn.Module):
    """Stride-2 conv with the reference's asymmetric (bottom/right) padding
    (model.py:60-77), or 2x2 average pooling."""

    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding="VALID",
                           dtype=self.dtype, name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Upsample(nn.Module):
    """2x nearest-neighbor upsample + 3x3 conv (model.py:37-52)."""

    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.with_conv:
            x = nn.Conv(C, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)
        return x


class Encoder(nn.Module):
    """Mel (B, H=n_mels, W=T, 1) -> latent (B, H/16, W/16, z_channels).

    Config mirrors ``ddconfig`` (audioset_codebook.yaml / caps.yaml): ch=128,
    ch_mult=[1,1,2,2,4], num_res_blocks=2, attn at time-resolution 53.
    """

    ch: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (53,)
    dropout: float = 0.0
    resamp_with_conv: bool = True
    in_channels: int = 1
    resolution: int = 848  # time-axis length
    z_channels: int = 256
    double_z: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        num_levels = len(self.ch_mult)
        curr_res = self.resolution
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i_level in range(num_levels):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock(block_out, self.dropout, self.dtype,
                                name=f"down_{i_level}_block_{i_block}")(h, deterministic=deterministic)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(self.dtype, name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != num_levels - 1:
                h = Downsample(self.resamp_with_conv, self.dtype,
                               name=f"down_{i_level}_downsample")(h)
                curr_res //= 2
        h = ResnetBlock(None, self.dropout, self.dtype, name="mid_block_1")(h, deterministic=deterministic)
        h = AttnBlock(self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(None, self.dropout, self.dtype, name="mid_block_2")(h, deterministic=deterministic)
        h = GroupNorm32(dtype=self.dtype, name="norm_out")(h)
        h = swish(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    """Latent (B, h, w, z_channels) -> mel (B, H, W, out_ch) in [-1, 1] range."""

    ch: int = 128
    out_ch: int = 1
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (53,)
    dropout: float = 0.0
    resamp_with_conv: bool = True
    resolution: int = 848
    z_channels: int = 256
    give_pre_end: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, *, deterministic: bool = True):
        num_levels = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        curr_res = self.resolution // 2 ** (num_levels - 1)
        h = nn.Conv(block_in, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(None, self.dropout, self.dtype, name="mid_block_1")(h, deterministic=deterministic)
        h = AttnBlock(self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(None, self.dropout, self.dtype, name="mid_block_2")(h, deterministic=deterministic)
        for i_level in reversed(range(num_levels)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlock(block_out, self.dropout, self.dtype,
                                name=f"up_{i_level}_block_{i_block}")(h, deterministic=deterministic)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(self.dtype, name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample(self.resamp_with_conv, self.dtype, name=f"up_{i_level}_upsample")(h)
                curr_res *= 2
        if self.give_pre_end:
            return h
        h = GroupNorm32(dtype=self.dtype, name="norm_out")(h)
        h = swish(h)
        return nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)
