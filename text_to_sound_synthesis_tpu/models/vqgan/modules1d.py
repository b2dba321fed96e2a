"""1-D SpecVQGAN variants: codecs over feature sequences (B, T, C).

Parity targets: ``Encoder1d``/``Decoder1d``/``ResnetBlock1d``/``AttnBlock1d``/
``Upsample1d``/``Downsample1d`` (``Codebook/specvqgan/modules/diffusionmodules/model.py:54-89,
153-171, 228-260, 502-567, 673-700``) and ``VQModel1d`` (``models/vqgan.py:171``) —
the feature-based SpecVQGAN configuration (1-D convs over time, symmetric (1,1)
downsample padding unlike the 2-D asymmetric pad).
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...utils.config import register
from .modules import GroupNorm32, swish
from .quantize import VectorQuantizer, VQResult

__all__ = ["Encoder1d", "Decoder1d", "VQModel1d"]


class ResnetBlock1d(nn.Module):
    out_channels: int | None = None
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        out_ch = self.out_channels or x.shape[-1]
        h = GroupNorm32(dtype=self.dtype, name="norm1")(x)
        h = swish(h)
        h = nn.Conv(out_ch, (3,), padding=1, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(dtype=self.dtype, name="norm2")(h)
        h = swish(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(out_ch, (3,), padding=1, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != out_ch:
            x = nn.Conv(out_ch, (1,), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock1d(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        h = GroupNorm32(dtype=self.dtype, name="norm")(x)
        q = nn.Conv(C, (1,), dtype=self.dtype, name="q")(h)
        k = nn.Conv(C, (1,), dtype=self.dtype, name="k")(h)
        v = nn.Conv(C, (1,), dtype=self.dtype, name="v")(h)
        att = jnp.einsum("bic,bjc->bij", q, k) * (C**-0.5)
        att = nn.softmax(att.astype(jnp.float32), axis=-1).astype(v.dtype)
        h = jnp.einsum("bij,bjc->bic", att, v)
        h = nn.Conv(C, (1,), dtype=self.dtype, name="proj_out")(h)
        return x + h


class Downsample1d(nn.Module):
    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.with_conv:  # symmetric (1,1) pad (model.py:79-89)
            x = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
            return nn.Conv(x.shape[-1], (3,), strides=(2,), padding="VALID",
                           dtype=self.dtype, name="conv")(x)
        return nn.avg_pool(x, (2,), strides=(2,))


class Upsample1d(nn.Module):
    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(x, 2, axis=1)
        if self.with_conv:
            x = nn.Conv(x.shape[-1], (3,), padding=1, dtype=self.dtype, name="conv")(x)
        return x


class Encoder1d(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    resamp_with_conv: bool = True
    in_channels: int = 2048
    resolution: int = 212
    z_channels: int = 256
    double_z: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        num_levels = len(self.ch_mult)
        curr_res = self.resolution
        h = nn.Conv(self.ch, (3,), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i_level in range(num_levels):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock1d(block_out, self.dropout, self.dtype,
                                  name=f"down_{i_level}_block_{i_block}")(h, deterministic=deterministic)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock1d(self.dtype, name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != num_levels - 1:
                h = Downsample1d(self.resamp_with_conv, self.dtype,
                                 name=f"down_{i_level}_downsample")(h)
                curr_res //= 2
        h = ResnetBlock1d(None, self.dropout, self.dtype, name="mid_block_1")(h, deterministic=deterministic)
        h = AttnBlock1d(self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock1d(None, self.dropout, self.dtype, name="mid_block_2")(h, deterministic=deterministic)
        h = GroupNorm32(dtype=self.dtype, name="norm_out")(h)
        h = swish(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_ch, (3,), padding=1, dtype=self.dtype, name="conv_out")(h)


class Decoder1d(nn.Module):
    ch: int = 128
    out_ch: int = 2048
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    resamp_with_conv: bool = True
    resolution: int = 212
    z_channels: int = 256
    give_pre_end: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, *, deterministic: bool = True):
        num_levels = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        curr_res = self.resolution // 2 ** (num_levels - 1)
        h = nn.Conv(block_in, (3,), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock1d(None, self.dropout, self.dtype, name="mid_block_1")(h, deterministic=deterministic)
        h = AttnBlock1d(self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock1d(None, self.dropout, self.dtype, name="mid_block_2")(h, deterministic=deterministic)
        for i_level in reversed(range(num_levels)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = ResnetBlock1d(block_out, self.dropout, self.dtype,
                                  name=f"up_{i_level}_block_{i_block}")(h, deterministic=deterministic)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock1d(self.dtype, name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample1d(self.resamp_with_conv, self.dtype, name=f"up_{i_level}_upsample")(h)
                curr_res *= 2
        if self.give_pre_end:
            return h
        h = GroupNorm32(dtype=self.dtype, name="norm_out")(h)
        h = swish(h)
        return nn.Conv(self.out_ch, (3,), padding=1, dtype=self.dtype, name="conv_out")(h)


@register(
    "text_to_sound_synthesis_tpu.models.vqgan.VQModel1d",
    "specvqgan.models.vqgan.VQModel1d",
)
class VQModel1d(nn.Module):
    """Feature-sequence tokenizer: (B, T, C_feat) <-> token ids (B, t)."""

    ddconfig: Mapping[str, Any]
    n_embed: int = 1024
    embed_dim: int = 256
    dtype: jnp.dtype = jnp.float32
    ckpt_path: str | None = None
    lossconfig: Mapping[str, Any] | None = None

    def setup(self):
        dd = dict(self.ddconfig)
        out_ch = dd.get("out_ch", dd.get("in_channels", 2048))
        common = dict(
            ch=dd["ch"], ch_mult=tuple(dd["ch_mult"]), num_res_blocks=dd["num_res_blocks"],
            attn_resolutions=tuple(dd.get("attn_resolutions", ())),
            dropout=dd.get("dropout", 0.0), resolution=dd["resolution"],
            z_channels=dd["z_channels"], dtype=self.dtype,
        )
        self.encoder = Encoder1d(in_channels=dd.get("in_channels", 2048),
                                 double_z=bool(dd.get("double_z", False)), **common)
        self.decoder = Decoder1d(out_ch=out_ch, **common)
        self.quantize = VectorQuantizer(self.n_embed, self.embed_dim, beta=0.25)
        self.quant_conv = nn.Conv(self.embed_dim, (1,), dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.ddconfig["z_channels"], (1,),
                                       dtype=self.dtype, name="post_quant_conv")

    def encode(self, x, *, deterministic: bool = True) -> Tuple[jnp.ndarray, VQResult]:
        h = self.quant_conv(self.encoder(x, deterministic=deterministic))
        vq = self.quantize(h)
        return vq.z_q, vq

    def decode(self, quant, *, deterministic: bool = True):
        return self.decoder(self.post_quant_conv(quant), deterministic=deterministic)

    def decode_code(self, code, *, deterministic: bool = True):
        return self.decode(self.quantize.get_codebook_entry(code), deterministic=deterministic)

    def __call__(self, x, *, deterministic: bool = True):
        quant, vq = self.encode(x, deterministic=deterministic)
        return self.decode(quant, deterministic=deterministic), vq
