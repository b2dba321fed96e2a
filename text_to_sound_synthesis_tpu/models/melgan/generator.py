"""MelGAN generator: 80-ch log-mel -> waveform at 256x upsampling.

Parity target: ``Generator`` (``Diffsound/vocoder/modules.py:88-130``):
ReflectionPad+7-conv stem, ConvTranspose1d stages with ratios [8, 8, 2, 2]
(kernel 2r, stride r, padding r//2+r%2, output_padding r%2), 3 dilated residual
blocks (dilation 3^j) per stage, LeakyReLU(0.2), tanh output.

TPU-native notes: NWC layout; transposed convs lower to
``lax.conv_general_dilated`` with lhs dilation (exact torch ConvTranspose1d
semantics — verified against torch CPU in tests/test_melgan.py); the reference's
weight normalization is train-time-only reparameterization and is folded into
plain kernels at checkpoint conversion.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from jax import lax
from flax import linen as nn

from ...utils.config import register

__all__ = ["MelGANGenerator", "conv_transpose_1d"]


def conv_transpose_1d(x, kernel, stride: int, padding: int, output_padding: int = 0):
    """torch.nn.ConvTranspose1d semantics in NWC.

    x: (B, T, Cin); kernel: (k, Cout, Cin) — spatial-major like flax, but with
    (out, in) channel order so conversion from torch's (Cin, Cout, k) is a pure
    transpose. out length = (T-1)*stride - 2*padding + k + output_padding.

    MelGAN's configuration (k = 2*stride, padding = ceil(stride/2), even
    stride) takes the polyphase fast path: one (T, 3*Cin) x (3*Cin, r*Cout)
    matmul instead of a conv over an r-x zero-dilated input — the dilated
    lowering does k*Cin MACs per output where only 2*Cin are nonzero.
    """
    k = kernel.shape[0]
    if (
        k == 2 * stride
        and stride % 2 == 0
        and padding == stride // 2
        and output_padding == 0
    ):
        return _conv_transpose_polyphase(x, kernel, stride, padding)
    pad_lo = k - 1 - padding
    pad_hi = k - 1 - padding + output_padding
    flipped = jnp.flip(kernel, axis=0)          # (k, Cout, Cin)
    rhs = jnp.transpose(flipped, (0, 2, 1))      # (k, Cin, Cout) for HWIO-style
    return lax.conv_general_dilated(
        x, rhs,
        window_strides=(1,),
        padding=[(pad_lo, pad_hi)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def _conv_transpose_polyphase(x, kernel, r: int, p: int):
    """ConvTranspose1d(k=2r, s=r, p, op=0) as a single dense matmul.

    Derivation: output position t*r + j draws from exactly two inputs,
    x[t + d_j] with kernel tap j+p-d_j*r and x[t + d_j - 1] with tap
    j+p-(d_j-1)*r, where d_j = (j+p)//r. Equivalently x[t] always contributes
    via tap j+p, and x[t-1]/x[t+1] via taps j+p+r / j+p-r when valid — a 3-tap
    window matmul to r*Cout features, reshaped to (T*r, Cout).
    """
    B, T, Cin = x.shape
    k, Cout, _ = kernel.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    win = jnp.stack([xp[:, :-2], xp[:, 1:-1], xp[:, 2:]], axis=2)  # (B,T,3,Cin)

    # (3, r, Cout, Cin) weight gather with static indices
    rows = []
    for slot, off_valid in ((0, lambda j: j + p + r < 2 * r),
                            (1, lambda j: True),
                            (2, lambda j: j + p - r >= 0)):
        taps = []
        for j in range(r):
            if slot == 0:
                tap = j + p + r
            elif slot == 1:
                tap = j + p
            else:
                tap = j + p - r
            if off_valid(j):
                taps.append(kernel[tap])
            else:
                taps.append(jnp.zeros_like(kernel[0]))
        rows.append(jnp.stack(taps))          # (r, Cout, Cin)
    W = jnp.stack(rows)                        # (3, r, Cout, Cin)
    y = jnp.einsum("btsc,sroc->btro", win, W)  # (B, T, r, Cout)
    return y.reshape(B, T * r, Cout)


class ConvTranspose1dModule(nn.Module):
    out_channels: int
    kernel_size: int
    stride: int
    padding: int
    output_padding: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.normal(0.02),
            (self.kernel_size, self.out_channels, x.shape[-1]),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        y = conv_transpose_1d(x.astype(self.dtype), kernel.astype(self.dtype),
                              self.stride, self.padding, self.output_padding)
        return y + bias.astype(y.dtype)


def reflect_pad_1d(x, pad: int):
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")


class ResidualUnit(nn.Module):
    """LeakyReLU -> reflect-pad -> dilated 3-conv -> LeakyReLU -> 1-conv, with a
    1x1 shortcut (modules.py:72-85)."""

    dim: int
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.leaky_relu(x, 0.2)
        h = reflect_pad_1d(h, self.dilation)
        h = nn.Conv(self.dim, (3,), kernel_dilation=(self.dilation,), padding="VALID",
                    dtype=self.dtype, name="conv1")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.dim, (1,), dtype=self.dtype, name="conv2")(h)
        s = nn.Conv(self.dim, (1,), dtype=self.dtype, name="shortcut")(x)
        return s + h


@register(
    "text_to_sound_synthesis_tpu.models.melgan.MelGANGenerator",
    "vocoder.modules.Generator",
)
class MelGANGenerator(nn.Module):
    input_size: int = 80
    ngf: int = 32
    n_residual_layers: int = 3
    ratios: Sequence[int] = (8, 8, 2, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        """mel (B, T, 80) log10-mel -> wav (B, T*256, 1) in [-1, 1]."""
        mult = int(2 ** len(self.ratios))
        x = reflect_pad_1d(mel, 3)
        x = nn.Conv(mult * self.ngf, (7,), padding="VALID", dtype=self.dtype, name="conv_in")(x)
        for i, r in enumerate(self.ratios):
            x = nn.leaky_relu(x, 0.2)
            x = ConvTranspose1dModule(
                mult * self.ngf // 2, kernel_size=r * 2, stride=r,
                padding=r // 2 + r % 2, output_padding=r % 2,
                dtype=self.dtype, name=f"up_{i}",
            )(x)
            for j in range(self.n_residual_layers):
                x = ResidualUnit(mult * self.ngf // 2, dilation=3**j,
                                 dtype=self.dtype, name=f"res_{i}_{j}")(x)
            mult //= 2
        x = nn.leaky_relu(x, 0.2)
        x = reflect_pad_1d(x, 3)
        x = nn.Conv(1, (7,), padding="VALID", dtype=self.dtype, name="conv_out")(x)
        return jnp.tanh(x)
