"""VQModel composite: encoder -> 1x1 quant conv -> VQ -> 1x1 post conv -> decoder.

Parity target: ``Codebook/specvqgan/models/vqgan.py:11-168`` (``encode:54``,
``decode:62``, ``decode_code:67``, ``forward:70``) — minus the
PyTorch-Lightning training plumbing, which lives in the training engine here
(``engine/vqgan_solver.py``), and minus checkpoint surgery, which lives in
``convert/torch_to_jax.py``.

The model consumes mels scaled to [-1, 1] with layout (B, n_mels, T, 1) NHWC.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.config import register
from .modules import Decoder, Encoder
from .quantize import VectorQuantizer, VQResult

__all__ = ["VQModel", "VQNoDiscModel", "VQSegmentationModel"]


@register(
    "text_to_sound_synthesis_tpu.models.vqgan.VQModel",
    "specvqgan.models.vqgan.VQModel",
    "sound_synthesis.modeling.codecs.spec_codec.vqgan.VQModel",
)
class VQModel(nn.Module):
    """Spectrogram tokenizer. ``ddconfig`` follows the reference YAML schema."""

    ddconfig: Mapping[str, Any]
    n_embed: int = 256
    embed_dim: int = 256
    dtype: jnp.dtype = jnp.float32
    # accepted-and-ignored reference config keys (training/ckpt plumbing)
    ckpt_path: str | None = None
    lossconfig: Mapping[str, Any] | None = None
    ignore_keys: Sequence[str] = ()
    image_key: str = "image"
    colorize_nlabels: int | None = None
    monitor: str | None = None

    def setup(self):
        dd = dict(self.ddconfig)
        dd.pop("double_z", None)
        out_ch = dd.pop("out_ch", dd.get("in_channels", 1))
        self.encoder = Encoder(
            ch=dd["ch"], ch_mult=tuple(dd["ch_mult"]), num_res_blocks=dd["num_res_blocks"],
            attn_resolutions=tuple(dd["attn_resolutions"]), dropout=dd.get("dropout", 0.0),
            in_channels=dd.get("in_channels", 1), resolution=dd["resolution"],
            z_channels=dd["z_channels"], double_z=bool(self.ddconfig.get("double_z", False)),
            dtype=self.dtype,
        )
        self.decoder = Decoder(
            ch=dd["ch"], out_ch=out_ch, ch_mult=tuple(dd["ch_mult"]),
            num_res_blocks=dd["num_res_blocks"], attn_resolutions=tuple(dd["attn_resolutions"]),
            dropout=dd.get("dropout", 0.0), resolution=dd["resolution"],
            z_channels=dd["z_channels"], dtype=self.dtype,
        )
        self.quantize = VectorQuantizer(self.n_embed, self.embed_dim, beta=0.25)
        self.quant_conv = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(
            self.ddconfig["z_channels"], (1, 1), dtype=self.dtype, name="post_quant_conv"
        )

    def encode(self, x: jnp.ndarray, *, deterministic: bool = True) -> Tuple[jnp.ndarray, VQResult]:
        """mel (B, H, W, 1) in [-1,1] -> (quantized latents (B, h, w, C), VQResult)."""
        h = self.encoder(x, deterministic=deterministic)
        h = self.quant_conv(h)
        vq = self.quantize(h)
        return vq.z_q, vq

    def decode(self, quant: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        quant = self.post_quant_conv(quant)
        return self.decoder(quant, deterministic=deterministic)

    def decode_code(self, code: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        """(B, h, w) int codebook ids -> decoded mel."""
        quant = self.quantize.get_codebook_entry(code)
        return self.decode(quant, deterministic=deterministic)

    def encode_indices(self, x: jnp.ndarray) -> jnp.ndarray:
        """mel -> (B, h, w) int32 token grid (inference tokenizer path)."""
        _, vq = self.encode(x)
        return vq.indices

    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True):
        quant, vq = self.encode(x, deterministic=deterministic)
        xrec = self.decode(quant, deterministic=deterministic)
        return xrec, vq


@register(
    "text_to_sound_synthesis_tpu.models.vqgan.VQNoDiscModel",
    "specvqgan.models.vqgan.VQNoDiscModel",
)
class VQNoDiscModel(VQModel):
    """VQModel trained without an adversarial loss
    (``Codebook/specvqgan/models/vqgan.py:284-331``): same network; the single
    AE optimizer / recon+codebook loss lives in
    ``engine/vqgan_solver.py::make_vqgan_nodisc_train_step``."""


@register(
    "text_to_sound_synthesis_tpu.models.vqgan.VQSegmentationModel",
    "specvqgan.models.vqgan.VQSegmentationModel",
)
class VQSegmentationModel(VQModel):
    """Segmentation-map VQ autoencoder
    (``Codebook/specvqgan/models/vqgan.py:232-281``): decoder emits
    ``n_labels`` class-logit channels (set ``ddconfig.out_ch = n_labels``);
    trained AE-only with a pixel-wise BCE loss
    (``engine/vqgan_solver.py::make_vqgan_segmentation_train_step``).
    The reference's random ``colorize`` projection is visualization-only and
    regenerated on demand (``segmentation_to_rgb``)."""

    n_labels: int | None = None

    def setup(self):
        out_ch = (self.ddconfig or {}).get(
            "out_ch", (self.ddconfig or {}).get("in_channels", 1))
        if self.n_labels is not None and self.n_labels != out_ch:
            # fail at construction, not as a shape error deep in the BCE loss
            raise ValueError(
                f"n_labels={self.n_labels} but ddconfig.out_ch={out_ch}; the "
                f"decoder emits out_ch logit channels — set ddconfig.out_ch "
                f"= n_labels (vqgan.py:232-281 semantics)")
        super().setup()

    def segmentation_to_rgb(self, logits: jnp.ndarray, key) -> jnp.ndarray:
        """Random 3-channel projection of one-hot argmax labels, normalized to
        [-1, 1] (vqgan.py:265-281 ``to_rgb``)."""
        n = logits.shape[-1]
        proj = jax.random.normal(key, (n, 3), logits.dtype)
        onehot = jax.nn.one_hot(jnp.argmax(logits, axis=-1), n, dtype=logits.dtype)
        x = onehot @ proj
        return 2.0 * (x - x.min()) / (x.max() - x.min() + 1e-12) - 1.0
