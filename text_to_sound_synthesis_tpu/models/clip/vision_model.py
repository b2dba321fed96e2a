"""CLIP ViT image tower in flax — completes the vendored CLIP.

Parity target: the vendored OpenAI ``VisualTransformer``
(``Diffsound/sound_synthesis/modeling/modules/clip/model.py:201-236``) — patch
conv stem (no bias), learned class token + positional embeddings, pre-LN
transformer of the same ResidualAttentionBlocks as the text tower (no causal
mask), ln_post on the class token, linear projection to the shared embedding
space.

The text-to-sound pipeline never consumes image features (captions are the
only conditioning); this tower exists for full vendored-CLIP capability parity
(SURVEY §2.2 "vendored CLIP" row) — e.g. scoring generations against images
or building CLIP-space retrieval on top of the framework. NHWC images, like
every conv stack in this framework.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .text_model import ResidualAttentionBlock

__all__ = ["ClipVisionEncoder"]


class ClipVisionEncoder(nn.Module):
    input_resolution: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images (B, H, W, 3) -> (B, output_dim). H == W == input_resolution."""
        B = images.shape[0]
        p = self.patch_size
        x = nn.Conv(self.width, (p, p), strides=(p, p), use_bias=False,
                    dtype=self.dtype, name="conv1")(images)
        x = x.reshape(B, -1, self.width)                      # (B, grid^2, W)

        cls = self.param("class_embedding", nn.initializers.normal(self.width ** -0.5),
                         (self.width,))
        pos = self.param("positional_embedding",
                         nn.initializers.normal(self.width ** -0.5),
                         ((self.input_resolution // p) ** 2 + 1, self.width))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (B, 1, self.width)), x], axis=1)
        x = x + pos.astype(x.dtype)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_pre")(x)

        no_mask = jnp.zeros((x.shape[1], x.shape[1]), jnp.float32)
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads, dtype=self.dtype,
                                       name=f"resblock_{i}")(x, no_mask)

        x = nn.LayerNorm(dtype=self.dtype, name="ln_post")(x[:, 0, :])
        proj = self.param("proj", nn.initializers.normal(self.width ** -0.5),
                          (self.width, self.output_dim))
        return x @ proj.astype(x.dtype)
