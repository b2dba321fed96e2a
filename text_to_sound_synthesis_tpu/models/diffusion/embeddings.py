"""Content (token-grid) embedding with factored 2-D positions.

Parity target: ``DalleMaskImageEmbedding``
(``Diffsound/sound_synthesis/modeling/embeddings/dalle_mask_image_embedding.py:5-58``):
token table of ``num_embed + 1`` rows (the extra row is MASK), plus
``height_emb[h] + width_emb[w]`` flattened row-major over the (5, 53) grid.

Note preserved from the reference: tokens arrive ColumnMajor-permuted (time-major)
while the positional flatten is row-major — the model simply learns the mapping,
and changing it would break released-checkpoint parity.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...utils.config import register

__all__ = ["ContentEmbedding"]


@register(
    "text_to_sound_synthesis_tpu.models.diffusion.ContentEmbedding",
    "sound_synthesis.modeling.embeddings.dalle_mask_image_embedding.DalleMaskImageEmbedding",
)
class ContentEmbedding(nn.Module):
    num_embed: int = 256              # codebook size WITHOUT the mask token
    spatial_size: Sequence[int] = (5, 53)
    embed_dim: int = 1024
    trainable: bool = True            # accepted for config parity
    pos_emb_type: str = "embedding"
    dtype: jnp.dtype = jnp.float32

    @property
    def num_classes(self) -> int:
        """Total classes including MASK."""
        return self.num_embed + 1

    @nn.compact
    def __call__(self, index: jnp.ndarray) -> jnp.ndarray:
        """(B, L) int token ids (mask id == num_embed) -> (B, L, D)."""
        H, W = self.spatial_size
        index = jnp.maximum(index, 0)  # reference clamps negatives to 0
        tok = nn.Embed(self.num_classes, self.embed_dim, dtype=self.dtype, name="emb")(index)
        if self.pos_emb_type == "embedding":
            h_emb = nn.Embed(H, self.embed_dim, dtype=self.dtype, name="height_emb")(jnp.arange(H))
            w_emb = nn.Embed(W, self.embed_dim, dtype=self.dtype, name="width_emb")(jnp.arange(W))
        else:  # 'parameter'
            h_emb = self.param("height_emb", nn.initializers.zeros, (H, self.embed_dim))
            w_emb = self.param("width_emb", nn.initializers.zeros, (W, self.embed_dim))
        pos = (h_emb[:, None, :] + w_emb[None, :, :]).reshape(1, H * W, self.embed_dim)
        return tok + pos[:, : tok.shape[1], :].astype(tok.dtype)
