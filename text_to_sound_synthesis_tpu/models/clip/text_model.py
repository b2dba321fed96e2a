"""CLIP ViT-B/32 text tower in flax — the frozen condition encoder.

Parity targets:
* the vendored OpenAI text transformer (``modules/clip/model.py``:
  ResidualAttentionBlock:166, Transformer:190, encode_text:341) — pre-LN blocks
  with causal masking, QuickGELU MLPs, learned positional embeddings, ln_final;
* the ``CLIPTextEmbedding`` wrapper
  (``modeling/embeddings/clip_text_embedding.py:7-88``) — clamp negative pad ids
  to 0, optional per-token output (pick_last_embedding=False, the Diffsound
  configuration), optional L2 normalization, optional width doubling to 1024.

Weights come from the released CLIP checkpoint via convert/torch_to_jax.py
(fp16 storage -> float32).
"""

from __future__ import annotations

import math


import jax.numpy as jnp
from flax import linen as nn

from ...utils.config import register

__all__ = ["ClipTextEncoder", "CLIPTextEmbedding"]


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        B, L, D = x.shape
        hd = D // self.heads
        h = nn.LayerNorm(dtype=self.dtype, name="ln_1")(x)
        qkv = nn.Dense(3 * D, dtype=self.dtype, name="attn_in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, L, self.heads, hd)
        k = k.reshape(B, L, self.heads, hd)
        v = v.reshape(B, L, self.heads, hd)
        att = jnp.einsum("blhd,bshd->bhls", q, k) / math.sqrt(hd)
        att = att + causal_mask  # (L, L) additive -inf above diagonal
        att = nn.softmax(att.astype(jnp.float32), axis=-1).astype(self.dtype)
        y = jnp.einsum("bhls,bshd->blhd", att, v).reshape(B, L, D)
        x = x + nn.Dense(D, dtype=self.dtype, name="attn_out_proj")(y)
        h = nn.LayerNorm(dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(4 * D, dtype=self.dtype, name="mlp_c_fc")(h)
        h = quick_gelu(h)
        x = x + nn.Dense(D, dtype=self.dtype, name="mlp_c_proj")(h)
        return x


class ClipTextEncoder(nn.Module):
    """tokens (B, L) -> per-token features after ln_final (B, L, width)."""

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    embed_dim: int = 512  # projection output dim
    with_projection: bool = False  # create text_projection (EOT paths only)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # Created here (not in project_eot) so the EOT paths init correctly:
        # self.param outside the compact method never registers at init time.
        if self.with_projection:
            self.text_projection = self.param(
                "text_projection", nn.initializers.normal(self.width**-0.5),
                (self.width, self.embed_dim),
            )

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        x = nn.Embed(self.vocab_size, self.width, dtype=self.dtype, name="token_embedding")(tokens)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = x + pos[None, : x.shape[1], :].astype(x.dtype)
        L = x.shape[1]
        causal = jnp.triu(jnp.full((L, L), -jnp.inf, jnp.float32), k=1)
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads, self.dtype, name=f"resblock_{i}")(x, causal)
        return nn.LayerNorm(dtype=self.dtype, name="ln_final")(x)

    def project_eot(self, tokens: jnp.ndarray, features: jnp.ndarray) -> jnp.ndarray:
        """Take the EOT position (argmax token id) through text_projection."""
        eot = jnp.argmax(tokens, axis=-1)
        picked = features[jnp.arange(features.shape[0]), eot]
        return picked @ self.text_projection.astype(picked.dtype)


@register(
    "text_to_sound_synthesis_tpu.models.clip.CLIPTextEmbedding",
    "sound_synthesis.modeling.embeddings.clip_text_embedding.CLIPTextEmbedding",
)
class CLIPTextEmbedding(nn.Module):
    """Frozen condition embedding. Diffsound config (caps.yaml:69-78):
    normalize=True, pick_last_embedding=False, embed_dim=512 -> L2-normalized
    per-token (B, 77, 512) features."""

    clip_name: str = "ViT-B/32"
    num_embed: int = 49408
    normalize: bool = True
    pick_last_embedding: bool = False
    keep_seq_len_dim: bool = False
    additional_last_embedding: bool = False
    embed_dim: int = 512
    # tower geometry; defaults are the ViT-B/32 text transformer
    width: int = 512
    layers: int = 12
    heads: int = 8
    context_length: int = 77
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # text_projection keeps the CHECKPOINT's output dim (width -> 512 for
        # ViT-B/32) regardless of embed_dim: the reference's embed_dim=1024
        # only switches on the self-concat below (clip_text_embedding.py:34-38
        # reads self.text_projection.shape[1]*2, it never reshapes the proj)
        self.encoder = ClipTextEncoder(
            vocab_size=self.num_embed, context_length=self.context_length,
            width=self.width, layers=self.layers, heads=self.heads,
            embed_dim=self.width if self.embed_dim == 1024 else self.embed_dim,
            with_projection=self.pick_last_embedding or self.additional_last_embedding,
            dtype=self.dtype, name="text",
        )

    def __call__(self, tokens: jnp.ndarray):
        tokens = jnp.maximum(tokens, 0)  # negative pad ids -> 0
        feats = self.encoder(tokens)  # (B, L, 512)
        if self.pick_last_embedding:
            out = self.encoder.project_eot(tokens, feats)
            if self.keep_seq_len_dim:
                out = out[:, None, :]
        else:
            out = feats
        if self.embed_dim == 1024:
            # "to fit 1024 dimension of image embedding": self-concat of the
            # 512-d features (clip_text_embedding.py:74-76)
            out = jnp.concatenate([out, out], axis=-1)
        if self.normalize:
            out = out / jnp.linalg.norm(out, axis=-1, keepdims=True)
        if self.additional_last_embedding:
            # (text_features, unnormalized EOT projection) tuple
            # (clip_text_embedding.py:82-88)
            last = self.encoder.project_eot(tokens, feats)
            if self.keep_seq_len_dim:
                last = last[:, None, :]
            return out, last
        return out
