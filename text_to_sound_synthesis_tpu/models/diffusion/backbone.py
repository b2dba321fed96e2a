"""Denoising transformer backbone: AdaLN(t) self+cross blocks.

Parity target: ``Text2ImageTransformer`` and its ``Block``/``FullAttention``/
``CrossAttention``/``AdaLayerNorm``/``SinusoidalPosEmb``/``GELU2`` helpers
(``Diffsound/sound_synthesis/modeling/transformers/transformer_utils.py:20-443``).
19 layers x (AdaLN -> self-attn over 265 content tokens -> AdaLN -> cross-attn to
77 CLIP token embeddings -> LN -> 4x GELU2 MLP), final LN + Linear to
``num_embed - 1`` classes (MASK is never predicted).

TPU-native notes:
* activations (B, L, D); multi-head attention via einsum on the MXU with softmax
  in float32; optional bf16 activation dtype.
* no attention-weight averaging/return (the reference computes a mean attention
  map it never uses in this path).
* per-layer remat is available via ``remat`` (reference: activation
  checkpointing flag, transformer_utils.py:433-436).
"""

from __future__ import annotations

import math
from typing import Any, Mapping, Optional

import jax.numpy as jnp
from flax import linen as nn

from ...utils.config import register
from .embeddings import ContentEmbedding

__all__ = ["Text2SpecTransformer", "AdaLayerNorm", "SinusoidalTimeEmb", "gelu2"]


def gelu2(x):
    """x * sigmoid(1.702 x) (transformer_utils.py:111-115)."""
    return x * nn.sigmoid(1.702 * x)


_ACT = {"GELU": nn.gelu, "GELU2": gelu2}


class SinusoidalTimeEmb(nn.Module):
    """Sinusoidal timestep embedding with the reference's step rescaling
    (t / num_steps * 4000; transformer_utils.py:117-132)."""

    num_steps: int
    dim: int
    rescale_steps: float = 4000.0

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        x = t.astype(jnp.float32) / self.num_steps * self.rescale_steps
        half = self.dim // 2
        freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) / (half - 1)))
        ang = x[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class AdaLayerNorm(nn.Module):
    """LayerNorm (no affine) modulated by scale/shift from the timestep
    (transformer_utils.py:134-149).

    ``emb_type`` containing 'abs' selects the sinusoidal embedding; otherwise a
    LEARNED nn.Embed(diffusion_step, n_embd) table — the production configs use
    ``timestep_type: 'adalayernorm'`` (no 'abs'), i.e. the learned table.
    """

    n_embd: int
    diffusion_step: int
    emb_type: str = "adalayernorm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        if "abs" in self.emb_type:
            emb = SinusoidalTimeEmb(self.diffusion_step, self.n_embd, name="emb")(t)
        else:
            emb = nn.Embed(self.diffusion_step, self.n_embd, dtype=self.dtype, name="emb")(t)
        emb = nn.Dense(2 * self.n_embd, dtype=self.dtype, name="linear")(nn.silu(emb))
        scale, shift = jnp.split(emb[:, None, :], 2, axis=-1)
        x = nn.LayerNorm(use_bias=False, use_scale=False, dtype=self.dtype, name="layernorm")(x)
        return x * (1 + scale) + shift


class MultiHeadAttention(nn.Module):
    """q from x; k,v from ``kv`` (self-attn when kv is x). Full softmax, no mask —
    the content sequence is bidirectional (FullAttention.causal is never used in
    the selfcross path)."""

    n_embd: int
    n_head: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, kv, *, deterministic: bool = True):
        B, L, _ = x.shape
        S = kv.shape[1]
        hd = self.n_embd // self.n_head
        q = nn.Dense(self.n_embd, dtype=self.dtype, name="query")(x).reshape(B, L, self.n_head, hd)
        k = nn.Dense(self.n_embd, dtype=self.dtype, name="key")(kv).reshape(B, S, self.n_head, hd)
        v = nn.Dense(self.n_embd, dtype=self.dtype, name="value")(kv).reshape(B, S, self.n_head, hd)
        att = jnp.einsum("blhd,bshd->bhls", q, k) / math.sqrt(hd)
        att = nn.softmax(att.astype(jnp.float32), axis=-1).astype(self.dtype)
        att = nn.Dropout(self.attn_pdrop, deterministic=deterministic)(att)
        y = jnp.einsum("bhls,bshd->blhd", att, v).reshape(B, L, self.n_embd)
        y = nn.Dense(self.n_embd, dtype=self.dtype, name="proj")(y)
        return nn.Dropout(self.resid_pdrop, deterministic=deterministic)(y)


class SelfCrossBlock(nn.Module):
    """AdaLN->self-attn, AdaLN->cross-attn, LN->MLP (Block, transformer_utils.py:168-272)."""

    n_embd: int
    n_head: int
    diffusion_step: int
    condition_dim: int = 512
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    mlp_hidden_times: int = 4
    activate: str = "GELU2"
    timestep_type: str = "adalayernorm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond, t, *, deterministic: bool = True):
        h = AdaLayerNorm(self.n_embd, self.diffusion_step, self.timestep_type,
                         self.dtype, name="ln1")(x, t)
        x = x + MultiHeadAttention(self.n_embd, self.n_head, self.attn_pdrop,
                                   self.resid_pdrop, self.dtype, name="attn1")(
            h, h, deterministic=deterministic)
        h = AdaLayerNorm(self.n_embd, self.diffusion_step, self.timestep_type,
                         self.dtype, name="ln1_1")(x, t)
        x = x + MultiHeadAttention(self.n_embd, self.n_head, self.attn_pdrop,
                                   self.resid_pdrop, self.dtype, name="attn2")(
            h, cond, deterministic=deterministic)
        h = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        act = _ACT[self.activate]
        h = nn.Dense(self.mlp_hidden_times * self.n_embd, dtype=self.dtype, name="mlp_fc1")(h)
        h = act(h)
        h = nn.Dense(self.n_embd, dtype=self.dtype, name="mlp_fc2")(h)
        h = nn.Dropout(self.resid_pdrop, deterministic=deterministic)(h)
        return x + h


@register(
    "text_to_sound_synthesis_tpu.models.diffusion.Text2SpecTransformer",
    "sound_synthesis.modeling.transformers.transformer_utils.Text2ImageTransformer",
)
class Text2SpecTransformer(nn.Module):
    """Full denoiser: token ids + CLIP cond + t -> logits (B, L, num_embed - 1)."""

    n_layer: int = 19
    n_embd: int = 1024
    n_head: int = 16
    content_seq_len: int = 265
    condition_seq_len: int = 77
    condition_dim: int = 512
    diffusion_step: int = 100
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    mlp_hidden_times: int = 4
    block_activate: str = "GELU2"
    attn_type: str = "selfcross"
    timestep_type: str = "adalayernorm"
    mlp_type: str = "fc"
    content_spatial_size: Any = (5, 53)
    content_emb_config: Optional[Mapping[str, Any]] = None
    checkpoint: bool = False          # per-layer remat
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.attn_type != "selfcross":
            raise NotImplementedError("only the selfcross denoiser is supported")
        emb_params = dict((self.content_emb_config or {}).get("params", {}))
        emb_params.setdefault("spatial_size", tuple(self.content_spatial_size))
        emb_params["spatial_size"] = tuple(emb_params["spatial_size"])
        self.content_emb = ContentEmbedding(dtype=self.dtype, **emb_params)
        block = SelfCrossBlock
        if self.checkpoint:
            block = nn.remat(block, static_argnums=())
        self.blocks = [
            block(
                n_embd=self.n_embd, n_head=self.n_head, diffusion_step=self.diffusion_step,
                condition_dim=self.condition_dim, attn_pdrop=self.attn_pdrop,
                resid_pdrop=self.resid_pdrop, mlp_hidden_times=self.mlp_hidden_times,
                activate=self.block_activate, timestep_type=self.timestep_type,
                dtype=self.dtype, name=f"block_{i}",
            )
            for i in range(self.n_layer)
        ]
        self.norm_out = nn.LayerNorm(dtype=self.dtype, name="norm_out")
        self.to_logits = nn.Dense(self.content_emb.num_classes - 1, dtype=self.dtype, name="head")

    @property
    def num_classes(self) -> int:
        return self.content_emb.num_classes

    def __call__(self, tokens: jnp.ndarray, cond_emb: jnp.ndarray, t: jnp.ndarray,
                 *, deterministic: bool = True) -> jnp.ndarray:
        """tokens (B, L) int; cond_emb (B, S, condition_dim); t (B,) int.

        Returns logits (B, L, num_classes - 1) — classes last (the reference
        returns (B, C, L); we keep L, C which is the natural TPU layout).
        """
        x = self.content_emb(tokens)
        cond = cond_emb.astype(self.dtype)
        for blk in self.blocks:
            x = blk(x, cond, t, deterministic=deterministic)
        return self.to_logits(self.norm_out(x))
