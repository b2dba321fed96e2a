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

    def setup(self):
        if "abs" in self.emb_type:
            self.emb = SinusoidalTimeEmb(self.diffusion_step, self.n_embd, name="emb")
        else:
            self.emb = nn.Embed(self.diffusion_step, self.n_embd, dtype=self.dtype, name="emb")
        self.linear = nn.Dense(2 * self.n_embd, dtype=self.dtype, name="linear")
        self.layernorm = nn.LayerNorm(use_bias=False, use_scale=False,
                                      dtype=self.dtype, name="layernorm")

    def modulation(self, t: jnp.ndarray) -> jnp.ndarray:
        """(B,) timesteps -> (B, 2*n_embd) scale|shift."""
        return self.linear(nn.silu(self.emb(t)))

    def table(self) -> jnp.ndarray:
        """All-timestep modulation table (T, 2*n_embd) — step-invariant work
        hoisted out of the sampler scan."""
        return self.modulation(jnp.arange(self.diffusion_step))

    def __call__(self, x: jnp.ndarray, t: jnp.ndarray,
                 mod: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if mod is None:
            mod = self.modulation(t)
        scale, shift = jnp.split(mod[:, None, :].astype(x.dtype), 2, axis=-1)
        x = self.layernorm(x)
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

    def setup(self):
        self.query = nn.Dense(self.n_embd, dtype=self.dtype, name="query")
        self.key = nn.Dense(self.n_embd, dtype=self.dtype, name="key")
        self.value = nn.Dense(self.n_embd, dtype=self.dtype, name="value")
        self.proj = nn.Dense(self.n_embd, dtype=self.dtype, name="proj")
        self.attn_drop = nn.Dropout(self.attn_pdrop)
        self.resid_drop = nn.Dropout(self.resid_pdrop)

    def kv_proj(self, kv):
        """Project keys/values once (step-invariant for a fixed condition)."""
        S = kv.shape[1]
        hd = self.n_embd // self.n_head
        k = self.key(kv).reshape(-1, S, self.n_head, hd)
        v = self.value(kv).reshape(-1, S, self.n_head, hd)
        return k, v

    def __call__(self, x, kv, *, kv_cache=None, deterministic: bool = True):
        B, L, _ = x.shape
        hd = self.n_embd // self.n_head
        # NOTE: a fused qkv matmul (call-time kernel concat) was tried and
        # measured performance-neutral inside the sampler scan — reverted.
        q = self.query(x).reshape(B, L, self.n_head, hd)
        k, v = kv_cache if kv_cache is not None else self.kv_proj(kv)
        att = jnp.einsum("blhd,bshd->bhls", q, k) / math.sqrt(hd)
        att = nn.softmax(att.astype(jnp.float32), axis=-1).astype(self.dtype)
        att = self.attn_drop(att, deterministic=deterministic)
        y = jnp.einsum("bhls,bshd->blhd", att, v).reshape(B, L, self.n_embd)
        y = self.proj(y)
        return self.resid_drop(y, deterministic=deterministic)


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

    def setup(self):
        self.ln1 = AdaLayerNorm(self.n_embd, self.diffusion_step, self.timestep_type,
                                self.dtype, name="ln1")
        self.ln1_1 = AdaLayerNorm(self.n_embd, self.diffusion_step, self.timestep_type,
                                  self.dtype, name="ln1_1")
        self.attn1 = MultiHeadAttention(self.n_embd, self.n_head, self.attn_pdrop,
                                        self.resid_pdrop, self.dtype, name="attn1")
        self.attn2 = MultiHeadAttention(self.n_embd, self.n_head, self.attn_pdrop,
                                        self.resid_pdrop, self.dtype, name="attn2")
        self.ln2 = nn.LayerNorm(dtype=self.dtype, name="ln2")
        self.mlp_fc1 = nn.Dense(self.mlp_hidden_times * self.n_embd, dtype=self.dtype,
                                name="mlp_fc1")
        self.mlp_fc2 = nn.Dense(self.n_embd, dtype=self.dtype, name="mlp_fc2")
        self.mlp_drop = nn.Dropout(self.resid_pdrop)

    def ada_tables(self):
        """(T, 2D) modulation tables for both AdaLNs."""
        return self.ln1.table(), self.ln1_1.table()

    def cond_kv(self, cond):
        """Step-invariant cross-attention K/V projections of the condition."""
        return self.attn2.kv_proj(cond)

    def __call__(self, x, cond, t, *, mods=None, cond_kv=None,
                 deterministic: bool = True):
        """``mods``: optional ((B, 2D), (B, 2D)) precomputed AdaLN modulations;
        ``cond_kv``: optional precomputed (k, v) for the cross attention."""
        m1, m2 = mods if mods is not None else (None, None)
        h = self.ln1(x, t, mod=m1)
        x = x + self.attn1(h, h, deterministic=deterministic)
        h = self.ln1_1(x, t, mod=m2)
        x = x + self.attn2(h, cond, kv_cache=cond_kv, deterministic=deterministic)
        h = self.ln2(x)
        act = _ACT[self.activate]
        h = self.mlp_fc2(act(self.mlp_fc1(h)))
        h = self.mlp_drop(h, deterministic=deterministic)
        return x + h


class SelfConditionBlock(nn.Module):
    """'selfcondition' block: AdaLN(t) -> self-attn, then class-conditioned
    AdaLN before the MLP (Block with attn_type='selfcondition',
    transformer_utils.py:207-219, 261-265)."""

    n_embd: int
    n_head: int
    diffusion_step: int
    class_number: int = 1000
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    mlp_hidden_times: int = 4
    activate: str = "GELU2"
    timestep_type: str = "adalayernorm"
    class_type: str = "adalayernorm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, class_idx, t, *, deterministic: bool = True):
        h = AdaLayerNorm(self.n_embd, self.diffusion_step, self.timestep_type,
                         self.dtype, name="ln1")(x, t)
        x = x + MultiHeadAttention(self.n_embd, self.n_head, self.attn_pdrop,
                                   self.resid_pdrop, self.dtype, name="attn")(
            h, h, deterministic=deterministic)
        h = AdaLayerNorm(self.n_embd, self.class_number, self.class_type,
                         self.dtype, name="ln2")(x, class_idx)
        act = _ACT[self.activate]
        h = nn.Dense(self.mlp_hidden_times * self.n_embd, dtype=self.dtype,
                     name="mlp_fc1")(h)
        h = nn.Dense(self.n_embd, dtype=self.dtype, name="mlp_fc2")(act(h))
        return x + nn.Dropout(self.resid_pdrop, deterministic=deterministic)(h)


class SelfBlock(nn.Module):
    """'self' block: AdaLN(t) -> self-attn -> LN -> MLP (unconditional)."""

    n_embd: int
    n_head: int
    diffusion_step: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    mlp_hidden_times: int = 4
    activate: str = "GELU2"
    timestep_type: str = "adalayernorm"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, *, deterministic: bool = True):
        h = AdaLayerNorm(self.n_embd, self.diffusion_step, self.timestep_type,
                         self.dtype, name="ln1")(x, t)
        x = x + MultiHeadAttention(self.n_embd, self.n_head, self.attn_pdrop,
                                   self.resid_pdrop, self.dtype, name="attn")(
            h, h, deterministic=deterministic)
        h = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        act = _ACT[self.activate]
        h = nn.Dense(self.mlp_hidden_times * self.n_embd, dtype=self.dtype,
                     name="mlp_fc1")(h)
        h = nn.Dense(self.n_embd, dtype=self.dtype, name="mlp_fc2")(act(h))
        return x + nn.Dropout(self.resid_pdrop, deterministic=deterministic)(h)


@register(
    "text_to_sound_synthesis_tpu.models.diffusion.Condition2SpecTransformer",
    "sound_synthesis.modeling.transformers.transformer_utils.Condition2ImageTransformer",
)
class Condition2SpecTransformer(nn.Module):
    """Class-conditional denoiser (Condition2ImageTransformer,
    transformer_utils.py:445-585): tokens + class id + t -> logits."""

    class_number: int = 1000
    n_layer: int = 24
    n_embd: int = 1024
    n_head: int = 16
    content_seq_len: int = 265
    diffusion_step: int = 100
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    mlp_hidden_times: int = 4
    block_activate: str = "GELU2"
    attn_type: str = "selfcondition"
    class_type: str = "adalayernorm"
    timestep_type: str = "adalayernorm"
    mlp_type: str = "fc"
    content_spatial_size: Any = (5, 53)
    content_emb_config: Optional[Mapping[str, Any]] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        emb_params = dict((self.content_emb_config or {}).get("params", {}))
        emb_params.setdefault("spatial_size", tuple(self.content_spatial_size))
        emb_params["spatial_size"] = tuple(emb_params["spatial_size"])
        self.content_emb = ContentEmbedding(dtype=self.dtype, **emb_params)
        self.blocks = [
            SelfConditionBlock(
                n_embd=self.n_embd, n_head=self.n_head,
                diffusion_step=self.diffusion_step, class_number=self.class_number,
                attn_pdrop=self.attn_pdrop, resid_pdrop=self.resid_pdrop,
                mlp_hidden_times=self.mlp_hidden_times, activate=self.block_activate,
                timestep_type=self.timestep_type, class_type=self.class_type,
                dtype=self.dtype, name=f"block_{i}",
            )
            for i in range(self.n_layer)
        ]
        self.norm_out = nn.LayerNorm(dtype=self.dtype, name="norm_out")
        self.to_logits = nn.Dense(self.content_emb.num_classes - 1,
                                  dtype=self.dtype, name="head")

    @property
    def num_classes(self) -> int:
        return self.content_emb.num_classes

    def __call__(self, tokens, class_idx, t, *, deterministic: bool = True):
        x = self.content_emb(tokens)
        class_idx = class_idx.reshape(-1).astype(jnp.int32)
        for blk in self.blocks:
            x = blk(x, class_idx, t, deterministic=deterministic)
        return self.to_logits(self.norm_out(x))


@register(
    "text_to_sound_synthesis_tpu.models.diffusion.UnCondition2SpecTransformer",
    "sound_synthesis.modeling.transformers.transformer_utils.UnCondition2ImageTransformer",
)
class UnCondition2SpecTransformer(nn.Module):
    """Unconditional denoiser (UnCondition2ImageTransformer,
    transformer_utils.py:588-725)."""

    n_layer: int = 24
    n_embd: int = 512
    n_head: int = 16
    content_seq_len: int = 256
    diffusion_step: int = 100
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    mlp_hidden_times: int = 4
    block_activate: str = "GELU2"
    attn_type: str = "self"
    timestep_type: str = "adalayernorm"
    mlp_type: str = "fc"
    content_spatial_size: Any = (16, 16)
    content_emb_config: Optional[Mapping[str, Any]] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        emb_params = dict((self.content_emb_config or {}).get("params", {}))
        emb_params.setdefault("spatial_size", tuple(self.content_spatial_size))
        emb_params["spatial_size"] = tuple(emb_params["spatial_size"])
        self.content_emb = ContentEmbedding(dtype=self.dtype, **emb_params)
        self.blocks = [
            SelfBlock(
                n_embd=self.n_embd, n_head=self.n_head,
                diffusion_step=self.diffusion_step, attn_pdrop=self.attn_pdrop,
                resid_pdrop=self.resid_pdrop, mlp_hidden_times=self.mlp_hidden_times,
                activate=self.block_activate, timestep_type=self.timestep_type,
                dtype=self.dtype, name=f"block_{i}",
            )
            for i in range(self.n_layer)
        ]
        self.norm_out = nn.LayerNorm(dtype=self.dtype, name="norm_out")
        self.to_logits = nn.Dense(self.content_emb.num_classes - 1,
                                  dtype=self.dtype, name="head")

    @property
    def num_classes(self) -> int:
        return self.content_emb.num_classes

    def __call__(self, tokens, cond, t, *, deterministic: bool = True):
        """``cond`` accepted and ignored (unconditional)."""
        x = self.content_emb(tokens)
        for blk in self.blocks:
            x = blk(x, t, deterministic=deterministic)
        return self.to_logits(self.norm_out(x))


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

    def ada_tables(self):
        """Per-block ((T, 2D), (T, 2D)) AdaLN modulation tables — step-invariant
        sampler work hoisted out of the scan."""
        return [blk.ada_tables() for blk in self.blocks]

    def cond_kvs(self, cond_emb: jnp.ndarray):
        """Per-block precomputed cross-attention (k, v) of a fixed condition."""
        cond = cond_emb.astype(self.dtype)
        return [blk.cond_kv(cond) for blk in self.blocks]

    def __call__(self, tokens: jnp.ndarray, cond_emb: jnp.ndarray, t: jnp.ndarray,
                 *, mods=None, cond_kvs=None, deterministic: bool = True) -> jnp.ndarray:
        """tokens (B, L) int; cond_emb (B, S, condition_dim); t (B,) int.

        Returns logits (B, L, num_classes - 1) — classes last (the reference
        returns (B, C, L); we keep L, C which is the natural TPU layout).
        ``mods``/``cond_kvs``: optional per-block precomputed AdaLN modulations
        and cross-attention projections (see ada_tables/cond_kvs).
        """
        x = self.content_emb(tokens)
        cond = cond_emb.astype(self.dtype)
        for i, blk in enumerate(self.blocks):
            x = blk(x, cond, t,
                    mods=mods[i] if mods is not None else None,
                    cond_kv=cond_kvs[i] if cond_kvs is not None else None,
                    deterministic=deterministic)
        return self.to_logits(self.norm_out(x))
