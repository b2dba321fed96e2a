"""Autoregressive GPT baseline with a KV-cached fused sampler.

Parity targets: minGPT and its conditioned variants
(``Codebook/specvqgan/modules/transformer/mingpt.py``: ``GPT:126-187``,
``CausalSelfAttention:49-95``, ``GPTFeats:263-293``): learned positional
embeddings over block_size (266 = 1 cond + 5*53 content), pre-LN blocks with
GELU MLPs, bias-free head, conditioning features prepended after a Conv1d/
Linear embedder (CLIP 512-d -> 1024).

TPU-native win: the reference samples 265 tokens with 265 FULL-sequence
forwards (generate_samples_caps.py:192-229). Here sampling is one ``lax.scan``
over a per-layer KV cache — O(T) instead of O(T^2) attention work, fully jitted.
"""

from __future__ import annotations

import math
from typing import Any, Mapping, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.config import register

__all__ = ["GPT", "GPTFeats", "GPTClass", "GPTFeatsClass", "RNNEmbedder", "ar_sample"]


class LayerCache(NamedTuple):
    k: jnp.ndarray  # (B, maxT, H, hd)
    v: jnp.ndarray


class CausalSelfAttention(nn.Module):
    n_embd: int
    n_head: int
    n_unmasked: int = 0
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.key = nn.Dense(self.n_embd, dtype=self.dtype, name="key")
        self.query = nn.Dense(self.n_embd, dtype=self.dtype, name="query")
        self.value = nn.Dense(self.n_embd, dtype=self.dtype, name="value")
        self.proj = nn.Dense(self.n_embd, dtype=self.dtype, name="proj")

    def _split(self, x):
        B, T, _ = x.shape
        return x.reshape(B, T, self.n_head, self.n_embd // self.n_head)

    def __call__(self, x, *, deterministic: bool = True):
        B, T, C = x.shape
        q, k, v = self._split(self.query(x)), self._split(self.key(x)), self._split(self.value(x))
        att = jnp.einsum("blhd,bshd->bhls", q, k) / math.sqrt(C // self.n_head)
        mask = jnp.tril(jnp.ones((T, T), bool))
        if self.n_unmasked > 0:
            n = self.n_unmasked
            mask = mask.at[:n, :n].set(True)
        att = jnp.where(mask[None, None], att, -jnp.inf)
        att = nn.softmax(att.astype(jnp.float32), axis=-1).astype(self.dtype)
        y = jnp.einsum("bhls,bshd->blhd", att, v).reshape(B, T, C)
        return self.proj(y)

    def decode_step(self, x, cache: LayerCache, pos) -> Tuple[jnp.ndarray, LayerCache]:
        """x: (B, 1, C) at position ``pos`` (traced scalar); masked to <= pos."""
        B, _, C = x.shape
        q = self._split(self.query(x))[:, 0]          # (B, H, hd)
        k_new = self._split(self.key(x))[:, 0]
        v_new = self._split(self.value(x))[:, 0]
        k = jax.lax.dynamic_update_slice(cache.k, k_new[:, None], (0, pos, 0, 0))
        v = jax.lax.dynamic_update_slice(cache.v, v_new[:, None], (0, pos, 0, 0))
        att = jnp.einsum("bhd,bshd->bhs", q, k) / math.sqrt(C // self.n_head)
        valid = jnp.arange(cache.k.shape[1])[None, None, :] <= pos
        att = jnp.where(valid, att, -jnp.inf)
        att = nn.softmax(att.astype(jnp.float32), axis=-1).astype(self.dtype)
        y = jnp.einsum("bhs,bshd->bhd", att, v).reshape(B, 1, C)
        return self.proj(y), LayerCache(k, v)

    def prefill(self, x, cache: LayerCache) -> Tuple[jnp.ndarray, LayerCache]:
        """Batch-prefill positions [0, T) with the TRAINING mask (causal +
        minGPT's unmasked [:n,:n] conditioning prefix).  Sequential
        decode_step cannot reproduce the unmasked prefix — a prefix query
        attends to FUTURE prefix keys that are not cached yet — so cached
        sampling must prefill the conditioning in one pass."""
        B, T, C = x.shape
        q, k, v = self._split(self.query(x)), self._split(self.key(x)), self._split(self.value(x))
        att = jnp.einsum("blhd,bshd->bhls", q, k) / math.sqrt(C // self.n_head)
        mask = jnp.tril(jnp.ones((T, T), bool))
        if self.n_unmasked > 0:
            n = self.n_unmasked
            mask = mask.at[:n, :n].set(True)
        att = jnp.where(mask[None, None], att, -jnp.inf)
        att = nn.softmax(att.astype(jnp.float32), axis=-1).astype(self.dtype)
        y = jnp.einsum("bhls,bshd->blhd", att, v).reshape(B, T, C)
        k_all = jax.lax.dynamic_update_slice(cache.k, k, (0, 0, 0, 0))
        v_all = jax.lax.dynamic_update_slice(cache.v, v, (0, 0, 0, 0))
        return self.proj(y), LayerCache(k_all, v_all)


class GPTBlock(nn.Module):
    n_embd: int
    n_head: int
    n_unmasked: int = 0
    resid_pdrop: float = 0.0
    attn_pdrop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.ln1 = nn.LayerNorm(dtype=self.dtype, name="ln1")
        self.ln2 = nn.LayerNorm(dtype=self.dtype, name="ln2")
        self.attn = CausalSelfAttention(self.n_embd, self.n_head, self.n_unmasked,
                                        self.attn_pdrop, self.resid_pdrop,
                                        self.dtype, name="attn")
        self.fc1 = nn.Dense(4 * self.n_embd, dtype=self.dtype, name="mlp_fc1")
        self.fc2 = nn.Dense(self.n_embd, dtype=self.dtype, name="mlp_fc2")

    def _mlp(self, x):
        return self.fc2(nn.gelu(self.fc1(x), approximate=False))

    def __call__(self, x, *, deterministic: bool = True):
        x = x + self.attn(self.ln1(x), deterministic=deterministic)
        return x + self._mlp(self.ln2(x))

    def decode_step(self, x, cache: LayerCache, pos):
        a, cache = self.attn.decode_step(self.ln1(x), cache, pos)
        x = x + a
        return x + self._mlp(self.ln2(x)), cache

    def prefill(self, x, cache: LayerCache):
        a, cache = self.attn.prefill(self.ln1(x), cache)
        x = x + a
        return x + self._mlp(self.ln2(x)), cache


@register(
    "text_to_sound_synthesis_tpu.models.gpt.GPT",
    "specvqgan.modules.transformer.mingpt.GPT",
)
class GPT(nn.Module):
    vocab_size: int = 256
    block_size: int = 266
    n_layer: int = 19
    n_head: int = 16
    n_embd: int = 1024
    embd_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    attn_pdrop: float = 0.0
    n_unmasked: int = 0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.tok_emb = nn.Embed(self.vocab_size, self.n_embd, dtype=self.dtype, name="tok_emb")
        self.pos_emb = self.param("pos_emb", nn.initializers.zeros,
                                  (1, self.block_size, self.n_embd))
        self.blocks = [
            GPTBlock(self.n_embd, self.n_head, self.n_unmasked, self.resid_pdrop,
                     self.attn_pdrop, self.dtype, name=f"block_{i}")
            for i in range(self.n_layer)
        ]
        self.ln_f = nn.LayerNorm(dtype=self.dtype, name="ln_f")
        self.head = nn.Dense(self.vocab_size, use_bias=False, dtype=self.dtype, name="head")

    def __call__(self, idx: jnp.ndarray, embeddings: Optional[jnp.ndarray] = None,
                 *, deterministic: bool = True) -> jnp.ndarray:
        """Full forward: (B, T) token ids (+ optional prepended cond embeddings
        (B, Tc, D)) -> logits (B, Tc+T, vocab)."""
        x = self.tok_emb(idx)
        if embeddings is not None:
            x = jnp.concatenate([embeddings.astype(x.dtype), x], axis=1)
        T = x.shape[1]
        x = x + self.pos_emb[:, :T].astype(x.dtype)
        for blk in self.blocks:
            x = blk(x, deterministic=deterministic)
        return self.head(self.ln_f(x))

    # -- cached decoding -----------------------------------------------------

    def init_cache(self, batch: int, max_len: Optional[int] = None):
        max_len = max_len or self.block_size
        hd = self.n_embd // self.n_head
        zero = jnp.zeros((batch, max_len, self.n_head, hd), self.dtype)
        return [LayerCache(zero, zero) for _ in range(self.n_layer)]

    def decode_embedded(self, x_emb: jnp.ndarray, cache, pos):
        """One step from an input embedding (B, 1, D) at position ``pos``."""
        x = x_emb.astype(self.dtype) + jax.lax.dynamic_slice_in_dim(
            self.pos_emb, pos, 1, axis=1
        ).astype(x_emb.dtype)
        new_cache = []
        for blk, c in zip(self.blocks, cache):
            x, c = blk.decode_step(x, c, pos)
            new_cache.append(c)
        return self.head(self.ln_f(x))[:, 0], new_cache

    def decode_token(self, token: jnp.ndarray, cache, pos):
        """One step from token ids (B,) at position ``pos``."""
        return self.decode_embedded(self.tok_emb(token)[:, None], cache, pos)

    def decode_prefix(self, x_emb: jnp.ndarray, cache):
        """Batch-prefill the conditioning prefix (B, Tc, D) in ONE pass with
        the training mask: required for n_unmasked > 0 (sequential
        decode_step cannot see future prefix keys), and one dispatch instead
        of Tc for everyone else.  Returns (logits at position Tc-1, cache)."""
        T = x_emb.shape[1]
        x = x_emb.astype(self.dtype) + self.pos_emb[:, :T].astype(self.dtype)
        new_cache = []
        for blk, c in zip(self.blocks, cache):
            x, c = blk.prefill(x, c)
            new_cache.append(c)
        return self.head(self.ln_f(x))[:, -1], new_cache

    def embed_tokens(self, idx):
        return self.tok_emb(idx)


class RNNEmbedder(nn.Module):
    """Recurrent feature embedder (reference: ``torch.nn.LSTM``/``GRU``
    instantiated from ``feat_embedding_config``, mingpt.py:266-282).

    Consumes (B, T, D) and returns the full hidden sequence (B, T, H) —
    matching ``feats, _ = self.embedder(feats)`` with ``batch_first=True``.
    Stacked layers mirror torch's ``num_layers``; runs as a ``lax.scan`` over
    the (short) conditioning sequence.
    """

    hidden_size: int
    num_layers: int = 1
    kind: str = "lstm"  # "lstm" | "gru"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cell_cls = nn.OptimizedLSTMCell if self.kind == "lstm" else nn.GRUCell
        for i in range(self.num_layers):
            # the cell binds to THIS module's scope (params: cell_{i}/...)
            cell = cell_cls(self.hidden_size, dtype=self.dtype, name=f"cell_{i}")
            x = nn.RNN(cell)(x)
        return x


def _build_feat_embedder(module: nn.Module, cfg: Optional[Mapping[str, Any]],
                         n_embd: int, name: str = "embedder"):
    """Shared feature-embedder factory for GPTFeats/GPTFeatsClass
    (mirrors the reference's ``instantiate_from_config(feat_embedding_config)``
    accepting torch.nn.{Conv1d,Linear,Identity,LSTM,GRU} targets)."""
    ecfg = dict(cfg or {})
    target = str(ecfg.get("target", "torch.nn.Conv1d"))
    p = dict(ecfg.get("params") or {})
    if target.endswith(("LSTM", "GRU")):
        return RNNEmbedder(
            hidden_size=p.get("hidden_size", n_embd),
            num_layers=p.get("num_layers", 1),
            kind="lstm" if target.endswith("LSTM") else "gru",
            dtype=module.dtype, name=name,
        )
    if target.endswith("Conv1d"):
        return nn.Conv(
            p.get("out_channels", n_embd), (p.get("kernel_size", 1),),
            padding=p.get("padding", 0), dtype=module.dtype, name=name,
        )
    if target.endswith("Identity"):
        # a true pass-through (features already n_embd-dim): a learned Dense
        # here would break parity and have no torch weights to convert
        return _IdentityEmbedder(name=name)
    if target.endswith("Linear"):
        return nn.Dense(p.get("out_features", n_embd), dtype=module.dtype,
                        name=name)
    raise NotImplementedError(f"embedder {target!r}")


class _IdentityEmbedder(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x


@register(
    "text_to_sound_synthesis_tpu.models.gpt.GPTFeats",
    "specvqgan.modules.transformer.mingpt.GPTFeats",
)
class GPTFeats(nn.Module):
    """GPT conditioned on prepended raw features (CLIP text vectors).

    ``feat_embedding_config`` mirrors the reference YAML: a Conv1d
    (in_channels -> n_embd, kernel 1), Linear, LSTM, or GRU embedder applied to
    (B, D, T) features (mingpt.py:263-293).
    """

    feat_embedding_config: Optional[Mapping[str, Any]] = None
    GPT_config: Optional[Mapping[str, Any]] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        gcfg = dict(self.GPT_config or {})
        self.gpt = GPT(dtype=self.dtype, name="gpt",
                       **{k: v for k, v in gcfg.items() if k in GPT.__dataclass_fields__})
        self.embedder = _build_feat_embedder(self, self.feat_embedding_config,
                                             self.gpt.n_embd)

    def embed_feats(self, feats: jnp.ndarray) -> jnp.ndarray:
        """(B, D, T) channel-major features -> (B, T, n_embd)."""
        return self.embedder(jnp.swapaxes(feats, 1, 2))

    def __call__(self, idx: jnp.ndarray, feats: jnp.ndarray,
                 *, deterministic: bool = True) -> jnp.ndarray:
        return self.gpt(idx, embeddings=self.embed_feats(feats),
                        deterministic=deterministic)

    # decoding helpers (delegate to the inner GPT)
    def init_cache(self, batch: int, max_len: Optional[int] = None):
        return self.gpt.init_cache(batch, max_len)

    def decode_embedded(self, x_emb, cache, pos):
        return self.gpt.decode_embedded(x_emb, cache, pos)

    def decode_prefix(self, x_emb, cache):
        return self.gpt.decode_prefix(x_emb, cache)

    def decode_token(self, token, cache, pos):
        return self.gpt.decode_token(token, cache, pos)


@register(
    "text_to_sound_synthesis_tpu.models.gpt.GPTClass",
    "specvqgan.modules.transformer.mingpt.GPTClass",
)
class GPTClass(nn.Module):
    """GPT conditioned on a prepended class-token embedding
    (mingpt.py:295-305; cond stage ``ClassOnlyStage``)."""

    token_embedding_config: Optional[Mapping[str, Any]] = None
    GPT_config: Optional[Mapping[str, Any]] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        gcfg = dict(self.GPT_config or {})
        self.gpt = GPT(dtype=self.dtype, name="gpt",
                       **{k: v for k, v in gcfg.items() if k in GPT.__dataclass_fields__})
        p = dict((self.token_embedding_config or {}).get("params") or {})
        self.embedder = nn.Embed(p.get("num_embeddings", p.get("n_classes", 1000)),
                                 p.get("features", p.get("embedding_dim", self.gpt.n_embd)),
                                 dtype=self.dtype, name="embedder")

    def embed_feats(self, cls_idx: jnp.ndarray) -> jnp.ndarray:
        """(B,) or (B, 1) class ids -> (B, 1, n_embd)."""
        cls_idx = cls_idx.astype(jnp.int32)  # same contract as GPTFeatsClass
        if cls_idx.ndim == 1:
            cls_idx = cls_idx[:, None]
        return self.embedder(cls_idx)

    def __call__(self, idx, cls_idx, *, deterministic: bool = True):
        return self.gpt(idx, embeddings=self.embed_feats(cls_idx),
                        deterministic=deterministic)

    def init_cache(self, batch, max_len=None):
        return self.gpt.init_cache(batch, max_len)

    def decode_embedded(self, x_emb, cache, pos):
        return self.gpt.decode_embedded(x_emb, cache, pos)

    def decode_prefix(self, x_emb, cache):
        return self.gpt.decode_prefix(x_emb, cache)

    def decode_token(self, token, cache, pos):
        return self.gpt.decode_token(token, cache, pos)


@register(
    "text_to_sound_synthesis_tpu.models.gpt.GPTFeatsClass",
    "specvqgan.modules.transformer.mingpt.GPTFeatsClass",
)
class GPTFeatsClass(nn.Module):
    """GPT conditioned on prepended features AND a class token
    (mingpt.py:306-349; cond stage ``FeatsClassStage``,
    ``modules/misc/feats_class.py:3``): the conditioning prefix is
    ``concat([embed(feats), embed(class)], seq_axis)``.
    """

    feat_embedding_config: Optional[Mapping[str, Any]] = None
    token_embedding_config: Optional[Mapping[str, Any]] = None
    GPT_config: Optional[Mapping[str, Any]] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        gcfg = dict(self.GPT_config or {})
        self.gpt = GPT(dtype=self.dtype, name="gpt",
                       **{k: v for k, v in gcfg.items() if k in GPT.__dataclass_fields__})
        self.feat_embedder = _build_feat_embedder(
            self, self.feat_embedding_config, self.gpt.n_embd, name="feat_embedder")
        p = dict((self.token_embedding_config or {}).get("params") or {})
        self.cls_embedder = nn.Embed(
            p.get("num_embeddings", p.get("n_classes", 1000)),
            p.get("features", p.get("embedding_dim", self.gpt.n_embd)),
            dtype=self.dtype, name="cls_embedder")

    def embed_feats(self, feats_token) -> jnp.ndarray:
        """``feats_token``: mapping {'feature': (B, D, T), 'target': (B,) or
        (B, 1) class ids} (FeatsClassStage.get_input layout) or an equivalent
        (feats, cls) tuple -> (B, T + 1, n_embd)."""
        if isinstance(feats_token, (tuple, list)):
            feats, cls_idx = feats_token
        else:
            feats, cls_idx = feats_token["feature"], feats_token["target"]
        feat_emb = self.feat_embedder(jnp.swapaxes(feats, 1, 2))
        if cls_idx.ndim == 1:
            cls_idx = cls_idx[:, None]
        cls_emb = self.cls_embedder(cls_idx.astype(jnp.int32))
        return jnp.concatenate([feat_emb, cls_emb.astype(feat_emb.dtype)], axis=1)

    def __call__(self, idx, feats_token, *, deterministic: bool = True):
        return self.gpt(idx, embeddings=self.embed_feats(feats_token),
                        deterministic=deterministic)

    def init_cache(self, batch, max_len=None):
        return self.gpt.init_cache(batch, max_len)

    def decode_embedded(self, x_emb, cache, pos):
        return self.gpt.decode_embedded(x_emb, cache, pos)

    def decode_prefix(self, x_emb, cache):
        return self.gpt.decode_prefix(x_emb, cache)

    def decode_token(self, token, cache, pos):
        return self.gpt.decode_token(token, cache, pos)


def ar_sample(
    model,
    params,
    key: jax.Array,
    cond_feats,                # (B, D, Tc) raw features; GPTClass: (B,)/(B,1)
                               # ids; GPTFeatsClass: {'feature','target'} dict
    *,
    steps: int,
    top_k: int = 100,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """KV-cached autoregressive sampling as one ``lax.scan``; returns (B, steps).

    Replaces ``Net2NetTransformer.sample`` + the per-token full forwards of
    ``generate_samples_caps.py:162-229``.
    """
    from ...ops.sampling import top_k_multinomial

    cond_emb = model.apply(params, cond_feats, method=model.embed_feats)  # (B, Tc, D)
    B, Tc = cond_emb.shape[:2]
    cache = model.apply(params, B, method=model.init_cache)

    # prefill the conditioning prefix in one batched pass (training-mask
    # semantics incl. the unmasked [:n,:n] prefix; decode_prefix docstring)
    logits, cache = model.apply(params, cond_emb, cache,
                                method=model.decode_prefix)

    key, k0 = jax.random.split(key)
    first = top_k_multinomial(k0, logits, top_k, temperature)

    def step(carry, t):
        token, cache, key = carry
        key, ks = jax.random.split(key)
        logits, cache = model.apply(params, token, cache, Tc + t,
                                    method=model.decode_token)
        nxt = top_k_multinomial(ks, logits, top_k, temperature)
        return (nxt, cache, key), token

    (last, _, _), emitted = jax.lax.scan(step, (first, cache, key), jnp.arange(steps - 1))
    # each scan step emits the token it consumed; the carry holds the final one
    return jnp.concatenate([emitted.T, last[:, None]], axis=1)
