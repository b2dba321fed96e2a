"""ACT: Audio Captioning Transformer — the "audiocaption loss" scorer.

Parity targets: ``Codebook/AudiocaptionLoss/models/AudioTransformer.py``
(``AudioTransformer_80:185-244``: per-bin BN, (4, 80) mel patches -> 768-d ViT
with CLS token, 12 layers / 12 heads / MLP 3072, 527-class head) and
``TransModel.py`` (``ACT:43-162``: relu(Linear(527 -> nhid)) memory, sinusoidal
positional encoding, torch-default post-norm TransformerDecoder, word_emb *
sqrt(nhid), tied greedy/beam decoding in ``tools/beam.py``).

Used at evaluation time to caption generated audio and score BLEU/CIDEr/ROUGE
(evaluation/caption_metrics.py) against the ground-truth captions, and to pick
the best samples per caption (``AudiocaptionLoss/eval.py:27-59``).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.config import register

__all__ = ["AudioPatchEncoder", "ACTCaptioner", "greedy_decode", "beam_decode"]


class ViTBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    mlp_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        inner = self.heads * self.dim_head
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        B, N, _ = h.shape
        qkv = nn.Dense(3 * inner, use_bias=False, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(B, N, 3, self.heads, self.dim_head), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
        att = jnp.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(self.dim_head)
        att = nn.softmax(att.astype(jnp.float32), axis=-1).astype(self.dtype)
        y = jnp.einsum("bhnm,bmhd->bnhd", att, v).reshape(B, N, inner)
        x = x + nn.Dense(self.dim, dtype=self.dtype, name="proj")(y)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return x + h


class AudioPatchEncoder(nn.Module):
    """mel (B, T, n_mels) -> per-token class logits (B, 1 + T/patch_t, num_classes)."""

    patch_size: Tuple[int, int] = (4, 80)
    num_classes: int = 527
    dim: int = 768
    depth: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    dim_head: int = 64
    max_patches: int = 215
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray, *, deterministic: bool = True):
        B, T, M = mel.shape
        pt, pm = self.patch_size
        assert M == pm, f"mel bins {M} != patch width {pm}"
        # bn0: per-mel-bin affine (eval-mode BN folded at conversion)
        scale = self.param("bn0_scale", nn.initializers.ones, (M,))
        shift = self.param("bn0_shift", nn.initializers.zeros, (M,))
        x = mel * scale + shift
        n = T // pt
        x = x[:, : n * pt].reshape(B, n, pt * pm)
        x = nn.Dense(self.dim, dtype=self.dtype, name="patch_proj")(x)
        cls = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, self.dim))
        pos = self.param("pos_embedding", nn.initializers.normal(1.0),
                         (1, self.max_patches + 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.dim)).astype(x.dtype), x], axis=1)
        x = x + pos[:, : n + 1].astype(x.dtype)
        for i in range(self.depth):
            x = ViTBlock(self.dim, self.heads, self.dim_head, self.mlp_dim,
                         self.dtype, name=f"block_{i}")(x, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="head_norm")(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)


class DecoderLayer(nn.Module):
    """torch TransformerDecoderLayer, post-norm, relu FF."""

    nhid: int
    nhead: int
    dim_feedforward: int
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, tgt_mask):
        B, L, D = tgt.shape
        hd = D // self.nhead

        def mha(q_in, kv_in, mask, name):
            q = nn.Dense(D, dtype=self.dtype, name=f"{name}_q")(q_in)
            k = nn.Dense(D, dtype=self.dtype, name=f"{name}_k")(kv_in)
            v = nn.Dense(D, dtype=self.dtype, name=f"{name}_v")(kv_in)
            S = kv_in.shape[1]
            att = jnp.einsum("blhd,bshd->bhls",
                             q.reshape(B, L, self.nhead, hd),
                             k.reshape(B, S, self.nhead, hd)) / math.sqrt(hd)
            if mask is not None:
                att = att + mask
            att = nn.softmax(att.astype(jnp.float32), -1).astype(self.dtype)
            y = jnp.einsum("bhls,bshd->blhd", att,
                           v.reshape(B, S, self.nhead, hd)).reshape(B, L, D)
            return nn.Dense(D, dtype=self.dtype, name=f"{name}_out")(y)

        tgt = nn.LayerNorm(dtype=self.dtype, name="norm1")(tgt + mha(tgt, tgt, tgt_mask, "self"))
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm2")(tgt + mha(tgt, memory, None, "cross"))
        act = nn.relu if self.activation == "relu" else nn.gelu
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="ff1")(tgt)
        h = nn.Dense(self.nhid, dtype=self.dtype, name="ff2")(act(h))
        return nn.LayerNorm(dtype=self.dtype, name="norm3")(tgt + h)


def _sinusoidal_pe(length: int, dim: int) -> np.ndarray:
    pos = np.arange(length)[:, None].astype(np.float64)
    div = np.exp(np.arange(0, dim, 2) * (-math.log(10000.0) / dim))
    pe = np.zeros((length, dim))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe.astype(np.float32)


@register("text_to_sound_synthesis_tpu.models.captioner.ACTCaptioner")
class ACTCaptioner(nn.Module):
    ntoken: int = 4368                 # AudioCaps vocabulary
    nhid: int = 768
    nhead: int = 4
    nlayers: int = 2
    dim_feedforward: int = 2048
    activation: str = "gelu"
    encoder_num_classes: int = 527
    encoder_depth: int = 12
    max_len: int = 30
    sos_id: int = 0
    eos_id: int = 9
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = AudioPatchEncoder(num_classes=self.encoder_num_classes,
                                         depth=self.encoder_depth, dtype=self.dtype,
                                         name="encoder")
        self.encoder_linear = nn.Dense(self.nhid, dtype=self.dtype, name="encoder_linear")
        self.word_emb = nn.Embed(self.ntoken, self.nhid, dtype=self.dtype, name="word_emb")
        self.layers = [
            DecoderLayer(self.nhid, self.nhead, self.dim_feedforward, self.activation,
                         self.dtype, name=f"dec_{i}")
            for i in range(self.nlayers)
        ]
        self.dec_fc = nn.Dense(self.ntoken, dtype=self.dtype, name="dec_fc")

    def encode(self, mel: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        feats = self.encoder(mel, deterministic=deterministic)  # (B, N, 527)
        return nn.relu(self.encoder_linear(feats))               # (B, N, nhid)

    def decode(self, memory: jnp.ndarray, tgt: jnp.ndarray,
               *, deterministic: bool = True) -> jnp.ndarray:
        """memory (B, N, nhid); tgt token ids (B, L) -> logits (B, L, ntoken)."""
        L = tgt.shape[1]
        x = self.word_emb(tgt) * math.sqrt(self.nhid)
        x = x + jnp.asarray(_sinusoidal_pe(L, self.nhid))[None].astype(x.dtype)
        mask = jnp.triu(jnp.full((L, L), -jnp.inf, jnp.float32), k=1)[None, None]
        for layer in self.layers:
            x = layer(x, memory, mask)
        return self.dec_fc(x)

    def __call__(self, mel, tgt, *, deterministic: bool = True):
        return self.decode(self.encode(mel, deterministic=deterministic), tgt,
                           deterministic=deterministic)


def greedy_decode(model: ACTCaptioner, params, mel: jnp.ndarray,
                  max_len: Optional[int] = None) -> np.ndarray:
    """Greedy caption decoding (AudiocaptionLoss greedy path). Host loop over
    <=max_len steps; each step re-decodes the prefix (eval-only workload)."""
    max_len = max_len or model.max_len
    B = mel.shape[0]
    memory = model.apply(params, mel, method=model.encode)
    tokens = np.full((B, 1), model.sos_id, np.int32)
    done = np.zeros(B, bool)
    for _ in range(max_len - 1):
        logits = model.apply(params, memory, jnp.asarray(tokens), method=model.decode)
        nxt = np.asarray(jnp.argmax(logits[:, -1], -1))
        nxt = np.where(done, model.eos_id, nxt)
        tokens = np.concatenate([tokens, nxt[:, None].astype(np.int32)], axis=1)
        done |= nxt == model.eos_id
        if done.all():
            break
    return tokens


# jitted beam-search helpers cached for the most recent model INSTANCE:
# defining them inside beam_decode would create fresh jit wrappers (empty
# compile caches) on every call — tools/eval_captions.py calls beam_decode
# once per sample file, which recompiled the full captioner per file. A
# single-slot cache covers that pattern without keeping every captioner ever
# constructed alive (long-lived processes churn model instances).
_BEAM_JIT_CACHE: list = [None]  # [(model, step_logits, encode)] or [None]


def _beam_fns(model: ACTCaptioner):
    ent = _BEAM_JIT_CACHE[0]
    if ent is not None and ent[0] is model:
        return ent[1], ent[2]

    @jax.jit
    def step_logits(params, memory, tokens, pos):
        logits = model.apply(params, memory, tokens, method=model.decode)
        return jax.nn.log_softmax(
            jax.lax.dynamic_slice_in_dim(logits, pos, 1, axis=1)[0, 0])

    encode = jax.jit(lambda params, m: model.apply(params, m, method=model.encode))
    _BEAM_JIT_CACHE[0] = (model, step_logits, encode)
    return step_logits, encode


def beam_decode(model: ACTCaptioner, params, mel: jnp.ndarray, beam_size: int = 3,
                max_len: Optional[int] = None) -> List[np.ndarray]:
    """Beam search (AudiocaptionLoss/tools/beam.py semantics: length-averaged
    log-prob scoring, EOS-terminated). Returns the best token row per sample."""
    max_len = max_len or model.max_len

    # Fixed-shape decode: pad the prefix to max_len so XLA compiles the decoder
    # ONCE instead of once per sequence length (the decoder is causal, so the
    # padding cannot influence the logit read at the prefix's last position).
    _step_logits, _encode = _beam_fns(model)

    out = []
    for b in range(mel.shape[0]):
        memory = _encode(params, mel[b : b + 1])
        beams: List[Tuple[List[int], float, bool]] = [([model.sos_id], 0.0, False)]
        for _ in range(max_len - 1):
            cand: List[Tuple[List[int], float, bool]] = []
            for seq, score, finished in beams:
                if finished:
                    cand.append((seq, score, True))
                    continue
                padded = np.zeros((1, max_len), np.int32)
                padded[0, : len(seq)] = seq
                logp = np.asarray(_step_logits(params, memory,
                                               jnp.asarray(padded), len(seq) - 1))
                top = np.argsort(-logp)[:beam_size]
                for t in top:
                    cand.append((seq + [int(t)], score + float(logp[t]),
                                 int(t) == model.eos_id))
            cand.sort(key=lambda c: c[1] / len(c[0]), reverse=True)
            beams = cand[:beam_size]
            if all(f for _, _, f in beams):
                break
        out.append(np.asarray(beams[0][0], np.int32))
    return out
