"""Int8 (W8A8) serving runtime for the Diffsound denoiser.

A quantized-inference engine for the flagship ``Text2SpecTransformer``
(backbone.py; parity target ``transformer_utils.py:276-443``): all six dense
matmuls per block run as fused int8 Pallas kernels (ops/quant.py) at the v5e
int8 MXU rate, with the LayerNorm/AdaLN prologue and dequant/GELU2/residual
epilogue resident in VMEM. Attention stays bf16 (≈4% of FLOPs). The bf16/f32
paths and all training are untouched — this is an opt-in serving mode, the
TPU analogue of TensorRT/ONNX int8 deployment of the reference model.

Numerics: symmetric per-output-channel weights, symmetric per-token dynamic
activations. Accuracy is validated against the bf16 path in
tests/test_int8_runtime.py (logit error + sampled-token agreement) — with no
released checkpoints in this environment, random-weight agreement plus the
exact kernel-vs-oracle tests in tests/test_quant.py are the gate.

Layout: tokens are padded from L to ``L_pad`` so every row-block is int8
tile-aligned; pad keys are masked out of attention and pad rows dropped at the
head. The 19 layers run as one ``lax.scan`` over a stacked layer pytree —
one compiled block instead of 19 unrolled, and XLA double-buffers the weight
fetches HBM->VMEM across layers.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ...ops import diffusion as dd
from ...ops import fused_sampler as fs
from ...ops.quant import (
    QuantizedWeight,
    fused_quant_dense,
    quant_dense_reference,
    quantize_weight,
)

__all__ = [
    "Int8Denoiser",
    "quantize_denoiser",
    "int8_backbone_logits",
    "sample_tokens_int8",
]


class Int8Layer(NamedTuple):
    """One SelfCrossBlock, weights stacked over layers in ``Int8Denoiser``."""

    qkv: QuantizedWeight        # (D, 3D) — query|key|value packed
    proj: QuantizedWeight       # (D, D)
    crossq: QuantizedWeight     # (D, D)
    crossproj: QuantizedWeight  # (D, D)
    fc1: QuantizedWeight        # (D, 4D)
    fc2: QuantizedWeight        # (4D, D)
    ln2_mod: jnp.ndarray        # (2, D) f32 — LayerNorm gamma; beta
    ada1: jnp.ndarray           # (T, 2D) f32 — ln1 modulation table
    ada2: jnp.ndarray           # (T, 2D) f32 — ln1_1 modulation table
    ck_w: jnp.ndarray           # (Dc, D) bf16 — cross key weight
    ck_b: jnp.ndarray           # (D,) f32
    cv_w: jnp.ndarray           # (Dc, D) bf16 — cross value weight
    cv_b: jnp.ndarray           # (D,) f32


class Int8Denoiser(struct.PyTreeNode):
    layers: Int8Layer           # every leaf stacked: leading axis = n_layer
    tok_emb: jnp.ndarray        # (num_classes, D) bf16
    pos_emb: jnp.ndarray        # (L, D) bf16
    norm_out: jnp.ndarray       # (2, D) f32 — gamma; beta
    head_w: jnp.ndarray         # (D, num_classes - 1) bf16
    head_b: jnp.ndarray         # (num_classes - 1,) f32
    # static metadata (not traced): safe to pass the engine through jit
    n_head: int = struct.field(pytree_node=False)
    seq_len: int = struct.field(pytree_node=False)
    num_timesteps: int = struct.field(pytree_node=False)


def _ada_table(ln: dict, num_steps: int) -> jnp.ndarray:
    """Learned-table AdaLN modulation for every t: linear(silu(emb)) (T, 2D).

    Mirrors ``AdaLayerNorm.table`` (backbone.py:84-87) straight from arrays.
    """
    emb = ln["emb"]["embedding"].astype(jnp.float32)        # (T, D)
    h = jax.nn.silu(emb)
    return h @ ln["linear"]["kernel"].astype(jnp.float32) + ln["linear"]["bias"]


def _qw(dense: dict) -> QuantizedWeight:
    return quantize_weight(dense["kernel"], dense.get("bias"))


def quantize_denoiser(params: Any, *, n_head: int, seq_len: int,
                      num_timesteps: int) -> Int8Denoiser:
    """Flax param tree (DiscreteDiffusion or its backbone) -> int8 engine.

    Accepts either the full ``{'params': {'backbone': ...}}`` tree of
    ``DiscreteDiffusion`` or the backbone subtree directly.
    """
    p = params.get("params", params)
    p = p.get("backbone", p)

    n_layer = len([k for k in p if k.startswith("block_")])
    per_layer = []
    for i in range(n_layer):
        b = p[f"block_{i}"]
        wq = b["attn1"]["query"]["kernel"]
        wk = b["attn1"]["key"]["kernel"]
        wv = b["attn1"]["value"]["kernel"]
        bq = b["attn1"]["query"]["bias"]
        bk = b["attn1"]["key"]["bias"]
        bv = b["attn1"]["value"]["bias"]
        qkv = quantize_weight(jnp.concatenate([wq, wk, wv], axis=1),
                              jnp.concatenate([bq, bk, bv]))
        ln2 = jnp.stack([b["ln2"]["scale"], b["ln2"]["bias"]]).astype(jnp.float32)
        per_layer.append(Int8Layer(
            qkv=qkv,
            proj=_qw(b["attn1"]["proj"]),
            crossq=_qw(b["attn2"]["query"]),
            crossproj=_qw(b["attn2"]["proj"]),
            fc1=_qw(b["mlp_fc1"]),
            fc2=_qw(b["mlp_fc2"]),
            ln2_mod=ln2,
            ada1=_ada_table(b["ln1"], num_timesteps),
            ada2=_ada_table(b["ln1_1"], num_timesteps),
            ck_w=b["attn2"]["key"]["kernel"].astype(jnp.bfloat16),
            ck_b=b["attn2"]["key"]["bias"].astype(jnp.float32),
            cv_w=b["attn2"]["value"]["kernel"].astype(jnp.bfloat16),
            cv_b=b["attn2"]["value"]["bias"].astype(jnp.float32),
        ))
    layers = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_layer)

    emb = p["content_emb"]
    tok = emb["emb"]["embedding"]
    h_emb = emb["height_emb"]["embedding"] if "height_emb" in emb else emb["height_emb"]
    w_emb = emb["width_emb"]["embedding"] if "width_emb" in emb else emb["width_emb"]
    pos = (h_emb[:, None, :] + w_emb[None, :, :]).reshape(-1, tok.shape[-1])
    return Int8Denoiser(
        layers=layers,
        tok_emb=tok.astype(jnp.bfloat16),
        pos_emb=pos[:seq_len].astype(jnp.bfloat16),
        norm_out=jnp.stack([p["norm_out"]["scale"], p["norm_out"]["bias"]]).astype(jnp.float32),
        head_w=p["head"]["kernel"].astype(jnp.bfloat16),
        head_b=p["head"]["bias"].astype(jnp.float32),
        n_head=n_head,
        seq_len=seq_len,
        num_timesteps=num_timesteps,
    )


def _pad_plan(batch: int, seq_len: int) -> Tuple[int, int]:
    """(L_pad, block_m): smallest padded length whose B*L_pad admits an
    int8-tile-aligned row block (multiple of 32, ideally 128)."""
    start = -(-seq_len // 8) * 8
    for l_pad in range(start, start + 64, 8):
        for bm in (128, 96, 64, 32):
            if (batch * l_pad) % bm == 0:
                return l_pad, bm
    return -(-seq_len // 32) * 32, 32


def precompute_cond_kvs(qp: Int8Denoiser, cond_emb: jnp.ndarray):
    """(B, S, Dc) condition -> stacked per-layer cross K/V (n_layer, B, S, H, hd)."""
    cond = cond_emb.astype(jnp.bfloat16)
    H = qp.n_head

    def one(ck_w, ck_b, cv_w, cv_b):
        k = cond @ ck_w + ck_b.astype(jnp.bfloat16)
        v = cond @ cv_w + cv_b.astype(jnp.bfloat16)
        B, S, D = k.shape
        return (k.reshape(B, S, H, D // H), v.reshape(B, S, H, D // H))

    return jax.vmap(one)(qp.layers.ck_w, qp.layers.ck_b,
                         qp.layers.cv_w, qp.layers.cv_b)


def _attend(q, k, v, bias=None):
    """bf16 multi-head attention; softmax in f32. q (B,L,H,hd), k/v (B,S,H,hd)."""
    hd = q.shape[-1]
    att = jnp.einsum("blhd,bshd->bhls", q, k) / math.sqrt(hd)
    att = att.astype(jnp.float32)
    if bias is not None:
        att = att + bias
    att = jax.nn.softmax(att, axis=-1).astype(q.dtype)
    return jnp.einsum("bhls,bshd->blhd", att, v)


def int8_backbone_logits(
    qp: Int8Denoiser,
    tokens: jnp.ndarray,            # (B, L) int32
    t: jnp.ndarray,                 # scalar int32 (shared across batch)
    cond_kvs,                       # from precompute_cond_kvs
    *,
    use_kernel: bool = True,
) -> jnp.ndarray:
    """Raw denoiser logits (B, L, num_classes - 1), int8 fused path."""
    B, L = tokens.shape
    D = qp.tok_emb.shape[-1]
    H = qp.n_head
    L_pad, block_m = _pad_plan(B, L)
    M = B * L_pad

    dense = fused_quant_dense if use_kernel else quant_dense_reference
    dkw = dict(block_m=block_m) if use_kernel else {}

    toks_p = jnp.pad(tokens, ((0, 0), (0, L_pad - L)))
    pos = jnp.pad(qp.pos_emb, ((0, L_pad - L), (0, 0)))
    x = (qp.tok_emb[jnp.maximum(toks_p, 0)] + pos[None]).reshape(M, D)

    # pad keys never attend: additive -inf bias on padded self-attn columns
    key_mask = (jnp.arange(L_pad) >= L).astype(jnp.float32) * -1e9
    self_bias = key_mask[None, None, None, :]

    def layer_step(x, inputs):
        lyr, (ck, cv) = inputs
        mod1 = lyr.ada1[t].reshape(2, D)
        mod2 = lyr.ada2[t].reshape(2, D)

        qkv = dense(x, lyr.qkv, norm="adaln", mod=mod1, **dkw)
        qkv = qkv.reshape(B, L_pad, 3, H, D // H)
        y = _attend(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], bias=self_bias)
        x = dense(y.reshape(M, D), lyr.proj, residual=x, **dkw)

        q2 = dense(x, lyr.crossq, norm="adaln", mod=mod2, **dkw)
        y = _attend(q2.reshape(B, L_pad, H, D // H), ck, cv)
        x = dense(y.reshape(M, D), lyr.crossproj, residual=x, **dkw)

        h = dense(x, lyr.fc1, norm="ln", mod=lyr.ln2_mod, act="gelu2", **dkw)
        x = dense(h, lyr.fc2, residual=x, **dkw)
        return x, ()

    x, _ = jax.lax.scan(layer_step, x, (qp.layers, cond_kvs))

    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
    xn = xn * qp.norm_out[0] + qp.norm_out[1]
    logits = xn.astype(jnp.bfloat16) @ qp.head_w + qp.head_b.astype(jnp.bfloat16)
    return logits.reshape(B, L_pad, -1)[:, :L]


def sample_tokens_int8(
    qp: Int8Denoiser,
    sched: dd.DiffusionSchedule,
    key: jax.Array,
    cond_emb: jnp.ndarray,
    *,
    truncation_r: float = 0.0,
    skip_step: int = 0,
    use_kernel: Optional[bool] = None,
) -> jnp.ndarray:
    """Int8 twin of ``process.sample_tokens_fused``: one scan over timesteps,
    int8 fused transformer + Pallas sampler step."""
    from .process import _timestep_plan  # shared static plan

    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    K = qp.tok_emb.shape[0]  # num classes incl. MASK
    T = qp.num_timesteps
    L = qp.seq_len
    B = cond_emb.shape[0]

    tokens = jnp.full((B, L), K - 1, jnp.int32)  # all-MASK start
    ts, t_post = _timestep_plan(T, T, skip_step)
    seed_base = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max, jnp.int32)
    kvs = precompute_cond_kvs(qp, cond_emb)

    def step(carry, inputs):
        tokens, key = carry
        (t_scalar, t_post_scalar), idx = inputs
        logits = int8_backbone_logits(qp, tokens, t_scalar, kvs,
                                      use_kernel=use_kernel)
        coeffs = fs.step_coeffs(sched, t_post_scalar)
        if use_kernel:
            tokens = fs.fused_p_sample(logits, tokens, coeffs, seed_base + idx,
                                       truncation_r=truncation_r)
        else:
            key, k = jax.random.split(key)
            tokens = fs.p_sample_from_indices(logits, tokens, coeffs, k,
                                              truncation_r=truncation_r)
        return (tokens, key), ()

    idxs = jnp.arange(ts.shape[0], dtype=jnp.int32)
    (tokens, _), _ = jax.lax.scan(step, (tokens, key), ((ts, t_post), idxs))
    return tokens
