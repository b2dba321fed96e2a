"""Block-level int8 Pallas kernels: one kernel per transformer sub-block.

The per-dense kernels (ops/quant.py) still round-trip every intermediate
activation through HBM — 8 kernel boundaries per layer ≈ 2 GB/step at
flagship scale — and the attention softmax runs un-overlapped. These three
kernels fuse each sub-block of the denoiser's SelfCrossBlock
(models/diffusion/backbone.py; reference ``transformer_utils.py:168-272``)
end to end in VMEM:

  self_attn_block:  AdaLN -> quant -> q/k/v int8 dots -> MHA (f32 softmax,
                    all-head scores batched for full-lane VPU) -> quant ->
                    proj int8 dot -> +residual
  cross_attn_block: AdaLN -> quant -> q int8 dot -> MHA vs precomputed
                    cond K/V -> quant -> proj int8 dot -> +residual
  mlp_block:        LN -> quant -> fc1 int8 dot -> GELU2 -> quant ->
                    fc2 int8 dot -> +residual

Per layer: 3 kernel boundaries (x in / x out), weights VMEM-resident across
the row-block grid. Quantization is exact per-token dynamic (row abs-max) —
identical math to ops/quant.py, oracle-tested against the jnp twins here.

Grid notes: attention kernels run one program per batch element (a program
needs all of its sequence); the MLP kernel is row-wise and uses finer blocks.
Sequence padding: pad KEYS are masked with -inf; pad query rows compute
garbage that callers drop.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import QuantizedWeight, _gelu2, _prologue, _quantize_rows

__all__ = [
    "self_attn_block",
    "cross_attn_block",
    "attn_pair_block",
    "mlp_block",
    "self_attn_block_reference",
    "cross_attn_block_reference",
    "attn_pair_block_reference",
    "mlp_block_reference",
]


def _deq(acc, s_row, scale_ref, bias_ref):
    return acc.astype(jnp.float32) * (s_row * scale_ref[0:1, :]) + bias_ref[0:1, :]


def _int8_dot(q, w_ref):
    return jnp.dot(q, w_ref[:, :], preferred_element_type=jnp.int32)


import os as _os

_HEAD_GROUP = int(_os.environ.get("T2S_HEAD_GROUP", "8"))


def _par_params():
    """Grid iterations in every kernel here are independent (row blocks /
    batch elements) — tell Mosaic so it can pipeline across grid steps."""
    if _os.environ.get("T2S_PAR_SEMANTICS", "1") == "0":
        return None
    return pltpu.CompilerParams(dimension_semantics=("parallel",))


def _mha_inline(q, k, v, n_head: int, kv_valid: int, head_group: int = _HEAD_GROUP):
    """(Lq, D) x (Lkv, D) f32/bf16 -> (Lq, D) f32. Head scores are stacked
    along rows in groups of ``head_group`` so the softmax runs on full
    128-lane rows while the f32 score buffer stays within VMEM."""
    Lq, D = q.shape
    Lkv = k.shape[0]
    hd = D // n_head
    scale = 1.0 / math.sqrt(hd)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, Lkv), 1)
    gsz = min(head_group, n_head)

    outs = [None] * n_head
    for g in range(0, n_head, gsz):
        hs = range(g, min(g + gsz, n_head))
        scores = []
        for h in hs:
            sl = slice(h * hd, (h + 1) * hd)
            s = jax.lax.dot_general(q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            scores.append(s)
        s_all = jnp.concatenate(scores, axis=0)          # (gsz*Lq, Lkv)
        s_all = jnp.where(col >= kv_valid, -jnp.inf, s_all)
        m = jnp.max(s_all, axis=-1, keepdims=True)
        p = jnp.exp(s_all - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
        for j, h in enumerate(hs):
            sl = slice(h * hd, (h + 1) * hd)
            ph = p[j * Lq:(j + 1) * Lq, :]
            outs[h] = jnp.dot(ph, v[:, sl], preferred_element_type=jnp.float32)
    return jnp.concatenate(outs, axis=1)                 # (Lq, D) f32


# ---------------------------------------------------------------------------
# self-attention block
# ---------------------------------------------------------------------------

def _self_attn_kernel(x_ref, mod_ref,
                      wq_ref, wk_ref, wv_ref, wp_ref,
                      sq_ref, sk_ref, sv_ref, sp_ref,
                      bq_ref, bk_ref, bv_ref, bp_ref,
                      out_ref, *, n_head: int, q_valid: int):
    x = x_ref[:, :].astype(jnp.float32)
    h = _prologue(x, mod_ref[0:1, :].astype(jnp.float32),
                  mod_ref[1:2, :].astype(jnp.float32), "adaln")
    qx, s = _quantize_rows(h)
    q = _deq(_int8_dot(qx, wq_ref), s, sq_ref, bq_ref).astype(jnp.bfloat16)
    k = _deq(_int8_dot(qx, wk_ref), s, sk_ref, bk_ref).astype(jnp.bfloat16)
    v = _deq(_int8_dot(qx, wv_ref), s, sv_ref, bv_ref).astype(jnp.bfloat16)
    y = _mha_inline(q, k, v, n_head, q_valid).astype(jnp.bfloat16)
    qy, sy = _quantize_rows(y.astype(jnp.float32))
    o = _deq(_int8_dot(qy, wp_ref), sy, sp_ref, bp_ref) + x
    out_ref[:, :] = o.astype(out_ref.dtype)


def self_attn_block(x, mod, wq, wk, wv, wproj, *, batch: int, n_head: int,
                    q_valid: int, interpret: bool = False):
    """x (B*Lp, D) bf16 -> x + proj(MHA(adaln(x))) in one kernel."""
    M, D = x.shape
    Lp = M // batch
    vec = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((D, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((Lp, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_self_attn_kernel, n_head=n_head, q_valid=q_valid),
        out_shape=jax.ShapeDtypeStruct((M, D), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(batch,),
            in_specs=[row,
                      pl.BlockSpec((2, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                      mat, mat, mat, mat,
                      vec, vec, vec, vec,
                      vec, vec, vec, vec],
            out_specs=row,
        ),
        compiler_params=_par_params(),
        interpret=interpret,
    )(x, mod, wq.w_q, wk.w_q, wv.w_q, wproj.w_q,
      wq.scale, wk.scale, wv.scale, wproj.scale,
      wq.bias, wk.bias, wv.bias, wproj.bias)


# ---------------------------------------------------------------------------
# cross-attention block
# ---------------------------------------------------------------------------

def _cross_attn_kernel(x_ref, mod_ref, ck_ref, cv_ref,
                       wq_ref, wp_ref, sq_ref, sp_ref, bq_ref, bp_ref,
                       out_ref, *, n_head: int, kv_valid: int):
    x = x_ref[:, :].astype(jnp.float32)
    h = _prologue(x, mod_ref[0:1, :].astype(jnp.float32),
                  mod_ref[1:2, :].astype(jnp.float32), "adaln")
    qx, s = _quantize_rows(h)
    q = _deq(_int8_dot(qx, wq_ref), s, sq_ref, bq_ref).astype(jnp.bfloat16)
    y = _mha_inline(q, ck_ref[:, :], cv_ref[:, :], n_head, kv_valid)
    qy, sy = _quantize_rows(y.astype(jnp.bfloat16).astype(jnp.float32))
    o = _deq(_int8_dot(qy, wp_ref), sy, sp_ref, bp_ref) + x
    out_ref[:, :] = o.astype(out_ref.dtype)


def cross_attn_block(x, mod, ck, cv, wq, wproj, *, batch: int, n_head: int,
                     kv_valid: int, interpret: bool = False):
    """x (B*Lp, D); ck/cv (B*Skv, D) bf16 flat cond K/V."""
    M, D = x.shape
    Lp = M // batch
    Skv = ck.shape[0] // batch
    vec = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((D, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((Lp, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kvrow = pl.BlockSpec((Skv, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_cross_attn_kernel, n_head=n_head, kv_valid=kv_valid),
        out_shape=jax.ShapeDtypeStruct((M, D), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(batch,),
            in_specs=[row,
                      pl.BlockSpec((2, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                      kvrow, kvrow,
                      mat, mat, vec, vec, vec, vec],
            out_specs=row,
        ),
        compiler_params=_par_params(),
        interpret=interpret,
    )(x, mod, ck, cv, wq.w_q, wproj.w_q, wq.scale, wproj.scale, wq.bias, wproj.bias)


# ---------------------------------------------------------------------------
# merged self+cross attention block (one kernel per layer's attention half)
# ---------------------------------------------------------------------------

def _attn_pair_kernel(x_ref, mods_ref, ck_ref, cv_ref,
                      wq_ref, wk_ref, wv_ref, wp_ref, cq_ref, cp_ref,
                      sq_ref, sk_ref, sv_ref, sp_ref, scq_ref, scp_ref,
                      bq_ref, bk_ref, bv_ref, bp_ref, bcq_ref, bcp_ref,
                      out_ref, *, n_head: int, q_valid: int, kv_valid: int):
    x = x_ref[:, :].astype(jnp.float32)
    # self-attention sub-block
    h = _prologue(x, mods_ref[0:1, :].astype(jnp.float32),
                  mods_ref[1:2, :].astype(jnp.float32), "adaln")
    qx, s = _quantize_rows(h)
    q = _deq(_int8_dot(qx, wq_ref), s, sq_ref, bq_ref).astype(jnp.bfloat16)
    k = _deq(_int8_dot(qx, wk_ref), s, sk_ref, bk_ref).astype(jnp.bfloat16)
    v = _deq(_int8_dot(qx, wv_ref), s, sv_ref, bv_ref).astype(jnp.bfloat16)
    y = _mha_inline(q, k, v, n_head, q_valid).astype(jnp.bfloat16)
    qy, sy = _quantize_rows(y.astype(jnp.float32))
    x = _deq(_int8_dot(qy, wp_ref), sy, sp_ref, bp_ref) + x
    # cross-attention sub-block (x never leaves VMEM between the two)
    h2 = _prologue(x, mods_ref[2:3, :].astype(jnp.float32),
                   mods_ref[3:4, :].astype(jnp.float32), "adaln")
    q2x, s2 = _quantize_rows(h2)
    q2 = _deq(_int8_dot(q2x, cq_ref), s2, scq_ref, bcq_ref).astype(jnp.bfloat16)
    y2 = _mha_inline(q2, ck_ref[:, :], cv_ref[:, :], n_head, kv_valid)
    qy2, sy2 = _quantize_rows(y2.astype(jnp.bfloat16).astype(jnp.float32))
    x = _deq(_int8_dot(qy2, cp_ref), sy2, scp_ref, bcp_ref) + x
    out_ref[:, :] = x.astype(out_ref.dtype)


def attn_pair_block(x, mods, ck, cv, wq, wk, wv, wproj, wcrossq, wcrossproj, *,
                    batch: int, n_head: int, q_valid: int, kv_valid: int,
                    interpret: bool = False):
    """Self-attention + cross-attention sub-blocks fused into ONE kernel.

    x (B*Lp, D) bf16; mods (4, D) f32 = [self scale; self shift; cross scale;
    cross shift] AdaLN modulations; ck/cv (B*Skv, D) bf16 flat cond K/V.
    Equivalent to ``cross_attn_block(self_attn_block(x, ...), ...)`` with one
    kernel boundary and one HBM round-trip of x instead of two.
    """
    M, D = x.shape
    Lp = M // batch
    Skv = ck.shape[0] // batch
    vec = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((D, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    row = pl.BlockSpec((Lp, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kvrow = pl.BlockSpec((Skv, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_attn_pair_kernel, n_head=n_head, q_valid=q_valid,
                kv_valid=kv_valid),
        out_shape=jax.ShapeDtypeStruct((M, D), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(batch,),
            in_specs=[row,
                      pl.BlockSpec((4, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                      kvrow, kvrow,
                      mat, mat, mat, mat, mat, mat,
                      vec, vec, vec, vec, vec, vec,
                      vec, vec, vec, vec, vec, vec],
            out_specs=row,
        ),
        compiler_params=_par_params(),
        interpret=interpret,
    )(x, mods, ck, cv,
      wq.w_q, wk.w_q, wv.w_q, wproj.w_q, wcrossq.w_q, wcrossproj.w_q,
      wq.scale, wk.scale, wv.scale, wproj.scale, wcrossq.scale, wcrossproj.scale,
      wq.bias, wk.bias, wv.bias, wproj.bias, wcrossq.bias, wcrossproj.bias)


def attn_pair_block_reference(x, mods, ck, cv, wq, wk, wv, wproj, wcrossq,
                              wcrossproj, *, batch, n_head, q_valid, kv_valid):
    """jnp oracle: the two single-block references composed."""
    y = self_attn_block_reference(x, mods[0:2], wq, wk, wv, wproj, batch=batch,
                                  n_head=n_head, q_valid=q_valid)
    return cross_attn_block_reference(y, mods[2:4], ck, cv, wcrossq, wcrossproj,
                                      batch=batch, n_head=n_head,
                                      kv_valid=kv_valid)


# ---------------------------------------------------------------------------
# MLP block
# ---------------------------------------------------------------------------

def _mlp_kernel(x_ref, mod_ref, w1_ref, w2_ref, s1_ref, s2_ref, b1_ref, b2_ref,
                out_ref, *, pipeline_halves: bool = False):
    def half(x):
        h = _prologue(x, mod_ref[0:1, :].astype(jnp.float32),
                      mod_ref[1:2, :].astype(jnp.float32), "ln")
        qx, s = _quantize_rows(h)
        u = _deq(_int8_dot(qx, w1_ref), s, s1_ref, b1_ref)
        u = _gelu2(u)
        qu, su = _quantize_rows(u)
        return _deq(_int8_dot(qu, w2_ref), su, s2_ref, b2_ref) + x

    if not pipeline_halves:
        out_ref[:, :] = half(x_ref[:, :].astype(jnp.float32)).astype(out_ref.dtype)
        return
    # two independent row halves: exposes VPU(half A) || MXU(half B) to the
    # scheduler instead of one serial LN->quant->dot->gelu->quant->dot chain
    m = x_ref.shape[0] // 2
    out_ref[:m, :] = half(x_ref[:m, :].astype(jnp.float32)).astype(out_ref.dtype)
    out_ref[m:, :] = half(x_ref[m:, :].astype(jnp.float32)).astype(out_ref.dtype)


def mlp_block(x, mod, w1, w2, *, block_m: int = 128, interpret: bool = False,
              pipeline_halves: bool = False):
    """x (M, D) -> x + fc2(gelu2(fc1(ln(x)))) in one kernel. Row-wise: any
    block_m dividing M (128 keeps fc1's int32 accumulator + both weights
    comfortably in VMEM)."""
    M, D = x.shape
    Dh = w1.w_q.shape[1]
    assert M % block_m == 0, (M, block_m)
    return pl.pallas_call(
        partial(_mlp_kernel, pipeline_halves=pipeline_halves),
        out_shape=jax.ShapeDtypeStruct((M, D), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(M // block_m,),
            in_specs=[
                pl.BlockSpec((block_m, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((D, Dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Dh, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_m, D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=_par_params(),
        interpret=interpret,
    )(x, mod, w1.w_q, w2.w_q, w1.scale, w2.scale, w1.bias, w2.bias)


# ---------------------------------------------------------------------------
# jnp reference twins (test oracles / CPU fallback)
# ---------------------------------------------------------------------------

def _ref_dense(x, w: QuantizedWeight, norm="none", mod=None):
    if norm == "none":
        h = x.astype(jnp.float32)
    else:
        h = _prologue(x.astype(jnp.float32), mod[0:1].astype(jnp.float32),
                      mod[1:2].astype(jnp.float32), norm)
    q, s = _quantize_rows(h)
    acc = jnp.dot(q.astype(jnp.int32), w.w_q.astype(jnp.int32))
    return acc.astype(jnp.float32) * (s * w.scale) + w.bias


def _ref_mha(q, k, v, batch, n_head, kv_valid):
    from .attention import mha_reference

    return mha_reference(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                         v.astype(jnp.bfloat16), batch=batch, n_head=n_head,
                         kv_valid=kv_valid).astype(jnp.float32)


def self_attn_block_reference(x, mod, wq, wk, wv, wproj, *, batch, n_head, q_valid):
    xf = x.astype(jnp.float32)
    h = _prologue(xf, mod[0:1].astype(jnp.float32), mod[1:2].astype(jnp.float32),
                  "adaln")
    q_, s = _quantize_rows(h)

    def dense(w):
        acc = jnp.dot(q_.astype(jnp.int32), w.w_q.astype(jnp.int32))
        return (acc.astype(jnp.float32) * (s * w.scale) + w.bias).astype(jnp.bfloat16)

    y = _ref_mha(dense(wq), dense(wk), dense(wv), batch, n_head, q_valid)
    y = y.astype(jnp.bfloat16).astype(jnp.float32)
    qy, sy = _quantize_rows(y)
    acc = jnp.dot(qy.astype(jnp.int32), wproj.w_q.astype(jnp.int32))
    o = acc.astype(jnp.float32) * (sy * wproj.scale) + wproj.bias + xf
    return o.astype(x.dtype)


def cross_attn_block_reference(x, mod, ck, cv, wq, wproj, *, batch, n_head, kv_valid):
    xf = x.astype(jnp.float32)
    q = _ref_dense(x, wq, "adaln", mod).astype(jnp.bfloat16)
    y = _ref_mha(q, ck, cv, batch, n_head, kv_valid)
    qy, sy = _quantize_rows(y.astype(jnp.bfloat16).astype(jnp.float32))
    acc = jnp.dot(qy.astype(jnp.int32), wproj.w_q.astype(jnp.int32))
    o = acc.astype(jnp.float32) * (sy * wproj.scale) + wproj.bias + xf
    return o.astype(x.dtype)


def mlp_block_reference(x, mod, w1, w2):
    xf = x.astype(jnp.float32)
    u = _gelu2(_ref_dense(x, w1, "ln", mod))
    qu, su = _quantize_rows(u)
    acc = jnp.dot(qu.astype(jnp.int32), w2.w_q.astype(jnp.int32))
    o = acc.astype(jnp.float32) * (su * w2.scale) + w2.bias + xf
    return o.astype(x.dtype)
